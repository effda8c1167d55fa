package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** The K3 apply sink: statement generation (pure), batch compaction
  * semantics, truncate handling, and the foreachBatch-compatible seam —
  * all against a recording SQL runner, no live server.
  */
class PgApplySinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(
      lsn: Long, op: String, table: String,
      before: Map[String, String], after: Map[String, String]): Row =
    Row(lsn, lsn, 7L, op, "public", table, T, T, Seq("id"),
      if (before == null) null else before,
      if (after == null) null else after)

  test("upsertSql / deleteSql: batching, escaping, DO NOTHING for key-only tables") {
    val up = PgApplySink.upsertSql("public", "users", Seq("id"), Seq("id", "name"),
      Seq(Seq(Some("1"), Some("o'hara")), Seq(Some("2"), None)))
    assert(up ==
      """INSERT INTO "public"."users" ("id", "name") VALUES ('1', 'o''hara'), ('2', NULL) """ +
        """ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name"""")
    val keyOnly = PgApplySink.upsertSql("public", "t", Seq("id"), Seq("id"),
      Seq(Seq(Some("1"))))
    assert(keyOnly.endsWith("""ON CONFLICT ("id") DO NOTHING"""))
    val del = PgApplySink.deleteSql("public", "users", Seq("id"),
      Seq(Seq(Some("3")), Seq(Some("4"))))
    assert(del == """DELETE FROM "public"."users" WHERE ("id") IN (('3'), ('4'))""")
  }

  test("statements: upserts before deletes, split at maxRowsPerStmt") {
    val rows = (1 to 5).map(i => Row("insert", i.toString, s"n$i")) :+
      Row("delete", "9", null)
    val stmts = PgApplySink.statements(
      rows.iterator, "public", "users", Seq("id"), Seq("id", "name"),
      maxRowsPerStmt = 2).toVector
    assert(stmts.length == 4) // 3 upsert batches (2+2+1) + 1 delete batch
    assert(stmts.take(3).forall(_.startsWith("INSERT")))
    assert(stmts.last.startsWith("DELETE"))
    assert(stmts.head.contains("('1', 'n1'), ('2', 'n2')"))
  }

  test("applyBatch: compacts per key, routes deletes off before, ignores other tables") {
    PgApplySinkSpec.recorded.clear()
    val sink = PgApplySink("public", "users", Seq("id"), Seq("id", "name"),
      PgApplySinkSpec.recorderFactory)
    val batch = envelope(Seq(
      ev(1, "insert", "users", null, Map("id" -> "1", "name" -> "a")),
      ev(2, "update", "users", null, Map("id" -> "1", "name" -> "a2")), // supersedes lsn 1
      ev(3, "insert", "users", null, Map("id" -> "2", "name" -> "b")),
      ev(4, "delete", "users", Map("id" -> "2", "name" -> null), null), // kills lsn 3
      ev(5, "insert", "other", null, Map("id" -> "9", "name" -> "x"))   // different table
    ))
    sink.applyBatch(batch, 0L)
    val stmts = PgApplySinkSpec.drain()
    assert(stmts.length == 2, s"expected one upsert + one delete, got: $stmts")
    val up = stmts.find(_.startsWith("INSERT")).get
    assert(up.contains("('1', 'a2')") && !up.contains("'a'") && !up.contains("'b'"),
      "only the key's LAST image may be applied")
    assert(!stmts.mkString.contains("'9'"), "other tables' events must not leak in")
    val del = stmts.find(_.startsWith("DELETE")).get
    assert(del.contains("('2')"))
  }

  test("applyBatch: truncate resets the table and only later events apply") {
    PgApplySinkSpec.recorded.clear()
    val sink = PgApplySink("public", "users", Seq("id"), Seq("id", "name"),
      PgApplySinkSpec.recorderFactory)
    val batch = envelope(Seq(
      ev(1, "insert", "users", null, Map("id" -> "1", "name" -> "gone")),
      ev(2, "truncate", "users", null, null),
      ev(3, "insert", "users", null, Map("id" -> "2", "name" -> "kept"))))
    sink.applyBatch(batch, 1L)
    val stmts = PgApplySinkSpec.drain()
    assert(stmts.exists(_.startsWith("TRUNCATE TABLE")), s"missing truncate in $stmts")
    assert(stmts.mkString.contains("'kept'"))
    assert(!stmts.mkString.contains("'gone'"),
      "events before the truncate are superseded by it")
    // The truncate is a driver-side barrier: exactly ONE, and it precedes
    // every partition's applies (a per-partition truncate could run after a
    // sibling partition's upserts and wipe applied rows).
    assert(stmts.count(_.startsWith("TRUNCATE")) == 1, s"one barrier truncate expected: $stmts")
    assert(stmts.head.startsWith("TRUNCATE"), "truncate must happen before all applies")
  }

  test("pgRunner: statements flow over a real socket to the server") {
    import graft.streaming.FakeWalsender
    val applied = new ConcurrentLinkedQueue[String]()
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("pw"), authMethod = "scram",
      sqlResults = sql => {
        if (sql.startsWith("INSERT") || sql.startsWith("DELETE")) {
          applied.add(sql); Some((Seq("ok"), Seq.empty))
        } else None
      })
    try {
      val runner = PgApplySink.pgRunner(
        "localhost", server.port, "u", "db", password = Some("pw"))()
      try {
        runner("""INSERT INTO "public"."t" ("id") VALUES ('1') ON CONFLICT ("id") DO NOTHING""")
        runner("""DELETE FROM "public"."t" WHERE ("id") IN (('2'))""")
      } finally runner.close()
      assert(applied.size == 2)
      assert(applied.peek().startsWith("INSERT"))
    } finally server.close()
  }

  test("foreachBatch seam: the sink applies a streaming pgcdc batch") {
    import graft.pgproto.{Messages, MessageEncoder}
    import graft.streaming.{InMemoryWalSource, PgCdcTestHook}
    PgApplySinkSpec.recorded.clear()
    val relOid = 16600L
    val cols = Seq(
      Messages.RelationColumn("id", 23L, -1, 1),
      Messages.RelationColumn("name", 25L, -1, 0))
    val T0 = 1700000000000000L
    val frames = Seq(
      MessageEncoder.xlogData(1, 1, T0, MessageEncoder.relation(relOid, "public", "users", cols)),
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.begin(103, T0, 7)),
      MessageEncoder.xlogData(101, 101, T0,
        MessageEncoder.insert(relOid, Seq(Some("1"), Some("streamed")))),
      MessageEncoder.xlogData(102, 102, T0, MessageEncoder.commit(102, 103, T0)))
    PgCdcTestHook.register("apply-sink", new InMemoryWalSource(frames))
    val sink = PgApplySink("public", "users", Seq("id"), Seq("id", "name"),
      PgApplySinkSpec.recorderFactory)
    val q = spark.readStream.format("pgcdc")
      .option("testSourceKey", "apply-sink")
      .load()
      .writeStream.foreachBatch(sink.applyBatch _).start()
    q.processAllAvailable()
    q.stop()
    val stmts = PgApplySinkSpec.drain()
    assert(stmts.exists(s => s.startsWith("INSERT") && s.contains("('1', 'streamed')")),
      s"expected the streamed insert applied, got $stmts")
  }
}

/** Static recorder so executor-side closures (same JVM in local mode) can
  * report statements back without serializing test state.
  */
object PgApplySinkSpec {
  val recorded = new ConcurrentLinkedQueue[String]()
  def drain(): Vector[String] = {
    val b = Vector.newBuilder[String]
    var s = recorded.poll()
    while (s != null) { b += s; s = recorded.poll() }
    b.result()
  }
  val recorderFactory: () => PgApplySink.SqlRunner = () => new PgApplySink.SqlRunner {
    override def apply(sql: String): Unit = recorded.add(sql)
    override def close(): Unit = ()
  }
}
