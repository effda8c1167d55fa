package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.SparkTestBase
import graft.pgproto.Messages.RelationColumn
import graft.streaming.FakeWalsender

/** The wire-protocol snapshot read: chunked SELECTs over real sockets
  * against the fake server, exported-snapshot pinning per chunk, and
  * text→typed projection through the same cast family as the CDC views.
  */
class SnapshotWireSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val cols = Seq(
    RelationColumn("id", 23L, -1, 1),    // int4
    RelationColumn("name", 25L, -1, 0),  // text
    RelationColumn("active", 16L, -1, 0)) // bool

  private val Range = """id >= (-?\d+) AND id (<=|<) (-?\d+)""".r.unanchored

  private def serve(sql: String): Option[(Seq[String], Seq[Seq[Option[String]]])] =
    if (sql.startsWith("BEGIN ISOLATION LEVEL REPEATABLE READ")) Some((Seq("ok"), Seq.empty))
    else if (sql == "COMMIT") Some((Seq("ok"), Seq.empty))
    else sql match {
      case Range(lo, op, hi) =>
        val last = if (op == "<=") hi.toLong else hi.toLong - 1
        val rows = (lo.toLong to last).filter(i => i >= 1 && i <= 6).map(i =>
          Seq(Some(i.toString), Some(s"u$i"), Some(if (i % 2 == 0) "t" else "f")))
        Some((cols.map(_.name), rows))
      case _ => None
    }

  test("viaWire: chunked, snapshot-pinned, typed — no JDBC driver involved") {
    val server = new FakeWalsender(Seq.empty,
      requirePassword = Some("pw"), authMethod = "scram", sqlResults = serve)
    try {
      val stats = ChunkPlanner.TableStats(
        rowCount = 6L, intPkColumn = Some("id"), pkMin = 1L, pkMax = 6L)
      val df = SnapshotReader.viaWire(
        spark, "localhost", server.port, "u", "db", Some("pw"),
        "public", "users", cols,
        stats, SnapshotConfig(chunkSize = 3L),
        exportedSnapshotId = Some("demo-snap-id"))
      assert(df.schema == StructType(Seq(
        StructField("id", IntegerType, nullable = true),
        StructField("name", StringType, nullable = true),
        StructField("active", BooleanType, nullable = true))))
      val rows = df.collect().sortBy(_.getInt(0))
      assert(rows.length == 6)
      assert(rows.map(_.getInt(0)).toSeq == (1 to 6))
      assert(rows.map(_.getString(1)).toSeq == (1 to 6).map(i => s"u$i"))
      assert(rows.map(_.getBoolean(2)).toSeq == (1 to 6).map(_ % 2 == 0))

      // Two chunks ([1,4) and [4,6]), each wrapped BEGIN/pin … COMMIT.
      val qs = server.queries.synchronized(server.queries.toVector)
      val pins = qs.filter(_.startsWith("BEGIN ISOLATION LEVEL REPEATABLE READ"))
      assert(pins.length == 2)
      assert(pins.forall(_.contains("SET TRANSACTION SNAPSHOT 'demo-snap-id'")))
      assert(qs.count(_ == "COMMIT") == 2)
      assert(qs.count(_.startsWith("SELECT")) == 2)
      assert(qs.filter(_.startsWith("SELECT")).forall(
        _.startsWith("""SELECT "id", "name", "active" FROM "public"."users"""")))
    } finally server.close()
  }

  test("lazyChunkRows pulls one chunk at a time — never the partition's chunk set") {
    // the per-task memory contract (<= chunkSize rows) depends on the
    // chunk stream being LAZY: chunk N+1's SELECT must not run until
    // chunk N's rows have been emitted downstream. An eager flatMap here
    // buffers tableRows/parts rows per task — executor OOM at 100 TB.
    val fetched = scala.collection.mutable.ArrayBuffer.empty[String]
    val chunkRows = Map(
      "c0" -> Seq(Seq("a"), Seq("b")),
      "c1" -> Seq(Seq("c")),
      "c2" -> Seq(Seq("d")))
    val it = SnapshotReader.lazyChunkRows(
      sql => { fetched += sql; chunkRows(sql) },
      Iterator("c0", "c1", "c2"), None, None, nCols = 1)
    assert(fetched.isEmpty, "no chunk may be fetched before the first pull")
    assert(it.next().getString(0) == "a")
    assert(fetched.toSeq == Seq("c0"),
      s"first pull must fetch only chunk 0, got $fetched")
    assert(it.next().getString(0) == "b")
    assert(fetched.toSeq == Seq("c0"), "still inside chunk 0's rows")
    assert(it.next().getString(0) == "c")
    assert(fetched.toSeq == Seq("c0", "c1"),
      "crossing the chunk boundary fetches exactly the next chunk")
    assert(it.next().getString(0) == "d")
    assert(!it.hasNext)
    assert(fetched.toSeq == Seq("c0", "c1", "c2"))
  }
}
