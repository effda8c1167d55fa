package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{GraftConfig, SparkTestBase}
import graft.services.Publication.{Config, PubTable}
import graft.streaming.FakeWalsender

/** Adding a table to a running pipeline: publication ADDed BEFORE the
  * temporary slot pins the consistent point (no event can fall between
  * "not yet published" and "not yet in the snapshot"), the chunked read
  * runs under the exported snapshot, and the merge rule drops exactly the
  * stream events the snapshot already contains.
  */
class TableAdditionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val ChunkRange = """id >= (-?\d+) AND id (<=|<) (-?\d+)""".r.unanchored

  private def serve(sql: String): Option[(Seq[String], Seq[Seq[Option[String]]])] = {
    def ok = Some((Seq("ok"), Seq.empty[Seq[Option[String]]]))
    if (sql.contains("pg_publication_tables")) // publication EXISTS, users only
      Some((Seq("pubname", "alltables", "ins", "upd", "del", "trunc", "tables"),
        Seq(Seq(Some("e2e_pub"), Some("f"), Some("t"), Some("t"), Some("t"),
          Some("t"), Some("{public.users}")))))
    else if (sql.startsWith("ALTER PUBLICATION")) ok
    else if (sql.startsWith("CREATE_REPLICATION_SLOT")) // TEMPORARY pin
      Some((Seq("slot_name", "consistent_point", "snapshot_name", "output_plugin"),
        Seq(Seq(Some("add_slot"), Some("0/50"), Some("add-snap-1"), Some("pgoutput")))))
    else if (sql.contains("format_type"))
      Some((Seq("attname", "type"), Seq(Seq(Some("id"), Some("integer")))))
    else if (sql.contains("atttypid"))
      Some((Seq("attname", "oid", "typmod", "key"), Seq(
        Seq(Some("id"), Some("23"), Some("-1"), Some("1")),
        Seq(Some("v"), Some("25"), Some("-1"), Some("0")))))
    else if (sql.startsWith("SELECT MIN"))
      Some((Seq("mn", "mx"), Seq(Seq(Some("1"), Some("4")))))
    else if (sql.startsWith("SELECT COUNT(*)"))
      Some((Seq("n"), Seq(Seq(Some("4")))))
    else if (sql.contains("pg_relation_size"))
      Some((Seq("pages"), Seq(Seq(Some("1")))))
    else if (sql.contains("reltuples"))
      Some((Seq("t"), Seq(Seq(Some("4")))))
    else if (sql.startsWith("BEGIN ISOLATION LEVEL REPEATABLE READ")) ok
    else if (sql == "COMMIT") ok
    else sql match {
      case ChunkRange(lo, op, hi) =>
        val last = if (op == "<=") hi.toLong else hi.toLong - 1
        val rows = (lo.toLong to last).filter(i => i >= 1 && i <= 4)
          .map(i => Seq(Some(i.toString), Some(s"as-of-pin-$i")))
        Some((Seq("id", "v"), rows))
      case _ => None
    }
  }

  test("publish -> pin -> pinned read -> LSN merge, exactly once across the seam") {
    val server = new FakeWalsender(Seq.empty, sqlResults = serve)
    try {
      val cfg = GraftConfig(
        host = "127.0.0.1", port = server.port, username = "u", database = "db",
        publication = Config("e2e_pub", Seq(PubTable("public", "users"))),
        slotName = "graft_slot",
        snapshot = SnapshotConfig(chunkSize = 2L))
      val exec = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None).executor

      val added = TableAddition.addTable(
        spark, cfg, exec, exec, "public", "events", tempSlotName = "add_slot")

      assert(added.publicationDdl ==
        Seq("""ALTER PUBLICATION "e2e_pub" ADD TABLE "public"."events""""))
      assert(added.consistentPoint == graft.pgproto.Lsn.parse("0/50"))
      assert(added.keyNames == Seq("id"))

      // ordering: publish BEFORE pin — the B7 argument for the seam
      val qs = server.queries.synchronized(server.queries.toVector)
      val alterAt = qs.indexWhere(_.startsWith("ALTER PUBLICATION"))
      val pinAt = qs.indexWhere(_.startsWith("CREATE_REPLICATION_SLOT"))
      assert(alterAt >= 0 && pinAt > alterAt,
        s"publication must be added before the consistent point pins: $qs")
      assert(qs(pinAt).contains(" TEMPORARY "), "the pin slot must be temporary")

      // the pinned image, typed (collect() is what executes the chunk reads)
      val snap = added.snapshot.orderBy("id").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(snap == (1 to 4).map(i => (i, s"as-of-pin-$i")))
      assert(server.queries.synchronized(server.queries.toVector)
        .exists(_.contains("SET TRANSACTION SNAPSHOT 'add-snap-1'")),
        "chunk reads must run under the exported snapshot")

      // merge: a pre-pin event for the table (already in the image) drops,
      // a post-pin event survives, other tables pass untouched
      import spark.implicits._
      val pin = added.consistentPoint
      val stream = Seq(
        // duplicate of snapshot content: commit at the pin
        (pin - 2, pin, 7L, "insert", "public", "events",
          Map("id" -> "2", "v" -> "pre-pin"), Seq("id")),
        // later update: supersedes the image
        (pin + 10, pin + 12, 8L, "update", "public", "events",
          Map("id" -> "2", "v" -> "post-pin"), Seq("id")),
        // unrelated table: untouched by the seam
        (pin - 5, pin - 3, 6L, "insert", "public", "users",
          Map("id" -> "9", "name" -> "u9"), Seq("id")))
        .toDF("lsn", "commit_lsn", "xid", "op", "schema", "table", "after", "key_names")
        .withColumn("message_time", lit(new java.sql.Timestamp(0L)))
        .withColumn("commit_time", lit(new java.sql.Timestamp(0L)))
        .withColumn("before", lit(null).cast("map<string,string>"))

      val merged = TableAddition.mergeWithStream(spark, added, stream)
      val events = merged.filter($"table" === "events")
        .select($"lsn", element_at($"after", "id").as("id"), element_at($"after", "v").as("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(!events.exists(_._3 == "pre-pin"), "pre-pin event must drop (already in the image)")
      assert(events.exists(_._3 == "post-pin"), "post-pin event must survive")
      assert(events.count(_._2 == "2") == 2,
        "id 2: snapshot image + superseding update, merged by LSN downstream")
      // LSN-max resolution per key lands on the post-pin value
      val latest = merged.filter($"table" === "events")
        .withColumn("id", element_at($"after", "id"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"id").orderBy($"lsn".desc)))
        .filter($"rn" === 1)
        .select($"id", element_at($"after", "v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(latest == Map(
        "1" -> "as-of-pin-1", "2" -> "post-pin",
        "3" -> "as-of-pin-3", "4" -> "as-of-pin-4"))
      assert(merged.filter($"table" === "users").count() == 1, "other tables untouched")

      // the symmetric removal unpublishes; repeating it is a no-op
      assert(TableAddition.removeTable(cfg, exec, "public", "users") ==
        Seq("""ALTER PUBLICATION "e2e_pub" DROP TABLE "public"."users""""))
      assert(TableAddition.removeTable(cfg, exec, "public", "ghost").isEmpty)
    } finally server.close()
  }
}
