package graft.snapshot

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.{GraftConfig, SparkTestBase}
import graft.services.Publication.{Config, PubTable}
import graft.sinks.LakeSink
import graft.streaming.FakeWalsender

/** Live table addition composed with the lake sink: the pinned snapshot
  * lands in the negative-id batch space at the consistent point, the
  * running stream's batches keep landing as positive epochs, and the
  * lake fold yields exactly one image per key ACROSS the seam — pre-pin
  * stream events (whose effects the snapshot already contains) lose the
  * (commit_lsn, lsn) fold to the image; post-pin events supersede it.
  * The drop-duplicates filter [[TableAddition.mergeWithStream]] applies
  * eagerly is therefore not needed on the lake path: the fold's ordering
  * subsumes it.
  */
class TableAdditionLakeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val ChunkRange = """id >= (-?\d+) AND id (<=|<) (-?\d+)""".r.unanchored

  // Same fake catalog/walsender surface as TableAdditionSpec: a live
  // publication holding public.users, a temporary pin at 0/50, and a
  // 4-row public.events table served in pinned chunks.
  private def serve(sql: String): Option[(Seq[String], Seq[Seq[Option[String]]])] = {
    def ok = Some((Seq("ok"), Seq.empty[Seq[Option[String]]]))
    if (sql.contains("pg_publication_tables"))
      Some((Seq("pubname", "alltables", "ins", "upd", "del", "trunc", "tables"),
        Seq(Seq(Some("e2e_pub"), Some("f"), Some("t"), Some("t"), Some("t"),
          Some("t"), Some("{public.users}")))))
    else if (sql.startsWith("ALTER PUBLICATION")) ok
    else if (sql.startsWith("CREATE_REPLICATION_SLOT"))
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

  private val T = new java.sql.Timestamp(0L)
  private def ev(
      lsn: Long, commitLsn: Long, op: String, table: String,
      after: Map[String, String]): Row =
    Row(lsn, commitLsn, 7L, op, "public", table, T, T, Seq("id"),
      null, after)

  test("added table's pinned snapshot + live CDC fold to one image per key in the lake") {
    val server = new FakeWalsender(Seq.empty, sqlResults = serve)
    val dir = Files.createTempDirectory("lake-addition").toString
    try {
      val cfg = GraftConfig(
        host = "127.0.0.1", port = server.port, username = "u", database = "db",
        publication = Config("e2e_pub", Seq(PubTable("public", "users"))),
        slotName = "graft_slot",
        snapshot = SnapshotConfig(chunkSize = 2L))
      val exec = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None).executor
      val lake = new LakeSink(dir)

      // the pipeline is already landing users batches when the table is added
      def envelope(rows: Seq[Row]) = spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        graft.cdc.ChangeEvent.schema)
      lake.appendBatch(envelope(Seq(
        ev(10, 11, "insert", "users", Map("id" -> "1", "name" -> "u1")))), 0L)

      val added = TableAddition.addTable(
        spark, cfg, exec, exec, "public", "events", tempSlotName = "add_slot")
      val pin = added.consistentPoint

      // land the pinned image in the snapshot (negative) id space at the pin
      lake.appendSnapshot(s"${added.schema}.${added.table}",
        added.snapshot, added.keyNames, pin, -1L)

      // the stream keeps going: a pre-pin duplicate (commit at the pin, its
      // effect already inside the image), a post-pin supersession, and an
      // unrelated users event — one ordinary epoch batch
      lake.appendBatch(envelope(Seq(
        ev(pin - 2, pin, "insert", "events", Map("id" -> "2", "v" -> "pre-pin")),
        ev(pin + 10, pin + 12, "update", "events", Map("id" -> "2", "v" -> "post-pin")),
        ev(pin + 11, pin + 12, "insert", "users", Map("id" -> "2", "name" -> "u2")))), 1L)

      def stateOf(table: String): Map[String, (String, Long, Long)] =
        lake.latestState(spark, "public", table)
          .select(col("k"),
            coalesce(element_at(col("after"), "v"),
              element_at(col("after"), "name")).as("v"),
            col("commit_lsn"), col("lsn"))
          .collect()
          .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
          .toMap

      val events = stateOf("events")
      assert(events.keySet == Set("1", "2", "3", "4"),
        s"exactly one image per key across the seam: $events")
      assert(events("2")._1 == "post-pin",
        "a post-pin stream event supersedes the snapshot image")
      assert(events("1") == (("as-of-pin-1", pin, pin)),
        "untouched keys carry the image at the consistent point")
      assert(!events.values.exists(_._1 == "pre-pin"),
        "a pre-pin stream event must lose the fold to the snapshot image")
      assert(stateOf("users").keySet == Set("1", "2"),
        "existing tables are untouched by the addition seam")

      // the seam survives compaction + vacuum (image and stream batches
      // fold into the same bucketed base)
      lake.compact(spark); lake.vacuum(spark)
      val afterCompact = stateOf("events")
      assert(afterCompact == events, "fold across the seam is compaction-stable")
    } finally {
      server.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
