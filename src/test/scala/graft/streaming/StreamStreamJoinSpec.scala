package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pgproto.{Messages, MessageEncoder}

/** Stream-stream interval join over the pgcdc source (SURVEY §2.6 streaming
  * row): two CDC tables from ONE replication stream are branched, both sides
  * watermarked, and joined on the key plus a time-range condition — the
  * Structured Streaming pattern whose watermark bounds the join state so a
  * 100-TB/day stream doesn't accumulate unbounded click history. Verified
  * against the batch computation of the same events.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val PurchOid = 16500L
  private val ClickOid = 16501L
  private val Cols = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),
    Messages.RelationColumn("usr", 23L, -1, 0))

  private def insertTxn(oid: Long, lsnBase: Long, tMicros: Long,
      id: Long, usr: Long): Seq[Array[Byte]] = Seq(
    MessageEncoder.xlogData(lsnBase, lsnBase, tMicros,
      MessageEncoder.begin(lsnBase + 3, tMicros, 900L + id)),
    MessageEncoder.xlogData(lsnBase + 1, lsnBase + 1, tMicros,
      MessageEncoder.insert(oid, Seq(Some(id.toString), Some(usr.toString)))),
    MessageEncoder.xlogData(lsnBase + 2, lsnBase + 2, tMicros,
      MessageEncoder.commit(lsnBase + 2, lsnBase + 3, tMicros)))

  test("watermarked interval join of two CDC tables matches batch") {
    val h = 3600L * 1000000L
    val t0 = 1700000000000000L
    // clicks at +0m, +30m (user 1), +10m (user 2); purchases at +45m (user 1:
    // joins both clicks), +80m (user 1: joins only the +30m click — the +0m
    // click is outside the 1h window), +15m (user 2), +20m (user 3: no click)
    val clicks = Seq((1L, 1L, t0), (2L, 1L, t0 + h / 2), (3L, 2L, t0 + h / 6))
    val purchases = Seq((1L, 1L, t0 + 45 * 60 * 1000000L), (2L, 1L, t0 + 80 * 60 * 1000000L),
      (3L, 2L, t0 + 15 * 60 * 1000000L), (4L, 3L, t0 + 20 * 60 * 1000000L))
    val frames =
      Seq(
        MessageEncoder.xlogData(1, 1, t0,
          MessageEncoder.relation(PurchOid, "public", "purch", Cols)),
        MessageEncoder.xlogData(2, 2, t0,
          MessageEncoder.relation(ClickOid, "public", "click", Cols))) ++
        clicks.zipWithIndex.flatMap { case ((id, u, t), i) =>
          insertTxn(ClickOid, 2000L + i * 10L, t, id, u) } ++
        purchases.zipWithIndex.flatMap { case ((id, u, t), i) =>
          insertTxn(PurchOid, 3000L + i * 10L, t, id, u) }

    PgCdcTestHook.register("ssjoin", new InMemoryWalSource(frames))
    val stream = spark.readStream.format("pgcdc")
      .option("testSourceKey", "ssjoin").load()
    val p = stream.filter(col("table") === "purch")
      .select(col("after")("id").cast("long").as("p_id"),
        col("after")("usr").cast("long").as("p_usr"),
        col("commit_time").as("p_time"))
      .withWatermark("p_time", "2 hours")
    val c = stream.filter(col("table") === "click")
      .select(col("after")("id").cast("long").as("c_id"),
        col("after")("usr").cast("long").as("c_usr"),
        col("commit_time").as("c_time"))
      .withWatermark("c_time", "2 hours")
    val joined = p.join(c,
      expr("p_usr = c_usr AND c_time <= p_time AND c_time > p_time - interval 1 hour"),
      "inner")
      .select(col("p_id"), col("c_id"))

    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch equivalent of the same pairing
    val expected = (for {
      (pid, pu, pt) <- purchases
      (cid, cu, ct) <- clicks
      if pu == cu && ct <= pt && ct > pt - h
    } yield (pid, cid)).toSet
    assert(expected == Set((1L, 1L), (1L, 2L), (2L, 2L), (3L, 3L))) // spec sanity
    assert(got == expected)
  }
}
