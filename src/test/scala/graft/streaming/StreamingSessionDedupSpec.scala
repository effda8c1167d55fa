package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pgproto.{Messages, MessageEncoder}

/** Two more Structured Streaming operators over the pgcdc source:
  * `session_window` (gap-based sessionization on event time) and
  * `dropDuplicatesWithinWatermark` (redelivery dedup whose state expires
  * with the watermark — the operator that makes at-least-once upstream
  * delivery exactly-once downstream without unbounded state).
  */
class StreamingSessionDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val RelOid = 16600L
  private val Cols = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),
    Messages.RelationColumn("usr", 23L, -1, 0))

  private def insertTxn(lsnBase: Long, tMicros: Long, id: Long, usr: Long): Seq[Array[Byte]] = Seq(
    MessageEncoder.xlogData(lsnBase, lsnBase, tMicros,
      MessageEncoder.begin(lsnBase + 3, tMicros, 700L + lsnBase)),
    MessageEncoder.xlogData(lsnBase + 1, lsnBase + 1, tMicros,
      MessageEncoder.insert(RelOid, Seq(Some(id.toString), Some(usr.toString)))),
    MessageEncoder.xlogData(lsnBase + 2, lsnBase + 2, tMicros,
      MessageEncoder.commit(lsnBase + 2, lsnBase + 3, tMicros)))

  private def rel(t: Long) =
    MessageEncoder.xlogData(1, 1, t, MessageEncoder.relation(RelOid, "public", "sess", Cols))

  test("session_window groups CDC events by activity gaps") {
    val m = 60L * 1000000L
    val t0 = 1700000000000000L
    // user 1: events at +0, +5m, +8m (one session, 10m gap) then +30m (new
    // session); user 2: single event at +2m
    val times = Seq((1L, 1L, t0), (2L, 1L, t0 + 5 * m), (3L, 1L, t0 + 8 * m),
      (4L, 1L, t0 + 30 * m), (5L, 2L, t0 + 2 * m))
    val frames = rel(t0) +: times.zipWithIndex.flatMap { case ((id, u, t), i) =>
      insertTxn(4000L + i * 10L, t, id, u) }

    PgCdcTestHook.register("sesswin", new InMemoryWalSource(frames))
    val agg = spark.readStream.format("pgcdc")
      .option("testSourceKey", "sesswin").load()
      .select(col("after")("usr").cast("long").as("usr"), col("commit_time"))
      .groupBy(col("usr"), session_window(col("commit_time"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("usr"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(identity).map { case (k, v) => (k, v.size) }
    // user 1: one 3-event session + one 1-event session; user 2: one session
    assert(got == Map((1L, 3L) -> 1, (1L, 1L) -> 1, (2L, 1L) -> 1), s"got $got")
  }

  test("dropDuplicatesWithinWatermark suppresses redelivered change events") {
    val m = 60L * 1000000L
    val t0 = 1700000000000000L
    // ids 1,2,3 delivered once; id 2 redelivered twice within the watermark
    val deliveries = Seq((1L, t0), (2L, t0 + m), (2L, t0 + 2 * m), (3L, t0 + 3 * m),
      (2L, t0 + 4 * m))
    val frames = rel(t0) +: deliveries.zipWithIndex.flatMap { case ((id, t), i) =>
      insertTxn(5000L + i * 10L, t, id, 1L) }

    PgCdcTestHook.register("dedupwm", new InMemoryWalSource(frames))
    val deduped = spark.readStream.format("pgcdc")
      .option("testSourceKey", "dedupwm").load()
      .select(col("after")("id").cast("long").as("id"), col("commit_time"))
      .withWatermark("commit_time", "1 hour")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"got $ids")
  }
}
