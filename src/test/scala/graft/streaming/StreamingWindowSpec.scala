package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.pgproto.{Messages, MessageEncoder}

/** SURVEY §2.6 last row: event-time windowed aggregation with a watermark
  * over the pgcdc stream, verified against the batch computation of the same
  * events (the standard streaming/batch equivalence oracle).
  */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val RelOid = 16400L
  private val Cols = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),
    Messages.RelationColumn("v", 25L, -1, 0))

  /** One single-insert txn at `tMicros`; commit time == server time. */
  private def txn(lsnBase: Long, tMicros: Long, id: Long): Seq[Array[Byte]] = Seq(
    MessageEncoder.xlogData(lsnBase, lsnBase, tMicros,
      MessageEncoder.begin(lsnBase + 3, tMicros, 100L + id)),
    MessageEncoder.xlogData(lsnBase + 1, lsnBase + 1, tMicros,
      MessageEncoder.insert(RelOid, Seq(Some(id.toString), Some(s"v$id")))),
    MessageEncoder.xlogData(lsnBase + 2, lsnBase + 2, tMicros,
      MessageEncoder.commit(lsnBase + 2, lsnBase + 3, tMicros)))

  test("watermarked tumbling-window counts match the batch equivalent") {
    val h = 3600L * 1000000L // one hour in µs
    val t0 = 1700000000000000L - (1700000000000000L % h) // hour-aligned base
    // events across 3 hours: 2 in hour 0, 3 in hour 1, 1 in hour 2, plus a
    // late-but-within-watermark event back in hour 1
    val times = Seq(
      t0 + 10L, t0 + h / 2, // hour 0
      t0 + h + 1L, t0 + h + 2L, t0 + h + h / 2, // hour 1
      t0 + 2 * h + 5L, // hour 2
      t0 + h + h / 3) // late arrival, still hour 1
    val frames =
      Seq(MessageEncoder.xlogData(1, 1, t0, MessageEncoder.relation(RelOid, "public", "wt", Cols))) ++
        times.zipWithIndex.flatMap { case (t, i) => txn(1000L + i * 10L, t, i + 1L) }

    PgCdcTestHook.register("windowed", new InMemoryWalSource(frames))
    val stream = spark.readStream.format("pgcdc")
      .option("testSourceKey", "windowed")
      .load()
      .withWatermark("commit_time", "30 minutes")
      .groupBy(window(col("commit_time"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("win_start"), col("n"))

    // complete mode: every window visible regardless of watermark closure
    // (append would hold back windows the finite feed never advances past)
    val q = stream.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_counts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batch = Map(
      t0 / 1000000L -> 2L,
      (t0 + h) / 1000000L -> 4L, // 3 on time + 1 late within watermark
      (t0 + 2 * h) / 1000000L -> 1L)
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("append mode with watermark emits only closed windows") {
    val h = 3600L * 1000000L
    val t0 = 1700000000000000L - (1700000000000000L % h)
    // hour 0 has data, then an event far in the future closes hour 0's window
    // past the 30-minute watermark
    val times = Seq(t0 + 1L, t0 + 2L, t0 + 5 * h)
    val frames =
      Seq(MessageEncoder.xlogData(1, 1, t0, MessageEncoder.relation(RelOid, "public", "wt", Cols))) ++
        times.zipWithIndex.flatMap { case (t, i) => txn(2000L + i * 10L, t, i + 1L) }

    PgCdcTestHook.register("windowed-append", new InMemoryWalSource(frames))
    val q = spark.readStream.format("pgcdc")
      .option("testSourceKey", "windowed-append")
      // one txn per micro-batch so the watermark advances across batches
      .option("maxTxnsPerTrigger", "1")
      .load()
      .withWatermark("commit_time", "30 minutes")
      .groupBy(window(col("commit_time"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("win_start"), col("n"))
      .writeStream.format("memory").queryName("win_append")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_append").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hour 0 closed (watermark moved to t0+5h-30min) and emitted exactly once;
    // hour 5's window is still open and therefore absent
    assert(rows == Map(t0 / 1000000L -> 2L), s"got $rows")
  }
}
