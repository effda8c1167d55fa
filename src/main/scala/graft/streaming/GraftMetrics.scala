package graft.streaming

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryProgress

/** Metrics parity with the reference's gauge/counter set
  * (`internal/metric/metric.go:16-38,100-125`), mapped onto the two Spark
  * surfaces an ops team actually watches:
  *
  *  - DRIVER gauges ride [[org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics]]
  *    on the micro-batch stream and surface per-trigger in
  *    `StreamingQueryProgress.sources[].metrics`: committed-txn backlog
  *    (txns/bytes), confirmed LSN, cumulative delivered txns, open streamed
  *    txns, and `cdcLatencyMs` = now − last frame's server send time — the
  *    reference's `cdc_latency` (`stream.go:412`).
  *  - EXECUTOR counters are DataSource V2 custom task metrics, summed by
  *    Spark across tasks into the SQL metrics UI: events decoded,
  *    heartbeats suppressed (P5), and streamed events spilled to disk.
  */
object GraftMetrics {

  final class EventsDecodedMetric extends CustomSumMetric {
    override def name(): String = "eventsDecoded"
    override def description(): String = "change events decoded on executors"
  }
  final class HeartbeatsSuppressedMetric extends CustomSumMetric {
    override def name(): String = "heartbeatsSuppressed"
    override def description(): String = "heartbeat events suppressed (P5)"
  }
  final class StreamEventsSpilledMetric extends CustomSumMetric {
    override def name(): String = "streamEventsSpilled"
    override def description(): String = "streamed-txn events spilled to local disk"
  }
  // Per-op counters — the reference's totalInsert/totalUpdate/totalDelete
  // (`internal/metric/metric.go:42-44`). Counted where decode happens (on
  // the executors), summed by Spark across tasks.
  final class InsertsDecodedMetric extends CustomSumMetric {
    override def name(): String = "insertsDecoded"
    override def description(): String = "INSERT change events decoded"
  }
  final class UpdatesDecodedMetric extends CustomSumMetric {
    override def name(): String = "updatesDecoded"
    override def description(): String = "UPDATE change events decoded"
  }
  final class DeletesDecodedMetric extends CustomSumMetric {
    override def name(): String = "deletesDecoded"
    override def description(): String = "DELETE change events decoded"
  }

  val supported: Array[CustomMetric] =
    Array(new EventsDecodedMetric, new HeartbeatsSuppressedMetric,
      new StreamEventsSpilledMetric, new InsertsDecodedMetric,
      new UpdatesDecodedMetric, new DeletesDecodedMetric)

  private final case class TaskMetric(metricName: String, metricValue: Long) extends CustomTaskMetric {
    override def name(): String = metricName
    override def value(): Long = metricValue
  }

  def taskMetrics(eventsDecoded: Long, heartbeatsSuppressed: Long, spilled: Long,
      inserts: Long = 0L, updates: Long = 0L, deletes: Long = 0L): Array[CustomTaskMetric] =
    Array(
      TaskMetric("eventsDecoded", eventsDecoded),
      TaskMetric("heartbeatsSuppressed", heartbeatsSuppressed),
      TaskMetric("streamEventsSpilled", spilled),
      TaskMetric("insertsDecoded", inserts),
      TaskMetric("updatesDecoded", updates),
      TaskMetric("deletesDecoded", deletes))
}

/** Driver-side totals of the executor task counters — the scrapeable
  * `*_total` series the reference's dashboard plots
  * (`go_pq_cdc_insert_total` etc., `grafana/dashboard.json`). DSv2 custom
  * task metrics surface as named task accumulators; this `SparkListener`
  * sums their per-task updates as tasks finish. Register with
  * `spark.sparkContext.addSparkListener` (done by
  * [[GraftMetricsServer.start]]).
  */
final class GraftTaskMetricsListener extends org.apache.spark.scheduler.SparkListener {
  import GraftMetrics._
  // task-accumulator display name (the CustomMetric description) → series
  private val tracked: Map[String, String] = Map(
    new EventsDecodedMetric().description() -> "events_decoded_total",
    new HeartbeatsSuppressedMetric().description() -> "heartbeats_suppressed_total",
    new StreamEventsSpilledMetric().description() -> "stream_events_spilled_total",
    new InsertsDecodedMetric().description() -> "insert_total",
    new UpdatesDecodedMetric().description() -> "update_total",
    new DeletesDecodedMetric().description() -> "delete_total")
  private val totals =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
    e.taskInfo.accumulables.foreach { acc =>
      for {
        name <- acc.name
        series <- tracked.get(name)
        update <- acc.update
      } update match {
        case n: java.lang.Long =>
          totals.computeIfAbsent(series,
            _ => new java.util.concurrent.atomic.AtomicLong()).addAndGet(n)
          ()
        case _ => ()
      }
    }

  /** series suffix → cumulative value (prefixed `graft_pgcdc_` by the
    * server). Every tracked series is present — counters that haven't
    * ticked read 0 (a task reports no accumulator update for them at all).
    */
  def counters: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    tracked.values.map(_ -> 0L).toMap ++
      totals.asScala.map { case (k, v) => k -> v.get() }
  }
}

/** Aggregating [[StreamingQueryListener]]: retains the latest progress and
  * cumulative input-row count, and exposes the pgcdc source's gauge map —
  * the hook an ops integration (StatsD, Prometheus bridge, log shipper)
  * attaches via `spark.streams.addListener`.
  */
final class GraftMetricsListener extends StreamingQueryListener {
  @volatile private var last: StreamingQueryProgress = null
  @volatile private var lastPgcdc: Map[String, String] = Map.empty
  private val inputRows = new java.util.concurrent.atomic.AtomicLong(0L)
  private val batches = new java.util.concurrent.atomic.AtomicLong(0L)

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    last = event.progress
    // retain the newest gauge map from a PGCDC source specifically
    // (identified by its gauge signature): another stream's progress in the
    // same session must not shadow the CDC gauges with an empty map
    event.progress.sources.iterator
      .map(s => Option(s.metrics).map(_.asScala.toMap).getOrElse(Map.empty))
      .find(_.contains("backlogTxns"))
      .foreach(lastPgcdc = _)
    inputRows.addAndGet(event.progress.numInputRows)
    batches.incrementAndGet()
    ()
  }
  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def lastProgress: Option[StreamingQueryProgress] = Option(last)
  def totalInputRows: Long = inputRows.get()
  def batchCount: Long = batches.get()

  /** The pgcdc gauge map from the most recent progress of a pgcdc-sourced
    * query (empty before the first trigger).
    */
  def sourceMetrics: Map[String, String] = lastPgcdc
}
