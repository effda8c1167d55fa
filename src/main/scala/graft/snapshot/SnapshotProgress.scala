package graft.snapshot

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}
import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/** Snapshot-phase observability — the reference's snapshot gauge/counter
  * set (`internal/metric/metric.go:57-66`: in-progress, total/completed
  * tables, total rows, duration, total/completed chunks, active workers),
  * mapped onto Spark's two truth sources:
  *
  *  - executor-side counts ride `LongAccumulator`s, updated per chunk as
  *    [[SnapshotReader.viaWire]] partitions complete (speculative/re-run
  *    tasks can over-count, same as any Spark metric accumulator — these
  *    are gauges, not ledgers);
  *  - driver-side lifecycle fields (tables, in-progress, duration) are
  *    plain atomics updated by the boot path;
  *  - "active workers" is answered by the scheduler itself: the number of
  *    running tasks in jobs launched under the [[SnapshotProgress.JobGroup]]
  *    job group (the reference counts its own worker pool; Spark's pool IS
  *    the task set).
  *
  * Serve the gauges over HTTP by passing this to
  * [[graft.streaming.GraftMetricsServer]] — series land under
  * `graft_snapshot_*`, mirroring the reference's `go_pq_cdc_snapshot_*`.
  */
final class SnapshotProgress(sc: SparkContext) {

  /** Chunks fully read on executors (reference `snapshot_completed_chunks`). */
  val completedChunks: LongAccumulator = sc.longAccumulator("graft.snapshot.completedChunks")
  /** Rows read on executors (reference `snapshot_total_rows`). */
  val rowsRead: LongAccumulator = sc.longAccumulator("graft.snapshot.rows")

  private val totalTables = new AtomicInteger(0)
  private val completedTables = new AtomicInteger(0)
  private val totalChunks = new AtomicLong(0L)
  private val inProgress = new AtomicBoolean(false)
  private val startedAtMs = new AtomicLong(0L)
  private val finishedAtMs = new AtomicLong(0L)

  /** Boot calls this once the table list is known. */
  def begin(tables: Int): Unit = {
    totalTables.set(tables)
    completedTables.set(0)
    totalChunks.set(0L)
    completedChunks.reset()
    rowsRead.reset()
    startedAtMs.set(System.currentTimeMillis())
    finishedAtMs.set(0L)
    inProgress.set(true)
  }

  /** The chunk planner reports each table's plan size as it is computed. */
  def addPlannedChunks(n: Long): Unit = { totalChunks.addAndGet(n); () }

  /** One table's frame fully materialized into the sink. */
  def tableDone(): Unit = { completedTables.incrementAndGet(); () }

  def end(): Unit = {
    finishedAtMs.set(System.currentTimeMillis())
    inProgress.set(false)
  }

  /** Seconds since begin() while running; frozen at end(). */
  def durationSeconds: Double = {
    val s = startedAtMs.get()
    if (s == 0L) 0.0
    else {
      val e = if (finishedAtMs.get() > 0L) finishedAtMs.get() else System.currentTimeMillis()
      (e - s) / 1000.0
    }
  }

  /** Running tasks in snapshot-job-group jobs (reference `active_workers`). */
  def activeWorkers: Int = {
    val tracker = sc.statusTracker
    tracker.getJobIdsForGroup(SnapshotProgress.JobGroup)
      .flatMap(tracker.getJobInfo(_))
      .filter(_.status() == org.apache.spark.JobExecutionStatus.RUNNING)
      .flatMap(_.stageIds())
      .flatMap(tracker.getStageInfo(_))
      .map(_.numActiveTasks())
      .sum
  }

  /** One scrape: metric suffix → value, prefixed `graft_snapshot_` by the
    * server. Names mirror the reference's series.
    */
  def gauges: Seq[(String, Double)] = Seq(
    "in_progress" -> (if (inProgress.get()) 1.0 else 0.0),
    "total_tables" -> totalTables.get().toDouble,
    "completed_tables" -> completedTables.get().toDouble,
    "total_chunks" -> totalChunks.get().toDouble,
    "completed_chunks" -> completedChunks.value.toDouble,
    "rows_total" -> rowsRead.value.toDouble,
    "duration_seconds" -> durationSeconds,
    "active_workers" -> activeWorkers.toDouble)
}

object SnapshotProgress {
  /** Set this job group (`sc.setJobGroup(JobGroup, …)`) around snapshot
    * materialization so `active_workers` counts only snapshot tasks.
    */
  val JobGroup = "graft-snapshot"
}
