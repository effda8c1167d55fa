package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

/** A continuously-maintained aggregate VIEW over one lake table — the
  * composition of the lake's pull API with incremental view maintenance:
  * [[refresh]] polls every newly committed changelog batch through the
  * lake's durable named cursor, advances an [[IncrementalAgg]] state by
  * ONE delta step over the whole polled span (signed deltas telescope
  * across consecutive updates of a key, so a span is as good as a batch),
  * and persists the new state next to the lake data. Downstream dashboards
  * read [[read]] — group-cardinality parquet — instead of refolding the
  * table.
  *
  * Consistency: the dirty-group recompute source is `stateAsOf(span end)`,
  * NOT `latestState` — the writer may land new batches while a refresh
  * runs, and folding those into recomputed groups while clean groups lag
  * would tear the view. Time travel pins every group to the same batch
  * boundary.
  *
  * Crash safety: state lands under `_graft_views/<name>/asof=<hi>` with a
  * commit marker, keyed by the span's last batch id, BEFORE the lake
  * cursor advances. A crash between the two re-delivers the same span,
  * which recomputes from the still-retained previous state and overwrites
  * `asof=<hi>` with identical content — idempotent, same at-least-once →
  * exactly-once story as the changelog itself. States older than the
  * cursor are garbage-collected at the next refresh.
  *
  * Prerequisite (same as [[IncrementalAgg]]): tables with updates/deletes
  * need REPLICA IDENTITY FULL so retractions carry their full old image.
  */
final class MaintainedView(
    lake: LakeSink, agg: IncrementalAgg,
    schemaName: String, table: String, name: String) {

  private def viewDir = new Path(lake.root, s"_graft_views/$name")
  private def commitsDir = new Path(viewDir, "_commits")
  private def cursorName = s"view_$name"

  private def fs(spark: SparkSession): FileSystem =
    viewDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedStates(f: FileSystem): Seq[Long] =
    if (!f.exists(commitsDir)) Seq.empty
    else f.listStatus(commitsDir).toSeq
      .flatMap(st => st.getPath.getName.toLongOption).sorted

  private def stateAt(spark: SparkSession, asOf: Long): DataFrame =
    spark.read.parquet(new Path(viewDir, s"asof=$asOf").toString)

  /** Apply every newly committed lake batch to the view. Returns the
    * number of batches applied (0 = already current).
    */
  def refresh(spark: SparkSession): Int = {
    val from = lake.cursor(spark, cursorName)
    lake.poll(spark, cursorName) { span =>
      val f = fs(spark)
      // partition-column inference can type small batch_id values as int
      val hi = span.agg(max(col("batch_id").cast("long"))).head().getLong(0)
      // replay where only the cursor advance was lost: the state for this
      // span is already committed — rewriting it would tear a concurrent
      // read; just let poll re-advance the cursor
      if (!f.exists(new Path(commitsDir, hi.toString))) {
        val prev = committedStates(f).filter(_ <= from).lastOption
          .map(stateAt(spark, _)).getOrElse(agg.init(spark))
        val events = span.filter(
          col("schema") === schemaName && col("table") === table)
        val next = agg.step(prev, events,
          lake.stateAsOf(spark, schemaName, table, hi).select(col("after")))
        val out = new Path(viewDir, s"asof=$hi")
        next.write.mode("overwrite").parquet(out.toString)
        f.mkdirs(commitsDir)
        f.create(new Path(commitsDir, hi.toString), true).close()
      }
      // previous states below the replay horizon are unreachable now
      committedStates(f).filter(_ < from).foreach { v =>
        f.delete(new Path(viewDir, s"asof=$v"), true)
        f.delete(new Path(commitsDir, v.toString), false)
      }
    }
  }

  /** The current view: group columns, `n`, `sum_<m>`, `min_<m>`,
    * `max_<m>` — group-cardinality, no fold, no scan of the table.
    */
  def read(spark: SparkSession): DataFrame =
    committedStates(fs(spark)).lastOption match {
      case Some(v) => agg.view(stateAt(spark, v))
      case None    => agg.view(agg.init(spark))
    }
}
