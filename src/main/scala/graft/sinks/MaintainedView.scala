package graft.sinks

import org.apache.hadoop.fs.Path
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

  private val states = new StateLog(new Path(lake.root, s"_graft_views/$name"))
  private def cursorName = s"view_$name"

  /** Apply every newly committed lake batch to the view (including a LATE
    * snapshot batch below the cursor's floor — a mid-stream table
    * addition). Returns the number of batches applied (0 = already
    * current).
    */
  def refresh(spark: SparkSession): Int = {
    val from = lake.cursorInterval(spark, cursorName)
    lake.poll(spark, cursorName) { span =>
      val f = states.fs(spark)
      // partition-column inference can type small batch_id values as int
      val bounds = span
        .agg(min(col("batch_id").cast("long")), max(col("batch_id").cast("long")))
        .head()
      // a span of only EMPTY batches (zero rows) has null bounds: no
      // deltas to apply — just let poll advance the cursor past them
      if (!bounds.isNullAt(0)) {
        val key = (math.min(from._1, bounds.getLong(0)),
          math.max(from._2, bounds.getLong(1)))
        // replay where only the cursor advance was lost: the state for
        // this span is already committed — rewriting it would tear a
        // concurrent read; just let poll re-advance the cursor
        if (!states.isCommitted(f, key)) {
          val prev = states.latestWithin(f, from)
            .map(states.read(spark, _)).getOrElse(agg.init(spark))
          val events = span.filter(
            col("schema") === schemaName && col("table") === table)
          // recompute source pinned to exactly the applied interval: asOf
          // bounds the top, the floor keeps a concurrently landing late
          // snapshot (not in this span) out of the dirty-group rebuild
          val next = agg.step(prev, events,
            lake.stateAsOf(spark, schemaName, table, key._2, key._1)
              .select(col("after")))
          states.commit(f, next, key)
        }
        // previous states inside the replay horizon are unreachable now
        states.gcWithin(f, from)
      }
    }
  }

  /** The current view: group columns, `n`, `sum_<m>`, `min_<m>`,
    * `max_<m>` — group-cardinality, no fold, no scan of the table.
    */
  def read(spark: SparkSession): DataFrame =
    states.latest(states.fs(spark)) match {
      case Some(v) => agg.view(states.read(spark, v))
      case None    => agg.view(agg.init(spark))
    }

  /** Ops gauges for the `graft_lake_*` family — concatenate with the
    * sink's: `lakeGauges = Some(() => lake.gauges(spark) ++
    * view.gauges(spark))`. Driver-side metadata listings only.
    */
  def gauges(spark: SparkSession): Seq[(String, Double)] = {
    val asOf = states.latest(states.fs(spark))
    val (neg, pos) = lake.cursorInterval(spark, cursorName)
    val lag = lake.committedBatchIds(spark).count(id => id < neg || id > pos)
    Seq(
      s"view_${name}_asof" -> asOf.map(_._2).getOrElse(-1L).toDouble,
      s"view_${name}_lag_batches" -> lag.toDouble)
  }
}
