package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A continuously-maintained two-table equi-JOIN over the lake — IVM for
  * joins by DIRTY-KEY recompute rather than the three-term delta algebra:
  * a refresh collects the join keys touched by the polled span (from both
  * the before and after images, so a key-changing update dirties old and
  * new key), recomputes the join restricted to those keys against
  * `stateAsOf(span end)` of BOTH tables — one consistent batch boundary —
  * and splices the result over the previous state (untouched keys carry
  * forward unread). Work per refresh is churn × join fan-out, never
  * state-sized; the splice's anti join is against the touched-key set,
  * which is broadcast-sized by construction.
  *
  * State rows are `jk` (the join key), `left_after`, `right_after` (the
  * two image maps); `joinType` may be inner (default), left_outer,
  * right_outer, or full_outer — dirty-key recompute carries a key's full
  * row set including null-extended rows, so every type maintains the same
  * way. Commit protocol and crash safety are [[StateLog]]'s
  * marker-then-cursor story, identical to [[MaintainedView]].
  *
  * Prerequisite: each side's join key must be extractable from its before
  * images too — i.e. the key columns are part of the replica identity
  * (always true when the join key IS the table's key; REPLICA IDENTITY
  * FULL works for any key). A truncate on either side falls back to a
  * full recompute at the span boundary.
  */
final class MaintainedJoin(
    lake: LakeSink,
    left: (String, String), right: (String, String),
    leftKey: Column => Column, rightKey: Column => Column,
    name: String, joinType: String = "inner") {

  require(Set("inner", "left_outer", "right_outer", "full_outer")(joinType),
    s"unsupported joinType '$joinType'")

  private val states = new StateLog(new Path(lake.root, s"_graft_joins/$name"))
  private def cursorName = s"join_$name"

  private def tableEvents(span: DataFrame, side: (String, String)): DataFrame =
    span.filter(col("schema") === side._1 && col("table") === side._2)

  /** Join keys a span's events could have added, changed, or removed on
    * one side: key extractor over before AND after images.
    */
  private def touchedKeys(span: DataFrame, side: (String, String),
      key: Column => Column): DataFrame =
    tableEvents(span, side)
      .select(explode(array(key(col("before")), key(col("after")))).as("jk"))
      .filter(col("jk").isNotNull).distinct()

  /** One side's current rows keyed for the join, at a batch boundary. */
  private def sideAsOf(spark: SparkSession, side: (String, String),
      key: Column => Column, asOf: Long, out: String): DataFrame =
    lake.stateAsOf(spark, side._1, side._2, asOf)
      .select(key(col("after")).as("jk"), col("after").as(out))
      .filter(col("jk").isNotNull)

  // dirty-key recompute is join-type agnostic: a recomputed key carries
  // its full row set for ANY join type, including null-extended rows
  private def joined(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, Seq("jk"), joinType)
      .select(col("jk"), col("left_after"), col("right_after"))

  /** Apply every newly committed lake batch to the join. Returns the
    * number of batches applied (0 = already current).
    */
  def refresh(spark: SparkSession): Int = {
    val from = lake.cursor(spark, cursorName)
    lake.poll(spark, cursorName) { span =>
      val f = states.fs(spark)
      val hi = span.agg(max(col("batch_id").cast("long"))).head().getLong(0)
      if (!states.isCommitted(f, hi)) {
        val lNew = sideAsOf(spark, left, leftKey, hi, "left_after")
        val rNew = sideAsOf(spark, right, rightKey, hi, "right_after")
        val truncated = !span.filter(col("op") === "truncate" &&
          (col("schema") === left._1 && col("table") === left._2 ||
            col("schema") === right._1 && col("table") === right._2)).isEmpty
        val next =
          if (truncated) joined(lNew, rNew) // rare: rebuild at the boundary
          else {
            val touched = touchedKeys(span, left, leftKey)
              .union(touchedKeys(span, right, rightKey)).distinct()
            val prev = states.committed(f).filter(_ <= from).lastOption
              .map(states.read(spark, _))
              .getOrElse(joined(lNew.limit(0), rNew.limit(0)))
            val recomputed = joined(
              lNew.join(touched, Seq("jk"), "left_semi"),
              rNew.join(touched, Seq("jk"), "left_semi"))
            prev.join(broadcast(touched), Seq("jk"), "left_anti")
              .unionByName(recomputed)
          }
        states.commit(f, next, hi)
      }
      states.gcBelow(f, from)
    }
  }

  /** Ops gauges for the `graft_lake_*` family — concatenate with the
    * sink's, like [[MaintainedView.gauges]].
    */
  def gauges(spark: SparkSession): Seq[(String, Double)] = {
    val asOf = states.committed(states.fs(spark)).lastOption
    val lag = lake.committedBatchIds(spark)
      .count(_ > lake.cursor(spark, cursorName))
    Seq(
      s"join_${name}_asof" -> asOf.getOrElse(-1L).toDouble,
      s"join_${name}_lag_batches" -> lag.toDouble)
  }

  /** The current join: `jk`, `left_after`, `right_after`. */
  def read(spark: SparkSession): DataFrame =
    states.committed(states.fs(spark)).lastOption
      .map(states.read(spark, _))
      .getOrElse {
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          graft.cdc.ChangeEvent.schema)
        joined(
          empty.select(leftKey(col("after")).as("jk"), col("after").as("left_after")),
          empty.select(rightKey(col("after")).as("jk"), col("after").as("right_after")))
      }
}
