package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental `count(DISTINCT value)` per group over the CDC envelope —
  * the one dashboard aggregate [[IncrementalAgg]] cannot maintain:
  * distinct counts are not retraction-maintainable from a per-group
  * scalar (removing one occurrence of a value says nothing about whether
  * OTHER rows still carry it). The classic construction is a per-
  * (group, value) REFCOUNT state: an insert bumps its (group, value)
  * refcount by 1, a delete decrements, an update is decrement(before) +
  * increment(after) — and the distinct count is simply the number of
  * positive refcounts in the group. Refcount arithmetic is exact under
  * any batch split or retraction order, so unlike min/max there is NO
  * dirty-group recompute path — the only full-recompute trigger is
  * `truncate`.
  *
  * NULL semantics follow SQL `count(DISTINCT …)`: NULL values never
  * count, so NULL-valued contributions are dropped before the refcount
  * state (a group whose rows are all NULL-valued simply has no state
  * rows and is absent from [[view]] — join with a coalesce-to-0 when
  * composing with [[IncrementalAgg.view]]).
  *
  * State cardinality is Σ|distinct values per group| — bigger than
  * [[IncrementalAgg]]'s group-cardinality state, but inherent to the
  * aggregate (any exact distinct count must remember the value set).
  * For persistence, [[graft.sinks.MaintainedDistinct]] puts these rows
  * in the same [[graft.sinks.BucketedStateLog]] the other maintainers
  * use, hash-bucketed on the group key, so refreshes stay
  * churn-proportional.
  *
  * Same prerequisite as [[IncrementalAgg]]: retractions need the full
  * old image (REPLICA IDENTITY FULL); a retraction without its before
  * image fails the batch loudly rather than drifting the count.
  *
  * 100-TB shape: [[delta]] is one map-side-combinable groupBy over a
  * micro-batch; [[step]]'s merge is a join between the delta and state
  * on (group, value) — and a bucketed maintainer restricts the state
  * side to the touched buckets. No unbounded driver pulls anywhere.
  *
  * @param group image-map extractors for the group-by columns
  * @param name  measure name — [[view]] renders `nd_<name>`
  * @param value image-map extractor for the counted value
  */
final class IncrementalDistinct(
    group: Seq[(String, Column => Column)],
    name: String,
    value: Column => Column) {

  require(group.nonEmpty, "at least one group column")
  // the refcount state reserves these two column names; a group column
  // sharing one would collide in delta's groupBy and mis-key the merge
  require(!group.exists(g => g._1 == "v" || g._1 == "rc"),
    "group column names 'v' and 'rc' are reserved for the refcount state")

  /** Group column names, in declaration order (state partitioning keys
    * for bucketed persistence).
    */
  def groupCols: Seq[String] = group.map(_._1)

  /** Per-(group, value) signed refcount delta of one envelope
    * micro-batch. Zero-net rows (an update that keeps the value, or an
    * intra-batch insert+delete pair) are dropped — they cannot change
    * state.
    */
  def delta(envelope: DataFrame): DataFrame = {
    val checkedBefore: Column =
      when(col("before").isNull, raise_error(concat(
        lit("IncrementalDistinct: "), col("op"),
        lit(" event carries no before image — the source table needs " +
          "REPLICA IDENTITY FULL for incremental maintenance"))))
        .otherwise(col("before"))
    envelope
      .filter(col("op").isin("insert", "update", "delete"))
      .select(explode(
        when(col("op") === "insert",
          array(struct(lit(1).as("sgn"), col("after").as("img"))))
        .when(col("op") === "delete",
          array(struct(lit(-1).as("sgn"), checkedBefore.as("img"))))
        .otherwise(
          array(struct(lit(-1).as("sgn"), checkedBefore.as("img")),
            struct(lit(1).as("sgn"), col("after").as("img"))))).as("c"))
      .select(col("c.sgn").as("sgn"), col("c.img").as("img"))
      // SQL count(DISTINCT) ignores NULLs — they never enter the state
      .filter(value(col("img")).isNotNull)
      .groupBy(group.map { case (nm, ex) => ex(col("img")).as(nm) } :+
        value(col("img")).as("v"): _*)
      .agg(sum(col("sgn")).cast("long").as("rc_d"))
      .filter(col("rc_d") =!= 0)
  }

  /** Empty state with the right schema (run before the first [[step]]). */
  def init(spark: SparkSession): DataFrame = {
    val emptyEnv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.cdc.ChangeEvent.schema)
    recomputeAll(emptyEnv.select(col("after")))
  }

  /** Advance state by one micro-batch. `current` (the table's full image
    * rows) is only evaluated after a `truncate` — refcounts need no
    * dirty recompute.
    */
  def step(state: DataFrame, envelope: DataFrame, current: => DataFrame): DataFrame = {
    val hasTruncate = !envelope.filter(col("op") === "truncate").isEmpty
    if (hasTruncate) return recomputeAll(current)
    // materialize here (bounded by state ∪ delta cardinality) so reads
    // don't re-run the merge and lineage doesn't chain across steps; the
    // maintainer seam below skips this — its caller writes the merged
    // frame straight to the state log, one pass, no extra job
    stepMerge(state, delta(envelope)).localCheckpoint()
  }

  /** [[step]] with a PRECOMPUTED delta and no truncate handling — the
    * seam bucketed maintainers use (they derive touched buckets from
    * the delta's group keys and hand in only those buckets' state rows;
    * every (group, value) the delta mentions is inside them by
    * construction).
    */
  private[graft] def stepMerge(state: DataFrame, d: DataFrame): DataFrame = {
    val s = state.alias("s")
    val dd = d.alias("d")
    val keys = groupCols :+ "v"
    val joinCond = keys.map(nm => col(s"s.$nm") <=> col(s"d.$nm")).reduce(_ && _)
    val rcNew = coalesce(col("s.rc"), lit(0L)) + coalesce(col("d.rc_d"), lit(0L))
    val rcChecked = when(rcNew < 0, raise_error(
      lit("IncrementalDistinct: negative refcount — a retraction arrived " +
        "for a value never added (feed is not a consistent changelog)")))
      .otherwise(rcNew)
    // LAZY on purpose: [[graft.sinks.MaintainedDistinct]] writes this
    // frame straight into the bucketed state log, so a checkpoint here
    // would materialize every merge twice ([[step]] adds one for the
    // in-memory chaining case)
    s.join(dd, joinCond, "full_outer")
      .select(keys.map(nm =>
        coalesce(col(s"s.$nm"), col(s"d.$nm")).as(nm)) :+ rcChecked.as("rc"): _*)
      .filter(col("rc") > 0)
  }

  /** The user-facing view: group columns plus `nd_<name>` — the number
    * of distinct non-null values per group. Groups whose rows are all
    * NULL-valued are absent (count 0).
    */
  def view(state: DataFrame): DataFrame =
    state.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(s"nd_$name"))

  /** Second view over the SAME refcount state at zero extra maintenance
    * cost: the top-k most frequent values per group (`<name>` + `freq` +
    * `rank`; refcount desc, value asc tiebreak, so the result is
    * deterministic). Exact under retraction — the classic hard case for
    * streaming top-k (an evicted heavy hitter must let the next-heaviest
    * value surface, which sketch-based top-k cannot do) — because the
    * state holds the full surviving (group, value) multiset.
    *
    * 100-TB shape: one window shuffle on the group key over
    * group-cardinality × values state rows; a bucketed maintainer's
    * state is already hash-partitioned on the group key, so the read
    * stays state-proportional, never table-proportional.
    */
  def viewTopK(state: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("rc").desc, col("v").asc)
    state.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(groupCols.map(col) ++
        Seq(col("v").as(name), col("rc").as("freq"), col("rank")): _*)
  }

  /** Full refcount state of image rows (an `after` map column). */
  private[graft] def recomputeAll(current: DataFrame): DataFrame = {
    val imgs = current.select(col("after"))
    imgs.filter(value(col("after")).isNotNull)
      .groupBy(group.map { case (nm, ex) => ex(col("after")).as(nm) } :+
        value(col("after")).as("v"): _*)
      .agg(count(lit(1)).cast("long").as("rc"))
  }
}
