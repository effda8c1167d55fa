package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) over the CDC envelope: keep a grouped
  * aggregate (count / sum / min / max) continuously up to date from change
  * batches WITHOUT refolding or rescanning the table — the classic
  * self-maintainable-view construction applied to the pgcdc feed (the
  * reference hands changes to user callbacks, `example/postgresql/main.go:
  * 43-51`; maintaining an aggregate from them is the first thing a real
  * consumer builds).
  *
  * Delta semantics: an `insert` contributes its `after` image with weight
  * +1, a `delete` retracts its `before` image with weight −1, and an
  * `update` is retract(before) + insert(after). Counts and sums are
  * self-maintainable — the per-batch signed aggregate merges into state
  * with pure arithmetic. Min/max are NOT self-maintainable under
  * retraction: when a batch retracts a value at-or-beyond a group's
  * current extreme (or touches a group state has never seen), that group
  * is DIRTY and is recomputed from the caller-supplied current-state
  * frame, bounded to exactly the dirty groups (a semi join, never a full
  * rescan). A `truncate` in the batch resets everything and recomputes
  * from current state.
  *
  * Update/delete retraction needs the FULL old image, i.e. REPLICA
  * IDENTITY FULL on the source table (the reference surfaces identities
  * the same way, `pq/replication.go` identity queries); a retraction row
  * with no `before` image fails the batch loudly (`raise_error`) rather
  * than drifting the aggregate.
  *
  * 100-TB shape: `delta` is one map-side-combinable groupBy over a single
  * micro-batch; `step`'s merge is a join on the group key between two
  * group-cardinality frames (broadcast-sized in practice); the dirty
  * recompute reads only the dirty groups' rows from current state. Persist
  * the returned state (checkpoint / write) between steps so plans don't
  * chain across batches.
  *
  * @param group image-map extractors for the group-by columns
  * @param sums  extractors for summed measures (must cast to a numeric)
  * @param mins  extractors for min-maintained measures
  * @param maxs  extractors for max-maintained measures
  */
final class IncrementalAgg(
    group: Seq[(String, Column => Column)],
    sums: Seq[(String, Column => Column)],
    mins: Seq[(String, Column => Column)] = Nil,
    maxs: Seq[(String, Column => Column)] = Nil) {

  require(group.nonEmpty, "at least one group column")

  /** Per-group signed delta of one envelope micro-batch (one table's
    * rows). Sums carry a non-null count alongside so SQL's "sum of no
    * non-null values is NULL" survives maintenance; min/max carry the
    * batch's inserted and retracted extremes separately (the retracted
    * side drives dirty-group detection in [[step]]).
    */
  def delta(envelope: DataFrame): DataFrame = {
    // a retraction without its old image cannot be applied — REPLICA
    // IDENTITY FULL is a prerequisite, enforced in the dataflow
    val checkedBefore: Column =
      when(col("before").isNull, raise_error(concat(
        lit("IncrementalAgg: "), col("op"),
        lit(" event carries no before image — the source table needs " +
          "REPLICA IDENTITY FULL for incremental maintenance"))))
        .otherwise(col("before"))
    val contrib = envelope
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
    val aggs: Seq[Column] =
      Seq(sum(col("sgn")).cast("long").as("n_d")) ++
      sums.flatMap { case (nm, ex) => Seq(
        sum(col("sgn") * ex(col("img"))).as(s"s_${nm}_d"),
        sum(when(ex(col("img")).isNotNull, col("sgn")).otherwise(lit(0)))
          .cast("long").as(s"c_${nm}_d")) } ++
      mins.flatMap { case (nm, ex) => Seq(
        min(when(col("sgn") > 0, ex(col("img")))).as(s"ins_min_$nm"),
        min(when(col("sgn") < 0, ex(col("img")))).as(s"del_min_$nm")) } ++
      maxs.flatMap { case (nm, ex) => Seq(
        max(when(col("sgn") > 0, ex(col("img")))).as(s"ins_max_$nm"),
        max(when(col("sgn") < 0, ex(col("img")))).as(s"del_max_$nm")) }
    contrib
      .groupBy(group.map { case (nm, ex) => ex(col("img")).as(nm) }: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Empty state with the right schema (run before the first [[step]]). */
  def init(spark: SparkSession): DataFrame = {
    val emptyEnv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.cdc.ChangeEvent.schema)
    recomputeAll(emptyEnv.select(col("after")))
  }

  /** Advance state by one micro-batch. `current` is the table's CURRENT
    * full state as image rows (an `after` map column — e.g.
    * `LakeSink.latestState` taken AFTER the batch landed); it is only
    * read for dirty groups (min/max retraction at the extreme) and after
    * a truncate, and never otherwise evaluated.
    */
  def step(state: DataFrame, envelope: DataFrame, current: => DataFrame): DataFrame = {
    val hasTruncate = !envelope.filter(col("op") === "truncate").isEmpty
    if (hasTruncate) return recomputeAll(current)
    stepMerge(state, delta(envelope), current)
  }

  /** Group column names, in declaration order (state partitioning keys
    * for bucketed persistence).
    */
  def groupCols: Seq[String] = group.map(_._1)

  /** Group extractors, in declaration order — the span-validation and
    * fold-restriction hooks for maintainers that prune dirty-group
    * recomputes by a group column ([[graft.sinks.MaintainedView]]
    * `groupIsImmutable`).
    */
  private[graft] def groupExprs: Seq[Column => Column] = group.map(_._2)

  /** [[step]] with a PRECOMPUTED delta and no truncate handling — the
    * seam bucketed maintainers use: they compute the delta first, derive
    * the touched buckets from its group keys, and hand in only those
    * buckets' state rows (every group the delta mentions is in the
    * subset by construction, so the merge and the negative-count check
    * see exactly the rows they need).
    */
  private[graft] def stepMerge(
      state: DataFrame, d: DataFrame, current: => DataFrame): DataFrame =
    stepMergeWith(state, d, dirtyKeys => {
      // default recompute source: the dirty groups' rows semi-joined out
      // of the FULL current state
      val cur = current.alias("c")
      val dk = dirtyKeys.alias("k")
      val semiCond = group.map { case (nm, ex) =>
        ex(col("c.after")) <=> col(s"k.$nm") }.reduce(_ && _)
      cur.join(dk, semiCond, "left_semi").select(col("after"))
    })

  /** [[stepMerge]] with a caller-supplied recompute source: `imagesFor`
    * receives the dirty group keys (group-cardinality, one column per
    * group col) and must return exactly those groups' image rows (an
    * `after` column). Lets a caller whose group key can be pushed into
    * its store (e.g. a key-restricted lake fold) avoid materializing the
    * whole current state for a handful of dirty groups.
    */
  private[graft] def stepMergeWith(
      state: DataFrame, d: DataFrame,
      imagesFor: DataFrame => DataFrame): DataFrame = {
    val spark = state.sparkSession
    val s = state.alias("s")
    val dd = d.alias("d")
    val joinCond = group.map { case (nm, _) =>
      col(s"s.$nm") <=> col(s"d.$nm") }.reduce(_ && _)
    val merged = s.join(dd, joinCond, "full_outer")

    val g = group.map { case (nm, _) =>
      coalesce(col(s"s.$nm"), col(s"d.$nm")).as(nm) }
    val inState = col("s.n").isNotNull
    val nNew = coalesce(col("s.n"), lit(0L)) + coalesce(col("d.n_d"), lit(0L))
    // sum merge is TYPE-PRESERVING: no double-typed zero literal in the
    // arithmetic, so a DecimalType extractor's sum stays decimal-exact
    // across arbitrarily long maintenance horizons (a double accumulator
    // would drift); the null/null case needs no zero — c_ stays 0 and the
    // view masks the sum to NULL per SQL
    val sumCols = sums.flatMap { case (nm, _) =>
      val sSum = col(s"s.s_$nm")
      val dSum = col(s"d.s_${nm}_d")
      // cast back to the STATE's own column type: decimal arithmetic
      // widens precision (28,2 + delta → 38,2), and persisted state must
      // be a schema fixed point across refreshes or a schema-pinned
      // reader of an earlier version rejects the file
      val tpe = state.schema(s"s_$nm").dataType
      Seq(
        when(sSum.isNull, dSum).when(dSum.isNull, sSum)
          .otherwise(sSum + dSum).cast(tpe).as(s"s_$nm"),
        (coalesce(col(s"s.c_$nm"), lit(0L)) + coalesce(col(s"d.c_${nm}_d"), lit(0L)))
          .as(s"c_$nm")) }
    // a group is dirty when a retraction could have removed its stored
    // extreme — or when retractions hit a group state has no row for
    // (intra-batch insert+delete pairing is lost in the aggregated delta)
    val dirtyMin = mins.map { case (nm, _) =>
      col(s"d.del_min_$nm").isNotNull &&
        (!inState || col(s"s.min_$nm").isNull ||
          col(s"d.del_min_$nm") <= col(s"s.min_$nm")) }
    val dirtyMax = maxs.map { case (nm, _) =>
      col(s"d.del_max_$nm").isNotNull &&
        (!inState || col(s"s.max_$nm").isNull ||
          col(s"d.del_max_$nm") >= col(s"s.max_$nm")) }
    val dirty = (dirtyMin ++ dirtyMax).foldLeft(lit(false))(_ || _).as("_dirty")
    val minCols = mins.map { case (nm, _) =>
      least(col(s"s.min_$nm"), col(s"d.ins_min_$nm")).as(s"min_$nm") }
    val maxCols = maxs.map { case (nm, _) =>
      greatest(col(s"s.max_$nm"), col(s"d.ins_max_$nm")).as(s"max_$nm") }

    val nChecked = when(nNew < 0, raise_error(
      lit("IncrementalAgg: negative group count — a retraction arrived " +
        "for rows never added (feed is not a consistent changelog)")))
      .otherwise(nNew).as("n")
    // materialize the merged state (group cardinality — small) so the
    // dirty-group probe below and the caller's reads don't re-run the
    // delta+join, and so state lineage doesn't chain across steps.
    // LAZY (r22): the dirty probe (or the caller's first action) is the
    // materializing job — the eager form spent a dedicated per-step job
    // on a group-cardinality frame, and q_ivm's fold is job-latency-bound
    // (28 single-task jobs)
    val stepped = merged
      .select(g ++ Seq(nChecked) ++ sumCols ++ minCols ++ maxCols :+ dirty: _*)
      .filter(col("n") =!= 0)
      .localCheckpoint(eager = false)

    if (mins.isEmpty && maxs.isEmpty) stepped.drop("_dirty")
    else {
      val dirtyKeys = stepped.filter(col("_dirty"))
        .select(group.map { case (nm, _) => col(nm) }: _*)
      // the recompute source must stay untouched unless something is
      // actually dirty — this is one small action over a
      // group-cardinality frame
      if (dirtyKeys.isEmpty) stepped.drop("_dirty")
      else {
        val clean = stepped.filter(!col("_dirty")).drop("_dirty")
        // bounded recompute: only the dirty groups' image rows
        val recomputed = aggregateImages(imagesFor(dirtyKeys))
        clean.unionByName(recomputed)
      }
    }
  }

  /** Render the user-facing view of a state frame: group columns, `n`,
    * `sum_<m>` (NULL when the group holds no non-null values, per SQL),
    * `min_<m>` / `max_<m>`.
    */
  def view(state: DataFrame): DataFrame =
    state.select(
      group.map { case (nm, _) => col(nm) } ++
      Seq(col("n")) ++
      sums.map { case (nm, _) =>
        when(col(s"c_$nm") > 0, col(s"s_$nm")).as(s"sum_$nm") } ++
      mins.map { case (nm, _) => col(s"min_$nm") } ++
      maxs.map { case (nm, _) => col(s"max_$nm") }: _*)

  /** Full aggregate of image rows (an `after` map column) in state shape. */
  private def aggregateImages(images: DataFrame): DataFrame = {
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
      sums.flatMap { case (nm, ex) => Seq(
        // keep the extractor's own type (decimal stays decimal); a group
        // of all-null measures recomputes to NULL with c_ = 0, exactly
        // the state the delta path maintains
        sum(ex(col("after"))).as(s"s_$nm"),
        count(ex(col("after"))).as(s"c_$nm")) } ++
      mins.map { case (nm, ex) => min(ex(col("after"))).as(s"min_$nm") } ++
      maxs.map { case (nm, ex) => max(ex(col("after"))).as(s"max_$nm") }
    images
      .groupBy(group.map { case (nm, ex) => ex(col("after")).as(nm) }: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  private[graft] def recomputeAll(current: DataFrame): DataFrame =
    aggregateImages(current.select(col("after")))
}
