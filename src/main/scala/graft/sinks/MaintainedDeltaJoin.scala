package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A continuously-maintained INNER equi-join whose refresh cost is
  * DELTA-proportional — the signed-delta sibling of [[MaintainedJoin]]'s
  * per-key splice. The splice recomputes every touched join key's whole
  * row set, which is the right call for outer joins and modest keys but
  * makes a HOT KEY (a skewed FK with millions of fact rows) cost O(that
  * key's rows) whenever one of them churns. This maintainer applies the
  * classical incremental-join algebra instead:
  *
  *   Δout = ΔL ⋈ R_new  +  L_new ⋈ ΔR  −  ΔL ⋈ ΔR
  *
  * (the NEW-state form — algebraically equal to the textbook
  * ΔL⋈R_old + L_old⋈ΔR + ΔL⋈ΔR, but it reads each side's fold at the
  * interval this refresh APPLIES, the same `stateAsOf(key._2, key._1)`
  * read every other maintainer pins, so no as-of-PREV retention
  * problem). Each side's span delta telescopes per (row key, image):
  * an event contributes −before and/or +after, and summing signs
  * cancels intermediate versions — so Δout is churn-sized, the merge
  * input is Δout-sized, and with `subBuckets > 1` the hot key's pairs
  * spread across sub-slices so even its REWRITE is dirty-slice-bounded.
  * A JOIN-KEY-CHANGING update needs no flag or validation here: its
  * −before retracts under the old jk and its +after inserts under the
  * new one, by construction.
  *
  * State: one row per surviving pair — (jk, left row key, right row
  * key, image hashes, both images, refcount) — hash-bucketed on jk and
  * sub-sliced on the pair identity. Pair identity includes sha2-256
  * hashes of the CANONICAL image encodings (sorted map entries), so a
  * retraction matches exactly the stored version it removes; a
  * retraction that matches nothing drives a refcount negative and fails
  * loud (the feed was not a consistent changelog).
  *
  * Prerequisites: REPLICA IDENTITY FULL on both sides (updates/deletes
  * must carry full before images — validated per span, fail-loud), and
  * the engine's TOAST restoration upstream (lake envelopes carry
  * restored full images, so −before and the prior +after encode
  * identically). Keyless (REPLICA IDENTITY NOTHING) tables join
  * append-only, like the lake fold — an update/delete of a keyless row
  * trips the refcount check. INNER join only; outer joins stay on
  * [[MaintainedJoin]].
  *
  * `*KeyIsRowKey` flags are a READ-cost tier exactly as on the splice
  * join: a side whose join key IS its single-column replica key fetches
  * the other side's matches through the KEY-RESTRICTED fold
  * (BASE-bucket-pruned); otherwise the side folds whole and semi-joins.
  * They are optional here — correctness never depends on them.
  */
final class MaintainedDeltaJoin(
    lake: LakeSink,
    left: (String, String), right: (String, String),
    leftKey: Column => Column, rightKey: Column => Column,
    name: String,
    stateBuckets: Int = 16,
    subBuckets: Int = 1,
    leftKeyIsRowKey: Boolean = false,
    rightKeyIsRowKey: Boolean = false,
    /** Set when a side's join key is NOT its row key but IS immutable
      * per row (the FK side of a fact-dimension join): the side's
      * L_new/R_new fold input prunes to the other side's delta jks via
      * `stateAsOf(restrictToImmutable)` — the read becomes
      * delta-proportional instead of table-proportional. Validated per
      * span via [[ImmutableContract]], which ALSO means a declared-
      * immutable side gives up the delta join's native tolerance of
      * join-key-changing updates (the restricted fold's
      * stays-or-goes-together soundness needs the immutability); leave
      * the flags off where keys genuinely move. Requires `*KeyCol` (the
      * image-map column name) for delete-image validation, exactly like
      * [[MaintainedJoin]]'s flags. Ignored when `*KeyIsRowKey` is set.
      */
    leftKeyImmutable: Boolean = false,
    rightKeyImmutable: Boolean = false,
    leftKeyCol: Option[String] = None,
    rightKeyCol: Option[String] = None) extends Maintainer {

  require(!leftKeyImmutable || leftKeyIsRowKey || leftKeyCol.nonEmpty,
    "leftKeyImmutable requires leftKeyCol (the image-map column name)")
  require(!rightKeyImmutable || rightKeyIsRowKey || rightKeyCol.nonEmpty,
    "rightKeyImmutable requires rightKeyCol (the image-map column name)")

  // OWN namespace: sharing MaintainedJoin's _graft_joins/ would let a
  // delta join and a splice join with one name silently share a state
  // log (the delta's first refresh would isCommitted-skip its seed and
  // serve the splice's 3-column state through this schema)
  private val stateDir = new Path(lake.root, s"_graft_djoins/$name")
  private val states = new BucketedStateLog(stateDir, stateBuckets,
    Seq("jk"), subBuckets, Seq("lk", "rk"))
  private val ops = new MaintainerOps("djoin", name)
  private def cursorName = s"djoin_$name"

  override def stateId: String = s"${lake.root}#$cursorName"

  // ---- expressions ------------------------------------------------------

  /** sha2-256 of the canonical image encoding (entries sorted by key) —
    * the equality a retraction needs: same map content, same hash,
    * whatever entry order the engine materialized.
    */
  private def imgHash(img: Column): Column =
    sha2(to_json(array_sort(map_entries(img))), 256)

  /** The side's fold row key, spelled EXACTLY like the lake's
    * (`keyedEvents`): replica-identity values joined by the key
    * separator; keyless rows get the synthetic WAL-position key.
    */
  private def rowKeyOf(img: Column): Column =
    coalesce(
      when(size(col("key_names")) > 0,
        array_join(transform(col("key_names"),
          k => coalesce(element_at(img, k), lit(""))), LakeSink.KeySep)),
      concat(lit("wal" + LakeSink.KeySep),
        col("commit_lsn"), lit("/"), col("lsn")))

  // ---- deltas and folds -------------------------------------------------

  /** One side's telescoped span delta: (jk, k, h, img, s) with s = ±1 —
    * an event contributes −before and/or +after, and summing signs per
    * (row key, image hash) cancels intermediate versions within the
    * span. NULL join keys drop (inner join; they can never pair).
    */
  private def sideDelta(span: DataFrame, side: (String, String),
      key: Column => Column): DataFrame = {
    val events = span.filter(
      col("schema") === side._1 && col("table") === side._2 &&
        col("op").isin("insert", "update", "delete"))
    val minus = events.filter(col("op").isin("update", "delete"))
      .select(col("key_names"), col("commit_lsn"), col("lsn"),
        col("before").as("img"), lit(-1L).as("s"))
    val plus = events.filter(col("op").isin("insert", "update"))
      .select(col("key_names"), col("commit_lsn"), col("lsn"),
        col("after").as("img"), lit(1L).as("s"))
    minus.unionByName(plus)
      .select(key(col("img")).cast("string").as("jk"),
        rowKeyOf(col("img")).as("k"), imgHash(col("img")).as("h"),
        col("img"), col("s"))
      .filter(col("jk").isNotNull)
      .groupBy("jk", "k", "h")
      .agg(first(col("img"), ignoreNulls = true).as("img"),
        sum(col("s")).as("s"))
      .filter(col("s") =!= 0L)
  }

  /** One side's current rows at the applied interval: (jk, k, h, img) —
    * optionally KEY-RESTRICTED to a jk frame when the side's join key
    * IS its replica key (the BASE-pruned read); otherwise a full fold
    * semi-joined on jk.
    */
  private def sideAsOf(spark: SparkSession, side: (String, String),
      key: Column => Column, asOf: Long, floor: Long, isRowKey: Boolean,
      isImmutable: Boolean, jks: Option[DataFrame]): DataFrame = {
    def ks = jks.map(_.select(col("jk").cast("string").as("k")).distinct())
    // restriction strength order, as on the splice join: row-key
    // (prunes BASE buckets too) > declared-immutable (prunes the fold
    // INPUT, scans BASE whole) > none (full fold, semi-joined after)
    val restrict = if (isRowKey) ks else None
    val restrictImm = if (!isRowKey && isImmutable) ks else None
    val folded = lake.stateAsOf(spark, side._1, side._2, asOf, floor,
        restrictToKeys = restrict,
        restrictToImmutable = restrictImm.map(f => ((key, f))))
      .select(key(col("after")).cast("string").as("jk"), col("k"),
        imgHash(col("after")).as("h"), col("after").as("img"))
      .filter(col("jk").isNotNull)
    (restrict.orElse(restrictImm), jks) match {
      case (Some(_), _) => folded // already exactly the jk set
      case (None, Some(frame)) =>
        folded.join(broadcast(frame.select(col("jk")).distinct()),
          Seq("jk"), "left_semi")
      case _ => folded
    }
  }

  /** Pair frame columns from a (left rows) × (right rows) join on jk,
    * with the given sign expression.
    */
  private def paired(l: DataFrame, r: DataFrame, sign: Column): DataFrame =
    l.alias("l").join(r.alias("r"), Seq("jk"))
      .select(col("jk"),
        col("l.k").as("lk"), col("r.k").as("rk"),
        col("l.h").as("lh"), col("r.h").as("rh"),
        col("l.img").as("left_after"), col("r.img").as("right_after"),
        sign.as("dn"))

  private[sinks] val stateSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("jk", StringType), StructField("lk", StringType),
      StructField("rk", StringType), StructField("lh", StringType),
      StructField("rh", StringType),
      StructField("left_after", MapType(StringType, StringType)),
      StructField("right_after", MapType(StringType, StringType)),
      StructField("n", LongType, nullable = false)))
  }

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)

  /** Signed merge of a pair delta into the state: full-outer on the
    * pair identity, refcounts summed, negatives fail loud (a retraction
    * for a pair never produced — an inconsistent feed or a violated
    * image contract).
    */
  private def merged(state: DataFrame, d: DataFrame): DataFrame = {
    val s = state.alias("s")
    val dd = d.alias("d")
    val ids = Seq("jk", "lk", "rk", "lh", "rh")
    val cond = ids.map(c => col(s"s.$c") <=> col(s"d.$c")).reduce(_ && _)
    val n2 = coalesce(col("s.n"), lit(0L)) + coalesce(col("d.dn"), lit(0L))
    // SYMMETRIC guard: a pair is unique by construction ((jk, row keys,
    // image hashes); the cross term nets same-span double counts to 1),
    // so n > 1 is as inconsistent as n < 0 — a re-delivered insert for a
    // live row would otherwise serve a phantom pair forever, silently
    val checked = when(n2 < 0 || n2 > 1, raise_error(
      concat(lit("MaintainedDeltaJoin: pair refcount "), n2,
        lit(" — a retraction for a pair never added, or a re-added " +
          "live pair (inconsistent changelog, or images not REPLICA " +
          "IDENTITY FULL / TOAST-restored)"))))
      .otherwise(n2)
    s.join(dd, cond, "full_outer")
      .select(ids.map(c => coalesce(col(s"s.$c"), col(s"d.$c")).as(c)) ++ Seq(
        coalesce(col("s.left_after"), col("d.left_after")).as("left_after"),
        coalesce(col("s.right_after"), col("d.right_after")).as("right_after"),
        checked.as("n")): _*)
      .filter(col("n") > 0)
  }

  // ---- refresh ----------------------------------------------------------

  /** Apply every newly committed lake batch (bounded to `within` under a
    * [[Maintainer.refreshCoherent]] barrier). Returns batches applied.
    */
  override def refresh(spark: SparkSession,
      within: Option[(Long, Long)] = None): Int = {
    val t0 = System.nanoTime
    val n = refreshSpans(spark, within)
    ops.recordRefresh((System.nanoTime - t0) / 1e6, n)
    n
  }

  private def refreshSpans(spark: SparkSession,
      within: Option[(Long, Long)]): Int = {
    val from = lake.cursorInterval(spark, cursorName)
    lake.poll(spark, cursorName, within) { span =>
      val f = states.fs(spark)
      def isSide(s: (String, String)) =
        col("schema") === s._1 && col("table") === s._2
      val onSides = isSide(left) || isSide(right)
      // one span pass: bounds, truncate, the REPLICA IDENTITY FULL
      // contract (an update/delete without a before image cannot
      // retract its old pairs — fail loud, never corrupt), and the
      // row-key flags' contract (MaintainedJoin's badRowKey: the flag
      // requires a single-column identity whose value IS what the
      // extractor reads — a wrong flag would silently restrict the
      // fold away from real matches)
      def badRowKey(s: (String, String), key: Column => Column, on: Boolean) =
        if (!on) lit(false) else RowKeyContract.violation(isSide(s), key)
      def badImmutable(s: (String, String), key: Column => Column,
          keyCol: Option[String], on: Boolean) =
        if (!on) lit(false)
        else ImmutableContract.violation(isSide(s), key, keyCol.get)
      val bounds = span.agg(
        min(col("batch_id").cast("long")), max(col("batch_id").cast("long")),
        max(when(onSides && col("op") === "truncate", 1).otherwise(0)),
        max(when(onSides && col("op").isin("update", "delete") &&
          col("before").isNull, 1).otherwise(0)),
        max(when(onSides && col("op") === "update" &&
          col("after").isNull, 1).otherwise(0)),
        sum(when(onSides, 1L).otherwise(0L)),
        max(when(badRowKey(left, leftKey, leftKeyIsRowKey), 1).otherwise(0)),
        max(when(badRowKey(right, rightKey, rightKeyIsRowKey), 1).otherwise(0)),
        max(when(badImmutable(left, leftKey, leftKeyCol,
          leftKeyImmutable && !leftKeyIsRowKey), 1).otherwise(0)),
        max(when(badImmutable(right, rightKey, rightKeyCol,
          rightKeyImmutable && !rightKeyIsRowKey), 1).otherwise(0))
      ).head()
      def rowKeyViolation(side: (String, String)) = new IllegalStateException(
        s"MaintainedDeltaJoin('$name'): KeyIsRowKey is set for " +
          s"${side._1}.${side._2} but the span carries events whose " +
          "key_names are not exactly the single join-key column extracted " +
          "verbatim — the restricted fold keys on the replica identity")
      if (!bounds.isNullAt(0) && bounds.getInt(6) == 1)
        throw rowKeyViolation(left)
      if (!bounds.isNullAt(0) && bounds.getInt(7) == 1)
        throw rowKeyViolation(right)
      def immutableViolation(side: (String, String)) = new IllegalStateException(
        s"MaintainedDeltaJoin('$name'): KeyImmutable is set for " +
          s"${side._1}.${side._2} but the span carries a key-changing " +
          "update, a column-less delete/update image, or a declared " +
          "*KeyCol that does not match the extractor — the restricted " +
          "fold could resurrect stale versions; drop the flag if this " +
          "side's join key legitimately moves")
      if (leftKeyImmutable && !leftKeyIsRowKey && !bounds.isNullAt(0) &&
          bounds.getInt(8) == 1) throw immutableViolation(left)
      if (rightKeyImmutable && !rightKeyIsRowKey && !bounds.isNullAt(0) &&
          bounds.getInt(9) == 1) throw immutableViolation(right)
      if (!bounds.isNullAt(0) && bounds.getInt(3) == 1)
        throw new IllegalStateException(
          s"MaintainedDeltaJoin('$name'): an update/delete on " +
            s"${left._1}.${left._2} or ${right._1}.${right._2} carries no " +
            "before image — REPLICA IDENTITY FULL is required (the " +
            "retraction is computed from the old image)")
      if (!bounds.isNullAt(0) && bounds.getInt(4) == 1)
        throw new IllegalStateException(
          s"MaintainedDeltaJoin('$name'): an update carries no after " +
            "image — the envelope is not the lake's insert/update/delete " +
            "shape this maintainer consumes")
      if (!bounds.isNullAt(0)) {
        val spanRows = bounds.getLong(5)
        val key = (math.min(from._1, bounds.getLong(0)),
          math.max(from._2, bounds.getLong(1)))
        if (!states.isCommitted(f, key)) {
          val prevKey = states.latestWithin(f, from)
          val truncated = bounds.getInt(2) == 1
          if (truncated || prevKey.isEmpty) {
            // SEED / truncate: full join of both sides through BASE
            // (a compacted+vacuumed lake holds rows no surviving
            // changelog row mentions — the delta path cannot see them)
            val l = sideAsOf(spark, left, leftKey, key._2, key._1,
              isRowKey = false, isImmutable = false, jks = None)
            val r = sideAsOf(spark, right, rightKey, key._2, key._1,
              isRowKey = false, isImmutable = false, jks = None)
            states.commit(f, paired(l, r, lit(1L)).withColumnRenamed("dn", "n"),
              (0 until stateBuckets).toSet, None, key)
            ops.recordSpan(spanRows, spanRows, stateBuckets * subBuckets, 0)
          } else {
            val dl = sideDelta(span, left, leftKey).localCheckpoint()
            val dr = sideDelta(span, right, rightKey).localCheckpoint()
            // empty-delta short-circuits: a span churning only one side
            // must not pay the OTHER side's fold for guaranteed-empty
            // terms (driver-side isEmpty on the checkpointed deltas)
            val dlEmpty = dl.isEmpty
            val drEmpty = dr.isEmpty
            // Δout = ΔL ⋈ R_new + L_new ⋈ ΔR − ΔL ⋈ ΔR, all signed; the
            // cross term subtracts because both one-sided terms read the
            // NEW folds (each already contains the other side's delta)
            def part1 =
              if (dlEmpty) Seq.empty
              else Seq(paired(dl, sideAsOf(spark, right, rightKey, key._2,
                key._1, rightKeyIsRowKey, rightKeyImmutable,
                Some(dl.select("jk"))), col("l.s")))
            def part2 =
              if (drEmpty) Seq.empty
              else Seq(paired(sideAsOf(spark, left, leftKey, key._2, key._1,
                leftKeyIsRowKey, leftKeyImmutable, Some(dr.select("jk"))),
                dr, col("r.s")))
            def part3 =
              if (dlEmpty || drEmpty) Seq.empty
              else Seq(paired(dl, dr, -col("l.s") * col("r.s")))
            val parts = part1 ++ part2 ++ part3
            val d = (if (parts.isEmpty) paired(dl, dr, lit(0L)) // empty frame
              else parts.reduce(_ unionByName _))
              .groupBy("jk", "lk", "rk", "lh", "rh")
              .agg(first(col("left_after"), ignoreNulls = true).as("left_after"),
                first(col("right_after"), ignoreNulls = true).as("right_after"),
                sum(col("dn")).as("dn"))
              .filter(col("dn") =!= 0L)
              .localCheckpoint()
            // bounded planning pull: ≤ stateBuckets × subBuckets rows
            val perSlice = d.groupBy(
                states.bucketExpr(Seq(col("jk"))).as("b"),
                states.subExpr.as("s"))
              .count().collect()
            val dirty = perSlice.map(r => (r.getInt(0), r.getInt(1))).toSet
            val deltaPairs = perSlice.map(_.getLong(2)).sum
            if (dirty.isEmpty) {
              states.commit(f, emptyState(spark), Set.empty, prevKey, key)
              ops.recordSpan(spanRows, 0, 0, stateBuckets * subBuckets)
            } else {
              val prevTouched = states.readSlices(spark, prevKey.get, dirty,
                stateSchema)
              states.commitSlices(f, merged(prevTouched, d), dirty,
                prevKey, key)
              ops.recordSpan(spanRows, deltaPairs,
                dirty.size, stateBuckets * subBuckets - dirty.size)
            }
          }
        }
        states.gcWithin(f, from)
      }
    }
  }

  /** The current join output: (jk, left_after, right_after). */
  def read(spark: SparkSession): DataFrame =
    states.latest(states.fs(spark)) match {
      case Some(k) => states.read(spark, k, stateSchema)
        .select(col("jk"), col("left_after"), col("right_after"))
      case None =>
        emptyState(spark).select(col("jk"), col("left_after"), col("right_after"))
    }

  /** The latest committed state version key (spec seam). */
  private[sinks] def latestKey(spark: SparkSession): Option[(Long, Long)] =
    states.latest(states.fs(spark))

  private[sinks] def stateLog: BucketedStateLog = states

  /** Ops gauges for the `graft_lake_*` family. */
  def gauges(spark: SparkSession): Seq[(String, Double)] = {
    val (neg, pos) = lake.cursorInterval(spark, cursorName)
    val lag = lake.committedBatchIds(spark).count(id => id < neg || id > pos)
    Seq(s"djoin_${name}_lag_batches" -> lag.toDouble) ++ ops.gauges
  }
}
