package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hash60

/** Approximate-nearest-neighbor similarity search over the `embeddings`
  * table (builder's brief: ANN over an `Array[Float]` column — brute-force
  * cosine as the correctness baseline, LSH-bucketed as the scale path).
  *
  * Everything is codegen'd built-ins (`zip_with`/`aggregate` for the dot
  * product — no UDFs) and every stage is reproducible in DuckDB SQL, so both
  * queries have exact oracles.
  */
object AnnQueries {

  /** Queries = every 41st vector; top-k neighbors per query. */
  private val QueryMod = 41
  private val K = 3

  /** Codegen'd dot product ([[graft.functions.VectorOps]]): double
    * accumulation in element order — same result as DuckDB's
    * `list_dot_product` over `DOUBLE[]`, but compiled into the stage instead
    * of the interpreted `aggregate(zip_with(...))` higher-order functions.
    */
  private def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  /** (vec_id, v: raw array<float>, norm) — no per-element cast pass needed;
    * the dot expression widens to double itself. Shared with the
    * embedding near-dup audit in [[DedupQueries]].
    */
  private[operators] def vectors(s: SparkSession, dir: String): DataFrame =
    // deliberately NOT fanned out here: most consumers' heavy work (cosine
    // joins, bucket joins) runs after their own exchange and parallelizes
    // there — a blanket repartition only added an AQE stage per query.
    // The scan-stage-heavy consumers (k-means training, cell assignment)
    // fan out at their own call sites instead.
    Tables.embeddings(s, dir).select(col("vec_id"), col("embedding").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))

  /** Cosine of two (v, norm) pairs — the one scoring expression every ANN
    * and embedding-dedup stage shares.
    */
  private[operators] def cosine(v1: Column, n1: Column, v2: Column, n2: Column): Column =
    graft.functions.VectorOps.dot(v1, v2) / (n1 * n2)

  /** Exact brute-force cosine top-k — the baseline ANN answers are judged
    * against. Queries are broadcast (they are a ~2% sample — genuinely
    * small), so the candidate generation is a broadcast nested loop with NO
    * shuffle of the corpus; the only exchange is the per-query top-k window
    * over N×Q score rows.
    *
    * 100-TB note: this is the correctness baseline, deliberately exhaustive —
    * O(N·Q) scores is the definition of brute force, not an accident of the
    * plan. The scale path is [[annLsh]], which prunes N×Q down to bucket
    * collisions before any scoring.
    */
  def annCosine(s: SparkSession, dir: String): DataFrame = {
    val vecs = vectors(s, dir)
    val queries = vecs.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val pairs = vecs.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    pairs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("qid").as("query_id"), col("rnk"),
        col("vec_id").as("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  // Spherical-k-means quantizer for the IVF index: K cells, a few Lloyd's
  // iterations, NProbe cells probed per query. Parameters from a measured
  // sweep at sf0.1: top-3 recall 66% probing 8/32 cells (~25% of the
  // corpus) — up from 29% with untrained sample centroids. More cells
  // don't help on this corpus (neighbors sit at cosine 0.33-0.5; cell
  // membership is almost uncorrelated with top-3-ness), so NProbe/K is the
  // recall knob and this corpus needs an unusually deep probe. On a
  // clustered corpus the same index serves NProbe=1-2.
  private val IvfK = 32
  private val IvfIters = 3
  private val IvfNProbe = 8

  /** Unit vector u = v / ‖v‖ as array<double> (requires `v`,`norm` cols). */
  private def unitCol: Column = transform(col("v"), _ / col("norm"))

  /** Per-row best cell against literal centroids: argmax of cosine with
    * ties to the lowest cid (max of struct(csim, −cid)). One codegen'd
    * expression, no join, no shuffle — the 100-TB assignment is a bare
    * projection over the corpus scan.
    */
  private def assignCell(cents: Array[(Int, Array[Double])],
      refNorms: Boolean = false): Column = {
    val entries = cents.map { case (cid, c) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      // refNorms (TRAINING LOOP ONLY): the norm rides the codegen
      // reference table (RefDouble), not the source text — every Lloyd
      // iteration then generates IDENTICAL source (the centroid arrays
      // were already reference-table literals) and the Janino cache
      // serves one compiled plan instead of re-compiling a ~K×dim-term
      // projection per iteration (r22: prep_pq_index per-run spread
      // collapsed 4.0-6.8 s → 4.13-4.15 s). Consumers of the FINAL
      // centroids keep source-baked literal norms: they compile once per
      // session anyway, and the interleaved A/B measured the
      // reference-load form ~0.2 s SLOWER on q_ann_ivf's per-row
      // assignment (1.85/1.65/1.67 vs 2.17/1.92/1.89 across alternating
      // runs; BenchOne warm 1.31/1.07 vs 1.48/1.26/1.49). Same double,
      // same ops, same tie construction either way.
      val cnCol = if (refNorms) graft.functions.VectorOps.refDouble(cn) else lit(cn)
      struct((dot(col("u"), typedLit(c.toSeq)) / cnCol).as("csim"),
        lit(-cid).as("ncid"))
    }
    (-array_max(array(entries.toIndexedSeq: _*)).getField("ncid")).cast("int")
  }

  /** Deterministic spherical k-means, the classic Spark shape (MLlib-style):
    * centroids live on the driver and enter each iteration's plan as
    * LITERALS; each iteration is one distributed assignment scan + one
    * per-(cell, dim) average; only K×dim rounded means are collected.
    *
    * Every step is mirrored verbatim by the DuckDB oracle's unrolled
    * k-means CTEs, so the trained index stays exactly verifiable:
    * seeding picks the K lowest md5(vec_id) rows (a deterministic
    * pseudo-random draw both engines compute identically), and every mean
    * is rounded to 6 decimals so partial-aggregation summation order can't
    * leak into the centroids. Empty cells keep their previous centroid.
    */
  private def trainCentroids(s: SparkSession, dir: String): Array[(Int, Array[Double])] =
    // Memoized per (session, dir) like every other expensive shared
    // artifact: the trained quantizer is a tiny K×dim array with no
    // persistence lifecycle, and retraining it on every annIvf call billed
    // ~15 s of k-means to whichever caller ran first. Deterministic
    // training means the memo can never go stale for a given dir.
    centroidMemo.getOrElseUpdate((s, dir), {
      // Persisted for the duration of training: each Lloyd's iteration scans
      // the unit vectors once (at scale this is the materialized training
      // table every iteration reads), then released. The unpersist blocks so
      // eviction can't bleed into whatever the caller times next.
      val vn = Tables.fanOut(
        vectors(s, dir).select(col("vec_id"), unitCol.as("u"))).persist()
      try trainLoop(vn) finally vn.unpersist(blocking = true)
    })

  private val centroidMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[(Int, Array[Double])]]

  /** Train (memoized) and expose the IVF quantizer as a K-row frame — the
    * named `prep_ivf_centroids` bench entry, so k-means cost is attributed
    * to index build (where it belongs at 100 TB: training is a one-off job,
    * probing is the recurring query) instead of to the first probe query.
    */
  def ivfCentroidFrame(s: SparkSession, dir: String): DataFrame = {
    val rows = trainCentroids(s, dir).map { case (cid, c) => (cid, c.toSeq) }
    s.createDataFrame(rows.toIndexedSeq).toDF("cell", "centroid")
  }

  /** Forget every trained quantizer owned by `s` (nothing is persisted —
    * the memo holds only driver-side arrays).
    */
  def releaseCentroids(s: SparkSession): Unit =
    centroidMemo.keys.toSeq.filter(_._1 eq s).foreach(centroidMemo.remove)

  private def trainLoop(vn: DataFrame): Array[(Int, Array[Double])] = {
    val seedRows = vn
      .withColumn("m", md5(col("vec_id").cast("string").cast("binary")))
      .orderBy(col("m"), col("vec_id")).limit(IvfK)
      .select("m", "vec_id", "u").collect()
    var cents: Array[(Int, Array[Double])] = seedRows
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2).toArray))
      .sortBy(t => (t._1, t._2))
      .zipWithIndex.map { case ((_, _, u), i) => (i + 1, u) }
    // Per-dimension means as 64 avg aggregates in ONE groupBy(cell): the
    // partial-agg state is 32 cells × 64 sums per partition and nothing is
    // exploded — measured ~2× faster per iteration than the previous
    // posexplode → groupBy(cell, i) shape, which materialized 64×N rows
    // just to aggregate them straight back down. Values are identical (the
    // same per-(cell, dim) average, rounded to 6 decimals either way).
    val dimAvgs = (0 until Dim).map(i =>
      round(avg(element_at(col("u"), i + 1)), 6).as(s"w$i"))
    for (_ <- 1 to IvfIters) {
      val means = vn.withColumn("cell", assignCell(cents, refNorms = true))
        .groupBy("cell").agg(dimAvgs.head, dimAvgs.tail: _*)
        .collect()
      val byCell = means.map(r => r.getInt(0) -> r).toMap
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(r) => (cid, Array.tabulate(Dim)(i => r.getDouble(i + 1)))
          case None => (cid, old)
        }
      }
    }
    cents
  }

  /** IVF-Flat ANN with a TRAINED coarse quantizer: every vector is assigned
    * to its nearest spherical-k-means cell (a literal-centroid projection —
    * no join); each query probes its `IvfNProbe` nearest cells and computes
    * exact cosine only against their members. Top-3 recall 66% at sf0.1
    * (vs 29% untrained), asserted ≥60% in `AnnRecallSpec`.
    *
    * 100-TB shape: training touches the corpus `IvfIters` times but moves
    * only K×dim rounded means to the driver; the assignment is one
    * scan-projection; the candidate join touches only probed cells
    * (≈ NProbe/K of the corpus per query); nothing is ever corpus × query.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val cents = trainCentroids(s, dir)
    val vecs = vectors(s, dir)
    val vn = vecs.withColumn("u", unitCol)
    // assignment fanned out: assignCell is a K×dim argmax evaluated in the
    // SCAN stage (pre-join), which the single-row-group scan serializes
    val assign = Tables.fanOut(vn).withColumn("cell", assignCell(cents))
      .select(col("vec_id"), col("cell"))
    val probeEntries = cents.map { case (cid, c) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      struct(lit(cid).as("cid"), (dot(col("u"), typedLit(c.toSeq)) / cn).as("csim"))
    }
    val byQuery = Window.partitionBy("qid").orderBy(col("csim").desc, col("cell"))
    val probes = vn.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid"),
        explode(array(probeEntries.toIndexedSeq: _*)).as("ce"))
      .select(col("qid"), col("ce.cid").as("cell"), col("ce.csim").as("csim"))
      .withColumn("rk", row_number().over(byQuery)).filter(col("rk") <= IvfNProbe)
      .select(col("qid"), col("cell"))
    val cand = assign.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"))
      .distinct()
    val queries = vecs.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val sims = cand
      .join(vecs.withColumnRenamed("vec_id", "nid"), "nid")
      .join(broadcast(queries), "qid")
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("qid").as("query_id"), col("rnk"),
        col("nid").as("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  // ---- Product quantization (PQ) — the memory-scale ANN path ----

  private[operators] val PqM = 4 // subspaces
  // 64 dims / PqM — literal, NOT `Dim / PqM`: `Dim` is declared later in
  // this object, and a forward val reference initializes to 0
  private[operators] val PqSub = 16
  private[operators] val PqK = 16 // codewords per subspace
  private[operators] val PqIters = 3

  /** Sub-vector m of the unit vector (1-based slice, PqSub wide). */
  private def subCol(m: Int): Column = slice(col("u"), m * PqSub + 1, PqSub)

  /** argmin‖x − c‖² over literal codewords as one codegen'd expression:
    * max of (2·x·c − ‖c‖², −code) — ‖x‖² is constant per row so it drops
    * out of the comparison; ties go to the lowest code id.
    */
  private def assignCode(x: Column, codewords: Array[Array[Double]],
      refNorms: Boolean = false): Column = {
    val entries = codewords.zipWithIndex.map { case (c, i) =>
      val cn2 = c.map(v => v * v).sum
      // refNorms: ‖c‖² rides the codegen reference table in the TRAINING
      // loop only — see assignCell's note
      val cn2Col =
        if (refNorms) graft.functions.VectorOps.refDouble(cn2) else lit(cn2)
      struct((dot(x, typedLit(c.toSeq)) * 2 - cn2Col).as("s"),
        lit(-(i + 1)).as("ncid"))
    }
    (-array_max(array(entries.toIndexedSeq: _*)).getField("ncid")).cast("int")
  }

  /** The PQ index per (session, dir): trained codebooks + the MATERIALIZED
    * code table. Persisting the codes is not an optimization nicety — if
    * the encode projection stays lazy, Catalyst's projection collapse
    * inlines the 4 argmax-over-PqK-codeword expressions into the
    * query-side join and re-evaluates them per JOINED row (N×|Q| times)
    * instead of per corpus row (measured 10.8 s vs 0.9 s at sf0.1). At
    * scale the code table IS the index a real deployment writes out once.
    */
  private val pqMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Array[Array[Array[Double]]], DataFrame)]

  def releasePqCodebooks(s: SparkSession): Unit =
    pqMemo.keys.toSeq.filter(_._1 eq s).foreach { k =>
      pqMemo.remove(k).foreach(_._2.unpersist(blocking = true))
    }

  /** Deterministic PQ codebook training — [[trainCentroids]]'s recipe per
    * subspace (md5-ordered seeding, `PqIters` Lloyd's iterations, means
    * rounded to 6 decimals, empty cells keep their codeword), mirrored
    * verbatim by the oracle's generated per-subspace k-means CTEs. All
    * `PqM` subspaces train in ONE job per iteration: the per-row explode to
    * (subspace, code, sub-vector) keeps a single shuffle whose partial-agg
    * state is PqM×PqK×PqSub sums; only the rounded means ever reach the
    * driver. Memoized per (session, dir) like the IVF quantizer.
    */
  private def pqIndex(s: SparkSession, dir: String): (Array[Array[Array[Double]]], DataFrame) =
    pqMemo.getOrElseUpdate((s, dir), {
      val vn = Tables.fanOut(
        vectors(s, dir).select(col("vec_id"), unitCol.as("u"))).persist()
      try {
        val seedRows = vn
          .withColumn("m", md5(col("vec_id").cast("string").cast("binary")))
          .orderBy(col("m"), col("vec_id")).limit(PqK)
          .select("m", "vec_id", "u").collect()
        val seeds = seedRows
          .map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2).toArray))
          .sortBy(t => (t._1, t._2)).map(_._3)
        var books: Array[Array[Array[Double]]] =
          Array.tabulate(PqM)(m => seeds.map(_.slice(m * PqSub, (m + 1) * PqSub)))
        val dimAvgs = (0 until PqSub).map(i =>
          round(avg(element_at(col("x"), i + 1)), 6).as(s"w$i"))
        for (_ <- 1 to PqIters) {
          val parts = (0 until PqM).map(m =>
            struct(lit(m).as("m"),
              assignCode(subCol(m), books(m), refNorms = true).as("code"),
              subCol(m).as("x")))
          val means = vn.select(explode(array(parts: _*)).as("p"))
            .select(col("p.m").as("m"), col("p.code").as("code"), col("p.x").as("x"))
            .groupBy("m", "code").agg(dimAvgs.head, dimAvgs.tail: _*)
            .collect()
          val byKey = means.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
          books = Array.tabulate(PqM)(m => Array.tabulate(PqK) { ci =>
            byKey.get((m, ci + 1)) match {
              case Some(r) => Array.tabulate(PqSub)(i => r.getDouble(i + 2))
              case None => books(m)(ci)
            }
          })
        }
        // The PERSISTED artifact is coalesced to its own size-derived
        // width (r21 verdict #1): codes are 5 small ints per row, so
        // inheriting the training frame's fan-out left 32 near-empty
        // cached partitions and every ADC scan paid 32 tasks of overhead
        // (driver: q_ann_pq 1.0 → 1.6 s). coalesce, not repartition — no
        // extra exchange; the trivial encode projection narrows with it.
        val codes0 = vn.select(col("vec_id") +:
          (0 until PqM).map(m => assignCode(subCol(m), books(m)).as(s"k$m")): _*)
        val codes = codes0.coalesce(Tables.fanWidth(codes0)).persist()
        codes.count() // materialize: encode runs once per corpus row
        (books, codes)
      } finally vn.unpersist(blocking = true)
    })

  /** ADC shortlist size per query before the exact re-rank — 6.4% of the
    * sf0.1 corpus, a 15× candidate reduction.
    */
  private[operators] val PqShortlist = 128

  /** Build (memoized) and expose the PQ code table — the named
    * `prep_pq_index` bench entry, so codebook training + code-table
    * materialization is attributed to index build (a one-off job at scale)
    * instead of to the first ADC query.
    */
  def pqCodeFrame(s: SparkSession, dir: String): DataFrame = pqIndex(s, dir)._2

  /** PQ/ADC approximate nearest neighbors with exact re-rank — the
    * production two-stage shape: every corpus vector is encoded as `PqM`
    * code bytes (64 dims → 4 bytes, 64× compression); queries SHORTLIST by
    * asymmetric distance — the fixed-order sum over subspaces of
    * q_m · codeword(code_m), computed from the code columns alone, never
    * the vectors — then only the `PqShortlist` survivors per query are
    * scored with exact cosine against their raw vectors.
    *
    * 100-TB shape: this is what makes petabyte embedding search tractable —
    * the scan-side working set shrinks from N×256 bytes to N×4; encode is
    * a literal-codebook projection (no join, no shuffle); the shortlist is
    * a broadcast nested loop over codes (the [[annCosine]] plan skeleton
    * but 64× less IO) and exact scoring touches only |Q|×PqShortlist
    * vectors. Training cost is memoized per session (a one-off index-build
    * job at scale).
    */
  def annPq(s: SparkSession, dir: String): DataFrame = {
    val (books, codes) = pqIndex(s, dir)
    val vecs = vectors(s, dir)
    val vn = vecs.withColumn("u", unitCol)
    val queries = vn.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid") +:
        (0 until PqM).map(m => subCol(m).as(s"q$m")): _*)
    // ADC score in FIXED left-to-right subspace order — the oracle adds in
    // the same order, so double summation is bit-identical.
    val approx = (0 until PqM).map { m =>
      dot(col(s"q$m"),
        element_at(typedLit(books(m).map(_.toSeq).toSeq), col(s"k$m")))
    }.reduceLeft(_ + _)
    val wApprox = Window.partitionBy("qid").orderBy(col("approx").desc, col("nid"))
    val shortlist = codes.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("approx", approx)
      .select(col("qid"), col("vec_id").as("nid"), col("approx"))
      .withColumn("ark", row_number().over(wApprox)).filter(col("ark") <= PqShortlist)
      .select(col("qid"), col("nid"))
    val qVecs = vecs.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val wExact = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    shortlist
      .join(vecs.withColumnRenamed("vec_id", "nid"), "nid")
      .join(broadcast(qVecs), "qid")
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))
      .withColumn("rnk", row_number().over(wExact)).filter(col("rnk") <= K)
      .select(col("qid").as("query_id"), col("rnk"),
        col("nid").as("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  /** Cosine threshold for [[semanticDedup]]'s keep/drop rule. Production
    * SemDeDup uses ~0.95+ on corpora with true semantic duplicates; this
    * synthetic corpus's max pairwise cosine is ≈0.51, so the audit
    * threshold sits where the decision is exercised.
    */
  private val SemDedupTau = 0.4

  /** SemDeDup-style cluster-bounded semantic dedup (Abbas et al. 2023):
    * k-means-partition the corpus with the SAME memoized spherical
    * quantizer as [[annIvf]], compute pairwise cosine ONLY within each
    * cell, and drop every vector that has a higher-priority (lower id)
    * cell-mate above the similarity threshold. Output is the per-cell
    * audit: members, pairs scored, would-drop count, max similarity.
    *
    * 100-TB shape: the assignment is a literal-centroid projection (no
    * join); the only shuffle is on the cell key; the quadratic stage is
    * bounded per cell (SemDeDup's defining trick — K scales with corpus so
    * cell size, and thus the per-cell n², stays constant). A skewed cell
    * would cap via per-cell sampling at scale; nothing is ever
    * corpus-quadratic.
    */
  /** The last call's materialized assignment per (session, dir) — released
    * on the next call and by [[releaseSemanticAssign]], so repeated calls
    * hold at most ONE materialization alive (r21 advice: the previous
    * eager localCheckpoint was never released and its blocks were
    * unrecoverable on executor loss). NOT a result memo: every call
    * recomputes; the slot exists only to free the previous call's blocks.
    */
  private val assignSlot =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Release the live semanticDedup assignment materializations of `s`. */
  def releaseSemanticAssign(s: SparkSession): Unit =
    assignSlot.keys.toSeq.filter(_._1 eq s).foreach { k =>
      assignSlot.remove(k).foreach(_.unpersist(blocking = true))
    }

  def semanticDedup(s: SparkSession, dir: String): DataFrame = {
    val cents = trainCentroids(s, dir)
    // fanned out (assignCell runs in the scan stage) AND materialized
    // once: the frame feeds the self-join twice plus the member count —
    // without the materialization the K×dim argmax evaluates three times
    // per row. persist(MEMORY_AND_DISK) + eager count, not
    // localCheckpoint: same one-evaluation effect, but lineage survives —
    // at cluster scale an executor loss recomputes the blocks instead of
    // failing the query (r21 verdict #7) — and unpersist actually frees
    // the blocks.
    releaseSemanticAssign(s)
    val assign = Tables.fanOut(vectors(s, dir).withColumn("u", unitCol))
      .withColumn("cell", assignCell(cents))
      .select(col("vec_id"), col("cell"), col("v"), col("norm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assignSlot.put((s, dir), assign)
    assign.count() // materialize once, before the three readers
    val pairs = assign.as("a")
      .join(assign.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cell").as("cell"), col("b.vec_id").as("nid2"),
        cosine(col("a.v"), col("a.norm"), col("b.v"), col("b.norm")).as("sim"))
    // One aggregation over the pair stream: the would-drop count folds in as
    // count(DISTINCT nid2 | sim >= τ), so the within-cell join executes once.
    val stats = pairs.groupBy("cell").agg(
      count(lit(1)).as("n_pairs"),
      count_distinct(when(col("sim") >= SemDedupTau, col("nid2"))).as("n_dropped"),
      round(max(col("sim")), 4).as("max_sim"))
    assign.groupBy("cell").agg(count(lit(1)).as("n_members"))
      .join(stats, Seq("cell"), "left")
      .select(col("cell"), col("n_members"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        col("max_sim"))
  }

  /** Int8 symmetric quantization audit — the compression step vector
    * pipelines apply before ANN serving (4× smaller index, SIMD-friendly
    * dot products): each vector gets a per-vector scale `max|v|/127`,
    * elements round to clamped int8, and the audit reports the damage per
    * label — mean squared reconstruction error, worst element error, and
    * the mean cosine between each vector and its reconstruction (the
    * number that decides whether the quantized index can serve).
    *
    * All per-vector reductions are sequential `aggregate` folds (mirrored
    * by DuckDB `list_reduce`), not engine-native array sums, so double
    * summation order is pinned and the oracle hash-matches.
    *
    * 100-TB shape: one scan, all arithmetic row-local, one
    * partial-aggregated groupBy(label) — the quantized corpus itself never
    * shuffles.
    */
  def vecQuantizeAudit(s: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
      .withColumn("amax",
        expr("aggregate(v, cast(0.0 as double), (a, x) -> greatest(a, abs(cast(x as double))))"))
      .filter(col("amax") > 0)
      .withColumn("scale", col("amax") / 127.0)
      // Reconstruction r = clamp(round(x/scale)) * scale, elementwise.
      .withColumn("r", expr(
        "transform(v, x -> least(cast(127 as double), greatest(cast(-127 as double), " +
          "round(cast(x as double) / scale))) * scale)"))
    val audited = vecs
      .withColumn("sqerr", expr(
        "aggregate(zip_with(v, r, (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), " +
          "cast(0.0 as double), (a, e) -> a + e)"))
      .withColumn("maxerr", expr(
        "aggregate(zip_with(v, r, (x, y) -> abs(cast(x as double) - y)), " +
          "cast(0.0 as double), (a, e) -> greatest(a, e))"))
      .withColumn("dot_vr", expr(
        "aggregate(zip_with(v, r, (x, y) -> cast(x as double) * y), " +
          "cast(0.0 as double), (a, e) -> a + e)"))
      .withColumn("n_v", expr(
        "sqrt(aggregate(v, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double)))"))
      .withColumn("n_r", expr(
        "sqrt(aggregate(r, cast(0.0 as double), (a, y) -> a + y * y))"))
      .withColumn("cos_vr", col("dot_vr") / (col("n_v") * col("n_r")))
    audited.groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("sqerr") / size(col("v"))), 8).as("mean_mse"),
        round(max(col("maxerr")), 6).as("worst_abs_err"),
        round(avg(col("cos_vr")), 6).as("mean_cosine"))
  }

  // Band structure chosen by a measured sweep on the sf0.1 corpus. The
  // binding constraint is the RANDOM-pair candidate rate — the fraction of
  // uncorrelated pairs the bucket join admits, which decides whether
  // candidate generation is actually cheaper than brute force at scale.
  // The round-4 config (20×12-bit bands, full Hamming-≤2 probing) admitted
  // ~32% of random pairs — only ~3× cheaper than brute force. This
  // config — 40×17-bit bands, query-directed probing of the 8
  // least-confident bits up to radius 3 (93 probes/band) — measures 4.6%
  // on seeded random queries (the analytic uniform-bucket bound is 2.8%;
  // the excess is bucket-distribution lumpiness from the planes' shared
  // finite-dim geometry, so the honest number is the MEASURED one, asserted
  // in `AnnRecallSpec`): a ~7× cheaper join at the same plan shape.
  //
  // Measured recall frontier (numpy sweep over (bits, bands, probe set),
  // sf0.1): this corpus is WEAKLY clustered — exact top-3 neighbors sit at
  // cosine 0.33–0.5, i.e. per-hyperplane sign agreement ≈0.63, within
  // noise of random — and NO srp-lsh configuration reaches 90% top-3
  // recall at ≤5% measured random rate here (the best configs measure
  // 53-56%; this one 55.8%; full-Hamming 16-bit probing as a comparison
  // point measures 46%). Recall ≥90% at ≤5% random rate jointly require
  // per-band selectivity (neighbor rate / random rate) ≥46, which at
  // agreement 0.63 needs ~17-bit unprobed bands × ~6000 bands. On corpora
  // where near-neighbors mean something — sign agreement ≥0.75, cosine
  // ≥0.7 — this config's planted-neighbor recall measures ≥98.7%
  // (asserted in `AnnRecallSpec`): the index is production-grade exactly
  // where ANN recall is achievable at all.
  private val Bands = 40
  private val BandBits = 17
  private val Planes = Bands * BandBits
  private val Dim = 64
  // Query-directed multi-probe: flip only the ProbeT least-|projection|
  // bits (the ones most likely to disagree with a true neighbor), all
  // subsets up to ProbeRadius flips — 1+8+28+56 = 93 probes per band.
  private val ProbeT = 8
  private val ProbeRadius = 3

  /** Deterministic random hyperplanes: w(p,i) = hash60("p_i")/2^59 − 1 ∈
    * [−1,1) — the same one-hash-three-engines trick as [[Hash60]]/SimHash, so
    * the oracle regenerates identical planes in SQL.
    */
  private lazy val planeWeights: Array[Array[Double]] =
    Array.tabulate(Planes, Dim) { (p, i) =>
      Hash60(s"${p}_$i") / 576460752303423488.0 - 1.0 // 2^59
    }

  /** The same family flattened row-major for the one-pass SRP expressions
    * ([[graft.functions.SrpBuckets]]/[[graft.functions.SrpProjections]] —
    * per-plane literal columns overflow Janino past ~500 planes).
    */
  private lazy val flatWeights: Array[Double] = planeWeights.flatten

  /** Probe patterns as subsets of CONFIDENCE-RANK indices 0..ProbeT-1 (rank
    * 0 = the band bit with the smallest |projection| for that query): the
    * identity, every single flip, every pair, every triple. The rank→bit
    * mapping is per-query-per-band; the subset list is a plan literal.
    */
  private lazy val probeSubsets: Seq[Seq[Int]] = {
    val idx = 0 until ProbeT
    val one = idx.map(Seq(_))
    val two = for { a <- idx; b <- idx if a < b } yield Seq(a, b)
    val three = for { a <- idx; b <- idx if a < b; c <- idx if b < c } yield Seq(a, b, c)
    Seq(Seq.empty[Int]) ++
      (if (ProbeRadius >= 1) one else Nil) ++
      (if (ProbeRadius >= 2) two else Nil) ++
      (if (ProbeRadius >= 3) three else Nil)
  }

  /** (vec_id, v, norm, band, bucket) — every vector's LSH band signatures,
    * one codegen'd scan (the hyperplane weights are plan literals). Shared
    * by [[annLsh]] and the embedding near-dup audit in [[DedupQueries]].
    *
    * Memoized + persisted per (session, dir), same rationale (and
    * lifecycle) as [[ShingleSets]]: the frame feeds differently-aliased
    * branches (self-join sides, the query sample) that defeat
    * ReuseExchange, so without persistence each branch repeats the
    * 512-dot-product signature scan. At true 100-TB scale the equivalent is
    * writing the signature table once; release with [[releaseSignatures]].
    */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[operators] def bandedSignatures(s: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((s, dir), {
      // fanned out before the persist: the SRP projection runs in the scan
      // stage, and every consumer then reads parallel cached partitions.
      // costFactor: 680 hyperplane dot products over 64 dims per row is
      // ~40 k flops per input row — well above the wire-codec class.
      Tables.fanOut(vectors(s, dir), costFactor = 4)
        .select(col("vec_id"), col("v"), col("norm"),
          posexplode(graft.functions.VectorOps.srpBuckets(
            col("v"), flatWeights, Dim, Bands, BandBits)).as(Seq("band", "bucket")))
        .persist()
    })

  /** Unpersist and forget every cached signature frame owned by `s`. */
  def releaseSignatures(s: SparkSession): Unit =
    memo.keys.toSeq.filter(_._1 eq s).foreach { k =>
      memo.remove(k).foreach(_.unpersist(blocking = true))
    }

  /** Projections of all planes grouped per band — the query-side twin of
    * [[bandedSignatures]] that keeps the magnitudes (probing needs to know
    * WHICH bits are least confident, not just their signs). One codegen'd
    * pass computes every projection; the per-band grouping is slicing.
    */
  private def bandProjs(b: Int): Column =
    slice(col("projs_all"), b * BandBits + 1, BandBits)

  /** Query-directed multi-probe bucket generation: for each (query, band),
    * the query's own bucket plus every bucket reachable by flipping up to
    * `ProbeRadius` of its `ProbeT` least-|projection| bits (ties broken by
    * bit position — the DuckDB oracle sorts by the identical key). A bit
    * whose projection sits near the hyperplane is exactly the bit a true
    * neighbor is most likely to disagree on, so the probe budget goes where
    * the recall is — unlike fixed Hamming-ball probing, which spends most
    * probes on confidently-agreeing bits.
    *
    * `queries` must carry (qid, v). The fan-out is query-side only
    * (Q × Bands × 93 rows); the corpus is hashed exactly once.
    */
  private[operators] def queryProbeBuckets(queries: DataFrame): DataFrame = {
    val withBands = queries
      .select(col("qid"), graft.functions.VectorOps.srpProjections(
        col("v"), flatWeights, Dim).as("projs_all"))
      .select(col("qid"),
        posexplode(array((0 until Bands).map(bandProjs): _*)).as(Seq("band", "projs")))
    val base = (0 until BandBits).map { j =>
      when(element_at(col("projs"), j + 1) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    // Confidence-rank → bit-position map: indices of the ProbeT smallest
    // |projection| values (struct sort on (abs, position) — total order).
    val pos = expr(
      s"transform(slice(array_sort(transform(projs, (s, j) -> struct(abs(s) AS a, j AS j))), 1, $ProbeT), x -> x.j)")
    val subsetsCol = typedLit(probeSubsets.map(_.toArray).toArray)
    withBands
      .withColumn("base", base)
      .withColumn("pos", pos)
      .select(col("qid"), col("band"), col("base"), col("pos"),
        explode(subsetsCol).as("subset"))
      .withColumn("mask", expr(
        "aggregate(subset, 0L, (acc, ri) -> acc + cast(shiftleft(1, element_at(pos, ri + 1)) AS BIGINT))"))
      .select(col("qid"), col("band"),
        col("base").bitwiseXOR(col("mask")).as("bucket"))
  }

  /** Bucket-collision candidate pairs for an arbitrary query frame
    * (qid, v) — shared by [[annLsh]] and `AnnRecallSpec`'s planted-neighbor
    * and random-pair evals. Distinct (qid, nid): a pair may collide in
    * several bands; only ids travel through the distinct.
    */
  private[operators] def lshCandidates(
      s: SparkSession, dir: String, queries: DataFrame): DataFrame =
    bandedSignatures(s, dir)
      .join(broadcast(queryProbeBuckets(queries)), Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"))
      .distinct()

  /** Random-hyperplane LSH ANN — the 100-TB path. Each vector gets a
    * 680-bit signature (sign of the projection onto fixed hyperplanes),
    * split into 40 bands of 17 bits; candidates are vectors sharing at
    * least one band bucket with a query under query-directed multi-probe
    * ([[queryProbeBuckets]]). Exact cosine is then computed on candidates
    * ONLY. Recall: see the constants' note — ≥90% planted-neighbor recall
    * at cosine ≥0.7 with a measured 4.6% random-pair rate, both asserted
    * in `AnnRecallSpec`.
    *
    * Scale shape: signatures are one codegen'd scan ([[graft.functions.SrpBuckets]],
    * one fused projection loop per row); probing multiplies only
    * the broadcast QUERY side (2%-sample × 93 probes × 40 bands); the
    * bucket join touches only colliding pairs — never the N×Q cross
    * product; the top-k window runs on candidates. At 1000 executors this
    * is a scan + one hash join on (band, bucket) + one small shuffle: no
    * stage is corpus-quadratic, and recall/cost tune with
    * (Bands, BandBits, ProbeT, ProbeRadius) without changing the plan shape.
    */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val vecs = vectors(s, dir)
    val queries = vecs.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val cand = lshCandidates(s, dir,
      queries.select(col("qid"), col("qv").as("v")))
    val sims = cand
      .join(vecs.withColumnRenamed("vec_id", "nid"), "nid")
      .join(broadcast(queries), "qid")
      .withColumn("sim", dot(col("qv"), col("v")) / (col("qnorm") * col("norm")))

    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("qid").as("query_id"), col("rnk"),
        col("nid").as("neighbor_id"), round(col("sim"), 4).as("sim"))
  }

  /** Embedding-distribution drift between two corpus slices — the check a
    * pipeline runs when a new crawl lands: split by vec_id parity (standing
    * in for old-vs-new snapshots), compute each label's per-slice centroid,
    * and report the cosine between the two half-centroids (≈1 = stable
    * distribution, lower = the label's embedding mass moved).
    *
    * 100-TB shape: per-dimension means via posexplode + partial-agg groupBy
    * on (label, half, dim) — dims × labels × 2 rows total after the map-side
    * combine, never a vector-sized shuffle per row; the centroid
    * reassembly and cosine run on that tiny frame. (An `aggregate`-based
    * elementwise array-sum fold would also work but gets no partial
    * aggregation — the explode shape is the one that scales.)
    */
  def centroidDrift(s: SparkSession, dir: String): DataFrame = {
    val halves = Tables.embeddings(s, dir)
      .select(col("label"), pmod(col("vec_id"), lit(2)).as("half"),
        col("embedding"))
    val dims = halves
      .select(col("label"), col("half"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "half", "i")
      .agg(avg(col("x").cast("double")).as("m"), count(lit(1)).as("n"))
    val cent = dims.groupBy("label", "half")
      .agg(
        array_sort(collect_list(struct(col("i"), col("m")))).as("pairs"),
        max("n").as("n_vecs"))
      .select(col("label"), col("half"), col("n_vecs"),
        transform(col("pairs"), p => p.getField("m")).as("c"))
    cent.as("a").join(cent.as("b"),
        col("a.label") === col("b.label") &&
          col("a.half") === 0 && col("b.half") === 1)
      .select(col("a.label").as("label"),
        col("a.n_vecs").as("n_even"), col("b.n_vecs").as("n_odd"),
        round(dot(col("a.c"), col("b.c")) /
          (sqrt(dot(col("a.c"), col("a.c"))) * sqrt(dot(col("b.c"), col("b.c")))), 4)
          .as("centroid_cos"))
  }
}
