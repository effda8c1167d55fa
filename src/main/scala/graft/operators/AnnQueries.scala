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

  /** Every 101st vector serves as an IVF centroid (a deterministic stand-in
    * for k-means training — the index structure, assignment, and probing are
    * the real thing and fully oracle-able).
    */
  private val CentroidMod = 101
  private val NProbe = 2

  /** IVF-Flat ANN — the coarse-quantizer scale path: every vector is
    * assigned to its nearest centroid's cell (one N×K scoring pass, K small);
    * each query probes its `NProbe` nearest cells and computes exact cosine
    * only against their members.
    *
    * 100-TB shape: the assignment is one scan joined against K broadcast
    * centroids plus a per-vector argmin — embarrassingly parallel; the
    * candidate join touches only probed cells (≈ NProbe/K of the corpus per
    * query); nothing is ever corpus × query. With a trained quantizer the
    * same plan serves production IVF — only the centroid source changes.
    */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val vecs = vectors(s, dir)
    val cents = vecs.filter(col("vec_id") % CentroidMod === 0)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("norm").as("cnorm"))
    val scored = vecs.crossJoin(broadcast(cents))
      .withColumn("csim", dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
    val byVec = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid"))
    val assign = scored
      .withColumn("rk", row_number().over(byVec)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val probes = scored.filter(col("vec_id") % QueryMod === 0)
      .withColumn("rk", row_number().over(byVec)).filter(col("rk") <= NProbe)
      .select(col("vec_id").as("qid"), col("cid").as("cell"))
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
      vectors(s, dir)
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
}
