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

  // Band structure chosen by a measured sweep on the sf0.1 corpus (recall of
  // exact top-3 vs candidate fraction). This corpus is WEAKLY clustered —
  // exact top-3 cosine is only 0.33-0.5, i.e. per-hyperplane sign agreement
  // ≈0.63 — so high recall costs real probing: 2×8 bits scored 20% with
  // Hamming-1 probes; 20 bands × 12 bits with Hamming-≤2 multi-probe
  // measures 92.5% recall at a ~35% candidate fraction here. On production
  // embedding corpora (neighbors at cosine ≥0.7, agreement ≥0.75) the same
  // config collides neighbors with probability ≈1 while the random-pair
  // rate — set by bits and radius alone (79/4096 per band) — stays put.
  private val Bands = 20
  private val BandBits = 12
  private val Planes = Bands * BandBits
  private val Dim = 64
  private val ProbeRadius = 2

  /** Deterministic random hyperplanes: w(p,i) = hash60("p_i")/2^59 − 1 ∈
    * [−1,1) — the same one-hash-three-engines trick as [[Hash60]]/SimHash, so
    * the oracle regenerates identical planes in SQL.
    */
  private lazy val planeWeights: Array[Array[Double]] =
    Array.tabulate(Planes, Dim) { (p, i) =>
      Hash60(s"${p}_$i") / 576460752303423488.0 - 1.0 // 2^59
    }

  /** All bucket flips within the probe radius: the identity, every 1-bit
    * flip, and every 2-bit flip (multi-probe LSH — query-side fan-out only;
    * the corpus is hashed exactly once).
    */
  private lazy val probeFlips: Seq[Long] = {
    val one = (0 until BandBits).map(j => 1L << j)
    val two = for {
      a <- 0 until BandBits; c <- a + 1 until BandBits
    } yield (1L << a) | (1L << c)
    (Seq(0L) ++ (if (ProbeRadius >= 1) one else Nil) ++
      (if (ProbeRadius >= 2) two else Nil))
  }

  /** Random-hyperplane LSH ANN — the 100-TB path. Each vector gets a
    * 240-bit signature (sign of the projection onto fixed hyperplanes),
    * split into 20 bands of 12 bits; candidates are vectors sharing at
    * least one band bucket with a query, where each query probes its own
    * bucket plus every bucket within Hamming distance 2 (79 probes/band) —
    * near-miss bits no longer lose the candidate (top-3 recall ≥90% on the
    * sf0.1 corpus, measured in `AnnRecallSpec`; see the constants' note on
    * this corpus's weak clustering). Exact cosine is then computed on
    * candidates ONLY.
    *
    * Scale shape: signatures are one codegen'd scan (fixed-weight dot
    * products per row, weights are plan literals); probing multiplies only
    * the broadcast QUERY side (2%-sample × 79 probes × 20 bands); the
    * bucket join touches only colliding pairs — never the N×Q cross
    * product; the top-k window runs on candidates. At 1000 executors this
    * is a scan + one hash join on (band, bucket) + one small shuffle: no
    * stage is corpus-quadratic, and recall/cost tune with
    * (Bands, BandBits, ProbeRadius) without changing the plan shape.
    */
  /** (vec_id, v, norm, band, bucket) — every vector's LSH band signatures,
    * one codegen'd scan (the hyperplane weights are plan literals). Shared
    * by [[annLsh]] and the embedding near-dup audit in [[DedupQueries]].
    *
    * Memoized + persisted per (session, dir), same rationale (and
    * lifecycle) as [[ShingleSets]]: the frame feeds differently-aliased
    * branches (self-join sides, the query sample) that defeat
    * ReuseExchange, so without persistence each branch repeats the
    * 240-dot-product signature scan. At true 100-TB scale the equivalent is
    * writing the signature table once; release with [[releaseSignatures]].
    */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[operators] def bandedSignatures(s: SparkSession, dir: String): DataFrame =
    memo.getOrElseUpdate((s, dir), {
      // One bucket column per band: a BandBits-bit integer of projection signs.
      def bucketCol(b: Int): Column =
        (0 until BandBits).map { j =>
          val p = b * BandBits + j
          val w = typedLit(planeWeights(p).toSeq)
          when(dot(col("v"), w) >= 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
      vectors(s, dir)
        .select(col("vec_id"), col("v"), col("norm"),
          posexplode(array((0 until Bands).map(bucketCol): _*)).as(Seq("band", "bucket")))
        .persist()
    })

  /** Unpersist and forget every cached signature frame owned by `s`. */
  def releaseSignatures(s: SparkSession): Unit =
    memo.keys.toSeq.filter(_._1 eq s).foreach { k =>
      memo.remove(k).foreach(_.unpersist(blocking = true))
    }

  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val vecs = vectors(s, dir)
    val banded = bandedSignatures(s, dir)

    // Multi-probe: the query's own bucket plus every Hamming-≤2 neighbor.
    val probeBuckets = array(probeFlips.map(f => col("bucket").bitwiseXOR(lit(f))): _*)
    val queryBands = banded.filter(col("vec_id") % QueryMod === 0)
      .select(col("vec_id").as("qid"), col("band"), explode(probeBuckets).as("bucket"))

    // Bucket-collision candidates (distinct pairs — a pair may collide in
    // both bands). Only ids travel through the distinct; vectors re-join after.
    val cand = banded.join(broadcast(queryBands), Seq("band", "bucket"))
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
}
