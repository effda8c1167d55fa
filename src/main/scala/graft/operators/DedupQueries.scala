package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SimHash
import graft.functions.TextFunctions._

/** Deduplication operators over `documents` — the core of an LLM-training-data
  * pipeline. Every variant is written LSH-first: candidates come from equality
  * joins on hash buckets (shuffle on the bucket key), NEVER from an all-pairs
  * comparison, so the shapes survive a 100 TB corpus where n² is impossible.
  */
object DedupQueries {

  /** Exact dedup: hash-groupBy on a content digest. One scan + one partial
    * aggregation — the cheapest pass, always run first at scale.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(md5(col("text"))).as("n_unique"),
        (count(lit(1)) - count_distinct(md5(col("text")))).as("n_dup_rows"))

  private val NumHashes = 8
  private val BandSize = 2 // 4 bands × 2 minhashes per band

  /** MinHash + LSH near-dup detection, the canonical scale-safe pipeline:
    * distinct 5-token shingles → k=8 minhash signature (seeded 60-bit
    * hashes) → 4 bands of 2 → equality join on (band, band-key) for
    * candidates → exact Jaccard verification of candidates only.
    *
    * At 100 TB the only shuffles are groupBys on (doc, shingle-ish) keys and
    * the band-bucket equality join; candidate count is tunable via
    * bands/rows (P[bucket match] = 1-(1-j^r)^b). The exact-verify stage
    * touches only candidates, not the corpus.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), explode(wordShingles(tokens(col("text")), 5)).as("sh"))
      .distinct()
    // 8 seeded hashes per shingle in one pass; min per (doc, seed) via a
    // single aggregation (partial map-side combine keeps the shuffle small).
    val hashed = sh.select(col("doc_id"),
      posexplode(array((0 until NumHashes).map(i =>
        hash60(concat(lit(s"$i|"), col("sh")))): _*)).as(Seq("seed", "h")))
    val sig = hashed.groupBy("doc_id")
      .agg(
        min(when(col("seed") === 0, col("h"))).as("m0"),
        (1 until NumHashes).map(i => min(when(col("seed") === i, col("h"))).as(s"m$i")): _*)
    val bands = sig.select(col("doc_id"),
      posexplode(array((0 until NumHashes / BandSize).map(j =>
        concat_ws(",", col(s"m${2 * j}"), col(s"m${2 * j + 1}"))): _*)).as(Seq("band", "bkey")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    jaccardVerify(cand, sh, threshold = 0.8)
      .select(col("d1"), col("d2"), col("n_shared"), round(col("jaccard"), 3).as("jaccard"))
  }

  /** Exact-Jaccard verification restricted to candidate pairs: shared
    * distinct-shingle counts via two equality joins, |A∪B| from per-doc set
    * sizes. Candidates are assumed small relative to the corpus (that is the
    * point of LSH) — broadcast them.
    */
  private def jaccardVerify(cand: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    broadcast(cand)
      .join(sh.as("sa"), col("d1") === col("sa.doc_id"))
      .join(sh.as("sb"), col("d2") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes).as("s1"), col("d1") === col("s1.doc_id"))
      .join(broadcast(sizes).as("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("jaccard",
        col("n_shared") / (col("s1.sz") + col("s2.sz") - col("n_shared")))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup detection using the custom Catalyst expression
    * ([[graft.functions.SimHash]]): one 60-bit signature per document in a
    * single codegen'd scan, banded 4×15 bits, equality join on
    * (band, 15-bit key), Hamming ≤ 5 on candidates. By pigeonhole, any pair
    * with Hamming ≤ 3 shares at least one of 4 bands — banding is the
    * recall-safe index; the Hamming filter is the precision gate.
    */
  def simhashBanding(s: SparkSession, dir: String): DataFrame = {
    val sig = Tables.documents(s, dir)
      .select(col("doc_id"), SimHash.simhash(tokens(col("text"))).as("sig"))
    def bandKey(j: Int): Column = shiftright(col("sig"), 15 * j).bitwiseAND(lit(32767L))
    val bands = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(bandKey): _*)).as(Seq("band", "bkey")))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.sig").as("s1"), col("b.sig").as("s2"))
      .distinct()
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))).cast("long"))
      .filter(col("hamming") <= 5)
      .select("d1", "d2", "hamming")
  }

  /** N-gram Jaccard dedup without LSH: inverted-index equality join on
    * 3-token shingles (never all-pairs), a shared-count ≥ 2 prefilter (the
    * classic prefix-filtering trick), then the Jaccard threshold. At corpus
    * scale the index join needs document-frequency pruning of stop-shingles —
    * the HAVING here is the minimal form of it.
    */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), explode(wordShingles(tokens(col("text")), 3)).as("sh"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .groupBy("d1", "d2")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .join(broadcast(sizes).as("s1"), col("d1") === col("s1.doc_id"))
      .join(broadcast(sizes).as("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("jaccard",
        col("n_shared") / (col("s1.sz") + col("s2.sz") - col("n_shared")))
      .filter(col("jaccard") >= 0.5)
      .select(col("d1"), col("d2"), round(col("jaccard"), 3).as("jaccard"))
  }
}
