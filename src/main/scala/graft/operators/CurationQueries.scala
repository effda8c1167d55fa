package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Training-data curation operators — the pipeline steps that sit between
  * dedup and the tokenizer when assembling a corpus mix: deterministic
  * stratified sampling, per-stratum vocabulary heavy hitters, and keyed
  * pseudonymization with a k-anonymity audit.
  *
  * All three are one-scan + one-aggregation-shuffle shapes built from
  * codegen'd built-ins; nothing is corpus-quadratic or driver-sided, so each
  * survives a 100 TB corpus unchanged (the heavy-hitter top-k is the only
  * per-stratum sort, and it runs on the already-aggregated (stratum, token)
  * counts, never on raw rows).
  */
object CurationQueries {

  /** Per-mille keep rates by language — a deliberately non-uniform target
    * mix (downsample the over-represented language, keep more of the rest),
    * the everyday re-balancing step of corpus assembly.
    */
  private val EnRatePermille = 300
  private val OtherRatePermille = 600

  /** Deterministic stratified sampling: each document draws a uniform
    * 0..999 value from a salted 60-bit hash of its id and is kept when the
    * draw falls under its language's per-mille rate. Hash-gated sampling —
    * not `rand()` — so the sample is reproducible run-to-run, stable under
    * repartitioning, and cheap to audit (the oracle recomputes the exact
    * membership). Output is the per-language audit: totals, kept counts,
    * and an id checksum proving the exact kept set.
    *
    * 100-TB shape: a bare projection + one partial-aggregated groupBy on a
    * 5-key column; the kept subset itself never shuffles (consumers filter
    * by the same predicate inline).
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", lit(EnRatePermille))
      .otherwise(lit(OtherRatePermille))
    val u = hash60(concat(lit("sample-"), col("doc_id").cast("string"))) % 1000
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), rate.as("rate"), u.as("u"))
      .groupBy("lang")
      .agg(
        max(col("rate")).as("rate_permille"),
        count(lit(1)).as("n_total"),
        sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("u") < col("rate"), col("doc_id"))).as("kept_id_sum"))
  }

  private val TopK = 5

  /** Per-language vocabulary heavy hitters: lowercase alpha tokens, exact
    * counts, top-`TopK` per language with (count desc, token asc)
    * tie-breaking so the result is total-ordered.
    *
    * 100-TB shape: the token explosion is row-local; the count is a
    * partial-aggregated groupBy on (lang, token); the top-k window runs on
    * the aggregated counts (|vocab| rows, not |corpus| rows). For a corpus
    * whose vocabulary itself is too hot, the same query runs on a
    * count-min-sketch pre-pass — the plan shape downstream is identical.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(col("lang"), explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("tok"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
  }

  /** Minimum distinct shared shingles before a (train doc, benchmark doc)
    * pair counts as contamination. One shared shingle is phrase reuse;
    * repeated verbatim n-grams against the same benchmark doc is leakage.
    * (3-token shingles at threshold 2 here — production decontamination
    * uses 8-13-gram windows, but this synthetic corpus has near-zero
    * verbatim cross-doc text, so those find nothing to audit; the plan is
    * n-independent.)
    */
  private val ContaminationMinShingles = 2

  /** Benchmark decontamination — the eval-leakage audit every training-set
    * build runs: find training documents that share enough verbatim
    * n-gram shingles with a held-out benchmark set that the benchmark can't
    * be trusted on a model trained on them. The benchmark here is the
    * deterministic ~1% slice `doc_id % 97 == 0` (standing in for e.g. an
    * eval suite's prompts); output is one row per contaminated training doc
    * with how many benchmark docs it hits and the worst overlap.
    *
    * 100-TB shape: the corpus side is ONE scan of the shared
    * [[ShingleSets]] cache; the benchmark side is small by construction, so
    * its exploded shingle set is BROADCAST and the join is a broadcast hash
    * join on the shingle string (exact — no hash routing to mis-verify);
    * the per-(doc, benchmark) overlap count partial-aggregates before the
    * only shuffle. Nothing is corpus × corpus — cost is corpus-scan +
    * |benchmark shingles| map lookups per row.
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val shingles = ShingleSets(s, dir, 3)
    val benchSh = shingles.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("bench_id"), explode(col("shs")).as("sh"))
    val trainSh = shingles.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    trainSh.join(broadcast(benchSh), "sh")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContaminationMinShingles)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bench_hits"),
        max(col("n_shared")).as("max_overlap"),
        sum(col("bench_id")).as("bench_id_sum"))
  }

  /** Per-source token budget for [[tokenBudgetMix]] — the target corpus-mix
    * allotment each source may contribute.
    */
  private val MixTokenBudget = 20000L

  /** Token-budget corpus mixing: each source contributes documents in a
    * deterministic hash priority order until its token budget is exhausted
    * (the first doc to cross the line is included — budgets are targets,
    * not caps). Output is the per-source audit: docs/tokens kept vs
    * available and an id checksum pinning the exact kept set.
    *
    * 100-TB shape: the cumulative sum is a window per source — fine while a
    * source fits a sort (the exact-budget form verified here). For a
    * source too large to sort, the documented swap is rate-gating: one
    * aggregation computes the source's total tokens, the keep probability
    * is budget/total, and the SAME hash draw gates membership — no sort,
    * one scan, budget hit in expectation; the plan downstream is identical.
    */
  def tokenBudgetMix(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("toks"),
        hash60(concat(lit("mix-"), col("doc_id").cast("string"))).as("pri"))
      .withColumn("cum_before", coalesce(sum("toks").over(w), lit(0L)))
      .withColumn("kept", col("cum_before") < MixTokenBudget)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum("toks").as("tokens_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("toks"))).as("tokens_kept"),
        sum(when(col("kept"), col("doc_id"))).as("kept_id_sum"))
  }

  /** Context length for [[sequencePacking]] — the training window the
    * packed stream is cut into.
    */
  private val PackWindow = 512L

  /** Sequence packing — the concat-and-cut step between curation and the
    * trainer: documents are concatenated per source in a deterministic
    * hash order and the token stream is cut into fixed
    * [[PackWindow]]-token windows. Output is the per-source packing audit:
    * windows produced, how many documents straddle a cut (their spans
    * cross a window boundary), and the tail waste (unfilled slots of the
    * last window — the only padding concat-and-cut ever emits).
    *
    * 100-TB shape: token offsets are one window cumsum per source (same
    * note as [[tokenBudgetMix]]: a per-source sort, sharded in practice by
    * packing per (source, shard) with shard = hash-range); everything
    * after the cumsum is arithmetic on (offset, length) — no second pass
    * over text, no explosion to one-row-per-token.
    */
  def sequencePacking(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("pri"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("toks"),
        hash60(concat(lit("mix-"), col("doc_id").cast("string"))).as("pri"))
      .withColumn("off", coalesce(sum("toks").over(w), lit(0L)))
      // `div`, not `/`: Spark's `/` on BIGINT is double division, and the
      // window index must stay exact integer arithmetic.
      .withColumn("straddles",
        expr(s"(off div $PackWindow) != ((off + toks - 1) div $PackWindow)"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("tokens_total"),
        max(col("off") + col("toks")).as("end_tok"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddling"))
      .select(col("source"), col("n_docs"), col("tokens_total"),
        expr(s"(end_tok + ${PackWindow - 1}) div $PackWindow").as("n_windows"),
        col("n_straddling"),
        expr(s"($PackWindow - (end_tok % $PackWindow)) % $PackWindow").as("tail_waste"))
  }

  /** Keyed pseudonymization + generalization over `customer`, with the
    * k-anonymity report as output: names are replaced by a salted 60-bit
    * token (deterministic, so joins on the pseudonym still work across
    * tables scrubbed with the same key), account balance is generalized to
    * 1000-unit buckets, and the output audits each (segment, bucket)
    * equivalence class — its size (the k in k-anonymity), distinct
    * pseudonyms, and a modular checksum of the tokens proving the exact
    * mapping. The checksum is `sum(pid mod p)` with a 1e9 prime: raw 60-bit
    * token sums would overflow BIGINT under ANSI mode at corpus scale.
    *
    * 100-TB shape: projection + one partial-aggregated groupBy; the salt
    * lives in the plan, not in data.
    */
  def pseudonymizedSegments(s: SparkSession, dir: String): DataFrame = {
    val pid = hash60(concat(lit("pseud-v1-"), col("c_name")))
    Tables.customer(s, dir)
      .select(
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"),
        pid.as("pid"))
      .groupBy("c_mktsegment", "bal_bucket")
      .agg(
        count(lit(1)).as("n"),
        count_distinct(col("pid")).as("n_pseudo"),
        sum(col("pid") % 1000000007L).as("pid_checksum"))
  }
}
