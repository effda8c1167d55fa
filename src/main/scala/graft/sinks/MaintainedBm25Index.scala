package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, IncrementalDistinct}

/** A continuously-maintained BM25 full-text search index over one lake
  * table — the third member of the maintained-index family
  * ([[MaintainedLshIndex]], [[MaintainedIvfIndex]]): at 100 TB a lexical
  * search corpus cannot re-tokenize a petabyte nightly because 0.1% of
  * documents churned. The insight that makes it one seam, not new
  * machinery: BM25's term-frequency postings ARE a refcount state — one
  * envelope row per (event, token OCCURRENCE) with images reduced to
  * {id, term} makes [[IncrementalDistinct]]'s per-(term, doc) refcount
  * exactly tf, maintained under insert/edit/delete with the whole
  * crash/replay/seed/carry-forward/bucketed-persistence discipline
  * inherited verbatim (an edit retracts the old text's occurrences and
  * adds the new; a text-unchanged update telescopes to a zero-net
  * delta). Corpus statistics (N, Σ doc length → avgdl) ride a 1-row
  * [[MaintainedView]] on its own cursor over the same batches.
  *
  * Tokenization mirrors the batch pipeline exactly
  * (`TextQueries.bm25Search`: lowercase, split on `[^a-z]+`, drop
  * empties), so the maintained index and the oracle-gated batch query
  * can never disagree on terms. `k1`/`b` are SEARCH-time parameters —
  * the state holds only tf postings, so retuning them needs no rebuild
  * and they are deliberately NOT in the state fingerprint (the
  * tokenizer family and id/text keys are).
  *
  * [[search]] is the scale-right read: the query tokenizes through the
  * SAME engine expression on a one-row frame, each distinct term maps to
  * its state-log hash bucket ([[BucketedStateLog.bucketOf]]), and ONLY
  * those ≤ |query terms| buckets' slices are read; document lengths come
  * from the lake's key-restricted fold over just the candidate ids,
  * pinned to the same POSTINGS state version key (tf, df, and dl can
  * never tear against a concurrent refresh). N/avgdl are a one-row pull
  * from the stats view's own cursor, which [[refresh]] advances in the
  * same call — the two reads agree at every shared refresh boundary
  * (the q_mv composition caveat); between the two commits of one
  * in-flight refresh, N/avgdl may lag the postings by that one span.
  * Scoring is the reference formula (`idf = ln(1+(N-df+0.5)/(df+0.5))`,
  * `tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))`), ties on doc id.
  *
  * Prerequisites: REPLICA IDENTITY FULL (retraction re-tokenizes the
  * before image's text — fail-loud per event), and `idKey` must be the
  * table's replica-identity key (the length fetch prunes the fold on it).
  */
final class MaintainedBm25Index(
    lake: LakeSink, schemaName: String, table: String, name: String,
    /** Image-map keys for the document id and text columns. */
    idKey: String, textKey: String,
    k1: Double = 1.2, b: Double = 0.75, stateBuckets: Int = 16) {

  require(k1 > 0 && b >= 0 && b <= 1, s"k1=$k1 b=$b out of range")

  private[sinks] val dist = new IncrementalDistinct(
    group = Seq("term" -> (im => element_at(im, "term"))),
    name = "docs",
    value = im => element_at(im, "id"))

  private[sinks] val md = new MaintainedDistinct(lake, dist, schemaName,
    table, name, stateBuckets, transform = explodeTerms,
    // tf postings are a function of the tokenizer family and the id/text
    // keys; k1/b only shape scoring at read time and never touch state
    fingerprint = Some(s"bm25 tok=lower-nonalpha idKey=$idKey " +
      s"textKey=$textKey buckets=$stateBuckets"))

  /** Corpus stats: N (docs with ≥1 token, matching the batch pipeline's
    * convention — explode drops token-less docs) and Σ doc length, a
    * 1-group maintained aggregate. Token-less/absent-text docs land in
    * the NULL group, which [[corpusStats]] filters out.
    */
  private val statsView = new MaintainedView(lake,
    new IncrementalAgg(
      group = Seq("corpus" -> (im =>
        when(size(termsOf(im)) >= 1, lit("all")))),
      sums = Seq("len" -> (im => size(termsOf(im)).cast("long")))),
    schemaName, table, s"${name}_stats", stateBuckets = 1)

  /** The batch pipeline's exact tokenizer: lowercase, split on runs of
    * non-letters, drop empties. NULL text → NULL (no contribution).
    */
  private def termsOf(im: Column): Column =
    filter(split(lower(element_at(im, textKey)), "[^a-z]+"), t => t =!= "")

  /** Envelope→envelope: each event splits into one DELETE row per
    * before-token occurrence and one INSERT row per after-token
    * occurrence (before/after token lists differ in length, so the
    * per-side explode replaces [[MaintainedLshIndex]]'s shared-index
    * explode); a text-unchanged update's rows telescope to a zero-net
    * refcount delta in the maintainer's groupBy. Truncates pass through.
    * Fail-loud: an update/delete without its before image raises (the
    * retraction cannot re-tokenize).
    */
  private[sinks] def explodeTerms(env: DataFrame): DataFrame = {
    def img(im: Column, t: Column): Column =
      map(lit("id"), element_at(im, idKey), lit("term"), t)
    val nullImg = lit(null).cast("map<string,string>")
    val checkedBefore = when(col("before").isNull, raise_error(concat(
      lit("MaintainedBm25Index: "), col("op"),
      lit(" event carries no before image — the source table needs " +
        "REPLICA IDENTITY FULL for incremental maintenance"))))
      .otherwise(col("before"))
    val dels = env.filter(col("op").isin("update", "delete"))
      .withColumn("_bt", termsOf(checkedBefore))
      .select(col("*"), explode(col("_bt")).as("_t"))
      .withColumn("op", lit("delete"))
      .withColumn("before", img(col("before"), col("_t")))
      .withColumn("after", nullImg)
      .drop("_bt", "_t")
    val ins = env.filter(col("op").isin("update", "insert"))
      .select(col("*"), explode(termsOf(col("after"))).as("_t"))
      .withColumn("op", lit("insert"))
      .withColumn("after", img(col("after"), col("_t")))
      .withColumn("before", nullImg)
      .drop("_t")
    dels.unionByName(ins)
      .unionByName(env.filter(col("op") === "truncate"))
  }

  /** Apply every newly committed lake batch to BOTH the postings and the
    * corpus-stats cursor. Returns the postings batches applied.
    */
  def refresh(spark: SparkSession): Int = {
    val n = md.refresh(spark)
    statsView.refresh(spark)
    n
  }

  /** The raw postings: (term, doc id, tf) — `rc` IS the term frequency. */
  def postings(spark: SparkSession): DataFrame =
    md.entries(spark).select(col("term"), col("v").as("id"),
      col("rc").as("tf"))

  /** (n_docs, avgdl) of the current corpus — a one-row state read. */
  def corpusStats(spark: SparkSession): (Long, Double) = {
    // the stats view carries no fingerprint of its own — route the read
    // through the postings guard so a mismatched open refuses here too
    md.latestKey(spark)
    corpusStatsGuarded(spark)
  }

  /** [[corpusStats]] for callers that already passed the fingerprint
    * guard this call ([[search]] resolves `latestKey` itself — a second
    * guard would repeat the fingerprint read and manifest listing on the
    * hot path for no added safety).
    */
  private def corpusStatsGuarded(spark: SparkSession): (Long, Double) = {
    val rows = statsView.read(spark).filter(col("corpus") === "all")
      .select(col("n").cast("long"), col("sum_len").cast("long")).collect()
    rows.headOption.map(r => (r.getLong(0),
      if (r.getLong(0) == 0) 0.0 else r.getLong(1).toDouble / r.getLong(0)))
      .getOrElse((0L, 0.0))
  }

  /** Fail-loud maintenance-equivalence of the postings state with a
    * from-scratch re-tokenization — see
    * [[MaintainedDistinct.verifyAgainstRebuild]].
    */
  def assertConsistent(spark: SparkSession): Unit =
    md.verifyAgainstRebuild(spark)

  /** Full re-tokenization adopting the current fingerprint — the
    * migration path a mismatched open names. The corpus-stats view
    * (whose state is ALSO a function of the tokenizer and textKey)
    * rebuilds INSIDE the postings maintainer's fingerprint-marker
    * window, so a crash anywhere in the composite migration leaves
    * every instance refusing loudly and this method re-runnable —
    * migrating only the postings would leave N/avgdl silently computed
    * under the old parameters.
    */
  def rebuild(spark: SparkSession): Unit =
    md.rebuild(spark, s => statsView.rebuild(s))

  /** One-time fingerprint adoption over a pre-guard-era postings state
    * KNOWN to have been built with exactly these parameters — see
    * [[MaintainedDistinct.adoptFingerprint]] (the stats view carries no
    * fingerprint of its own); when in doubt, [[rebuild]].
    */
  def adoptFingerprint(spark: SparkSession): Unit = md.adoptFingerprint(spark)

  /** Top-k BM25 retrieval for a free-text query: (id, score), score
    * descending, ties on id. Empty (same schema) when the query has no
    * alphabetic tokens or the index is empty.
    */
  def search(spark: SparkSession, query: String, k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    // the query tokenizes through the SAME engine expression as documents
    val qTerms = ImageProbes
      .frame(spark, Map("id" -> "_probe", textKey -> query))
      .select(array_distinct(termsOf(col("im"))).as("t"))
      .head().getSeq[String](0)
    val key = md.latestKey(spark)
    def empty: DataFrame = md.entriesAt(spark, key).filter(lit(false))
      .select(col("v").as("id"), lit(0.0d).as("score"))
    if (qTerms.isEmpty) return empty
    val (nDocs, avgdl) = corpusStatsGuarded(spark)
    if (nDocs == 0L) return empty
    // bucket-pruned postings read: ≤ |query terms| buckets, never the index
    val buckets = qTerms.map(t => md.stateLog.bucketOf(Seq(
      (t, org.apache.spark.sql.types.StringType)))).toSet
    val post = md.entriesBucketsAt(spark, key, buckets)
      .filter(col("term").isin(qTerms: _*))
      .select(col("term"), col("v").as("id"), col("rc").as("tf"))
      .localCheckpoint()
    // df is exact within the pruned read (it covers every posting of the
    // query's terms); doc lengths come from the candidate-restricted fold
    // at the SAME state version key
    val dfs = post.groupBy("term").agg(count(lit(1)).as("df"))
    val dls = md.corpusAsOf(spark, key,
        Some(post.select(col("id").as("k")).distinct()))
      .select(element_at(col("after"), idKey).as("id"),
        size(termsOf(col("after"))).cast("double").as("dl"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))
    post
      .join(broadcast(dfs), Seq("term"))
      .join(dls, Seq("id"))
      .withColumn("contrib", idf * (col("tf") * lit(k1 + 1) / norm))
      .groupBy("id").agg(sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Ops gauges — both underlying maintainers' families. */
  def gauges(spark: SparkSession): Seq[(String, Double)] =
    md.gauges(spark) ++ statsView.gauges(spark)
}
