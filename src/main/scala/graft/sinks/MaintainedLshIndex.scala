package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.IncrementalDistinct

/** A continuously-maintained MinHash-LSH near-duplicate index over one
  * lake table — the marriage of this repo's two halves: the batch dedup
  * pipeline detects near-dups by rebuilding signatures over the whole
  * corpus; at 100 TB a training-data lake cannot re-shingle a petabyte
  * nightly because 0.1% of documents churned. This maintainer keeps the
  * LSH band index ITSELF incrementally correct from the CDC changelog:
  * an inserted document adds its (band, signature) rows, a deleted one
  * retracts exactly the rows its insert produced (signatures are a
  * deterministic function of the text), an edit retracts the old
  * signatures and adds the new — so candidate lookups are always exact
  * for the CURRENT corpus, at churn-proportional maintenance cost.
  *
  * Construction: each document event explodes into one envelope row per
  * band with images reduced to {id, band, sig} ([[MaintainedLshIndex
  * .explodeBands]]); an [[IncrementalDistinct]] refcount state keyed on
  * (band, sig) with the doc id as the counted value then maintains the
  * bucket membership — the whole crash/replay/seed/carry-forward/
  * bucketed-persistence discipline is inherited from
  * [[MaintainedDistinct]] verbatim (its specs, chaos soak, and scale pin
  * cover this loop). Signature family mirrors the batch pipeline
  * (`operators/DedupQueries.minhashLsh`): distinct n-token shingles,
  * per-band minhash pairs under fixed XOR seeds — but hashed with
  * codegen'd xxhash64 (the index needs determinism, not the batch
  * oracle's cross-engine md5 reproducibility).
  *
  * Reads: [[buckets]] (per-(band, sig) doc counts — `nd_docs` ≥ 2 means
  * a collision), [[candidatePairs]] (distinct candidate id pairs from
  * colliding buckets, row-local pair explode, df-capped like the batch
  * index so a degenerate signature cannot go quadratic). Candidates are
  * CANDIDATES — verify with exact Jaccard downstream, same as batch LSH.
  *
  * Prerequisites: REPLICA IDENTITY FULL (retraction recomputes
  * signatures from the before image's text) — inherited fail-loud from
  * [[IncrementalDistinct.delta]]; documents shorter than `shingleN`
  * tokens contribute no signatures (same drop rule as the batch scan).
  */
final class MaintainedLshIndex(
    lake: LakeSink, schemaName: String, table: String, name: String,
    /** Image-map keys for the document id and text columns. */
    idKey: String, textKey: String,
    bands: Int = 4, shingleN: Int = 5, stateBuckets: Int = 16,
    /** Collision buckets larger than this are dropped from
      * [[candidatePairs]] (a stop-phrase signature shared by thousands of
      * documents would explode quadratically; the batch index df-caps the
      * same way). [[buckets]] still reports them, so the cap is
      * observable, never silent.
      */
    maxBucket: Int = 64,
    /** Sub-slices per state bucket — see [[MaintainedDistinct]]'s
      * `subBuckets`: bounds the refresh read/rewrite of a HOT collision
      * bucket (a stop-phrase signature) to its dirty ~1/subBuckets.
      * Part of the state geometry (fingerprinted; `rebuild` migrates).
      */
    subBuckets: Int = 1) extends Maintainer {

  require(bands > 0 && shingleN > 0 && maxBucket >= 2,
    s"bands=$bands shingleN=$shingleN maxBucket=$maxBucket out of range")

  private[sinks] val dist = new IncrementalDistinct(
    group = Seq(
      "band" -> (im => element_at(im, "band").cast("int")),
      "sig" -> (im => element_at(im, "sig").cast("long"))),
    name = "docs",
    value = im => element_at(im, "id"))

  private[sinks] val md = new MaintainedDistinct(lake, dist, schemaName, table, name,
    stateBuckets, transform = explodeBands,
    // signatures are a function of (bands, shingleN, the name-derived
    // seed family, the id/text keys); opening an existing state with any
    // of them changed would mix two signature families — the guard
    // refuses, [[rebuild]] migrates (r16 verdict "What's wrong" #1)
    fingerprint = Some(s"lsh bands=$bands shingleN=$shingleN " +
      s"idKey=$idKey textKey=$textKey buckets=$stateBuckets " +
      s"seeds=lsh-$name-seed" +
      // absent at 1 so pre-sub state dirs keep their exact fingerprint
      (if (subBuckets == 1) "" else s" subs=$subBuckets")),
    subBuckets = subBuckets)

  /** Full re-shingle of the current corpus under THIS instance's
    * parameters, adopting its fingerprint — the prescribed migration
    * after changing `bands`/`shingleN` over an existing state dir (the
    * mismatched open fails loud and names this path).
    */
  def rebuild(spark: SparkSession): Unit = md.rebuild(spark)

  /** One-time fingerprint adoption over a pre-guard-era state dir KNOWN
    * to have been built with exactly these parameters — see
    * [[MaintainedDistinct.adoptFingerprint]]; when in doubt, [[rebuild]].
    */
  def adoptFingerprint(spark: SparkSession): Unit = md.adoptFingerprint(spark)

  /** Distinct n-token shingles of one image's text — the exact sets the
    * signatures hash, un-hashed, shared by [[sigArray]] and the exact-
    * Jaccard verification reads (so verification and indexing cannot
    * disagree on tokenization). NULL when the text is absent or shorter
    * than n tokens.
    */
  private def shingleArr(im: Column): Column =
    shingleArrOfText(element_at(im, textKey))

  /** [[shingleArr]] over a raw text column — the probe-frame variant
    * ([[candidatesForAll]] evaluates it on the caller's text column
    * directly, no synthetic image map needed).
    */
  private def shingleArrOfText(t: Column): Column = {
    val toks = split(t, "\\s+", -1)
    val shs = array_distinct(transform(
      sequence(lit(0), size(toks) - lit(shingleN)),
      i => array_join(slice(toks, i + lit(1), lit(shingleN)), " ")))
    when(t.isNotNull && size(toks) >= shingleN, shs)
  }

  /** Per-band signature array of one image's text — the batch pipeline's
    * family (distinct n-shingles → minhash pair per band) on codegen'd
    * xxhash64. NULL (no contribution) when the text is absent or shorter
    * than n tokens.
    */
  private def sigArray(im: Column): Column =
    sigArrayOfText(element_at(im, textKey))

  private def sigArrayOfText(t: Column): Column = {
    val shs = shingleArrOfText(t)
    val hs = transform(shs, sh => xxhash64(sh))
    val sigs = array((0 until bands).map { b =>
      val m1 = array_min(transform(hs,
        h => h.bitwiseXOR(lit(graft.functions.Hash60(s"lsh-$name-seed-${2 * b}")))))
      val m2 = array_min(transform(hs,
        h => h.bitwiseXOR(lit(graft.functions.Hash60(s"lsh-$name-seed-${2 * b + 1}")))))
      xxhash64(m1, m2)
    }: _*)
    when(shs.isNotNull, sigs)
  }

  /** Envelope→envelope: one row per (event, band), images reduced to
    * {id, band, sig}. A side with no signatures (short/absent text, or a
    * NULL image) becomes a NULL image on that side, so an insert of a
    * short document contributes nothing and an edit ONTO a short text is
    * a pure retraction of the old signatures.
    */
  private[sinks] def explodeBands(env: DataFrame): DataFrame = {
    def img(im: Column, sigs: Column, b: Column): Column =
      when(im.isNotNull && sigs.isNotNull, map(
        lit("id"), element_at(im, idKey),
        lit("band"), b.cast("string"),
        lit("sig"), element_at(sigs, b + 1).cast("string")))
    env
      .withColumn("_bsigs", sigArray(col("before")))
      .withColumn("_asigs", sigArray(col("after")))
      // an event whose BOTH sides carry no signatures contributes nothing
      .filter(col("_bsigs").isNotNull || col("_asigs").isNotNull ||
        col("op") === "truncate")
      .select(col("*"), explode(sequence(lit(0), lit(bands - 1))).as("_band"))
      .withColumn("before", img(col("before"), col("_bsigs"), col("_band")))
      .withColumn("after", img(col("after"), col("_asigs"), col("_band")))
      // the refcount delta reads ops literally: a one-sided update (short
      // text on one side) must become the pure insert/delete it is
      .withColumn("op",
        when(col("op") === "update" && col("before").isNull, lit("insert"))
          .when(col("op") === "update" && col("after").isNull, lit("delete"))
          .otherwise(col("op")))
      .filter(col("op") =!= "update" ||
        col("before").isNotNull || col("after").isNotNull)
      .drop("_bsigs", "_asigs", "_band")
  }

  /** Apply every newly committed lake batch (bounded to `within` when
    * set — the [[Maintainer.refreshCoherent]] barrier seam).
    */
  override def refresh(spark: SparkSession,
      within: Option[(Long, Long)] = None): Int = md.refresh(spark, within)

  override def stateId: String = md.stateId

  /** Per-(band, sig) doc counts — `nd_docs` ≥ 2 is a collision bucket. */
  def buckets(spark: SparkSession): DataFrame = md.read(spark)

  /** Distinct candidate near-duplicate id pairs (`d1` < `d2`) for the
    * CURRENT corpus: row-local pair explode inside each colliding bucket,
    * deduplicated across bands. Buckets larger than `maxBucket` are
    * excluded (observable via [[buckets]]).
    */
  def candidatePairs(spark: SparkSession): DataFrame =
    candidatePairsAt(spark, md.latestKey(spark))

  private def candidatePairsAt(spark: SparkSession,
      key: Option[(Long, Long)]): DataFrame = {
    val ids = md.entriesAt(spark, key)
      .groupBy("band", "sig").agg(sort_array(collect_list(col("v"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    ids.select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          b => struct(a.as("d1"), b.as("d2")))))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
  }

  /** Candidate near-duplicate ids of ONE probe text — the online point
    * lookup ("what in the corpus near-dups THIS new document?"), and the
    * scale-right read: the probe's band signatures are computed by
    * evaluating the SAME engine expression on a one-row frame (so the
    * probe agrees with the indexed signatures bit-for-bit — a
    * driver-side reimplementation of xxhash64/shingling could drift),
    * each (band, sig) maps to its state-log hash bucket
    * ([[BucketedStateLog.bucketOf]]), and ONLY those ≤ `bands` buckets'
    * slices are read — never the index. Empty for short probes.
    */
  private def probeFrame(spark: SparkSession, text: String): DataFrame =
    ImageProbes.frame(spark, Map("id" -> "_probe", textKey -> text))

  def candidatesFor(spark: SparkSession, text: String): DataFrame = {
    val sigRow = probeFrame(spark, text)
      .select(sigArray(col("im")).as("sigs")).head()
    val key = md.latestKey(spark)
    if (sigRow.isNullAt(0)) emptyCandidates(spark, key)
    else candidatesForAt(spark, key, sigRow.getSeq[Long](0))
  }

  /** Empty candidates in the SAME (id, bands_hit) shape as the normal
    * path — a schema that differed by branch would throw
    * AnalysisException on callers exactly and only for short probes.
    */
  private def emptyCandidates(spark: SparkSession,
      key: Option[(Long, Long)]): DataFrame =
    md.entriesAt(spark, key).filter(lit(false))
      .select(col("v").as("id"))
      .groupBy("id").agg(count(lit(1)).cast("int").as("bands_hit"))

  private def candidatesForAt(spark: SparkSession,
      key: Option[(Long, Long)], sigs: Seq[Long]): DataFrame = {
    val keys = sigs.zipWithIndex.map { case (s, b) => (b, s) }
    val buckets = keys.map { case (b, s) => md.stateLog.bucketOf(Seq(
      (b, org.apache.spark.sql.types.IntegerType),
      (s, org.apache.spark.sql.types.LongType))) }.toSet
    val hit = keys.map { case (b, s) =>
      col("band") === b && col("sig") === s }.reduce(_ || _)
    md.entriesBucketsAt(spark, key, buckets)
      .filter(hit)
      .select(col("v").as("id"), col("band").cast("int").as("band"))
      .groupBy("id").agg(count(lit(1)).cast("int").as("bands_hit"))
  }

  /** [[candidatePairs]] FINISHED, not just candidated: exact n-gram
    * Jaccard computed over the candidates' CURRENT texts, keeping pairs
    * at or above `threshold` — the same candidate→verify shape as the
    * batch pipeline (`DedupQueries.minhashLsh`), served from the
    * maintained index. The texts are fetched via the key-restricted
    * state fold pinned to the index's applied interval
    * ([[MaintainedDistinct.corpusAsOf]]): only the candidate ids' bucket
    * slices of the lake are read — candidate-proportional, never a table
    * scan. Returns (d1, d2, jaccard), exact values.
    *
    * Prerequisite: `idKey` must be the table's replica-identity key (it
    * is the fold key the restricted read prunes on) — true for any table
    * this index can maintain at all, since retraction needs identity.
    */
  def verifiedPairs(spark: SparkSession, threshold: Double = 0.8): DataFrame = {
    // ONE key threads the candidate read and the corpus fetch — resolving
    // latest twice would let a refresh committing in between verify K1
    // candidates against K2 texts
    val key = md.latestKey(spark)
    val cand = candidatePairsAt(spark, key).localCheckpoint()
    val keys = cand.select(explode(array(col("d1"), col("d2"))).as("k")).distinct()
    // checkpointed: the frame joins twice (d1 and d2 sides) — without it
    // the key-restricted fold + shingling would execute twice per call
    val docs = docShingles(spark, key, keys).localCheckpoint()
    cand
      .join(docs.select(col("id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(docs.select(col("id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** SET-ORIENTED [[candidatesFor]]: candidate ids for EVERY probe row
    * in ONE job — the nightly-pipeline shape ("which of these 1M
    * incoming documents near-dup the corpus?") that a per-probe driver
    * loop would pay a fingerprint read + manifest listing + Spark job
    * apiece for. The probes' band signatures are computed by the SAME
    * engine expression the index applied to documents, exploded to
    * (probe, band, sig) keys, and joined against the state read pruned
    * to the DISTINCT probed buckets (a bounded planning pull,
    * ≤ stateBuckets rows) — the state read is probed-bucket-
    * proportional, never probes × state. Returns
    * (probe_id, id, bands_hit); probes whose text is short/absent
    * produce no output rows (the per-probe API returns an empty frame
    * for those). `idCol`/`textCol` name the probe frame's columns.
    */
  def candidatesForAll(spark: SparkSession, probes: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val key = md.latestKey(spark)
    val pf = ProbeFrames.unique(probes, idCol, textCol)
      .select(col("probe_id"), sigArrayOfText(col("_payload")).as("sigs"))
      .filter(col("sigs").isNotNull)
    candidateHitsAt(spark, key, pf)
  }

  /** The shared set-probe core: signatures → exploded (probe, band, sig)
    * keys → bucket-pruned state join → per-(probe, id) band counts.
    * `pf` carries (probe_id, sigs [, anything else]).
    */
  private def candidateHitsAt(spark: SparkSession,
      key: Option[(Long, Long)], pf: DataFrame): DataFrame = {
    val keys = pf
      .select(col("probe_id"), posexplode(col("sigs")).as(Seq("band", "sig")))
      // materialized once: the frame feeds both the bucket-planning pull
      // and the join (re-deriving it would re-shingle every probe)
      .localCheckpoint()
    val probed = keys
      .select(md.stateLog.bucketExpr(Seq(col("band"), col("sig"))).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    md.entriesBucketsAt(spark, key, probed)
      .join(keys, Seq("band", "sig"))
      .groupBy(col("probe_id"), col("v").as("id"))
      .agg(count(lit(1)).cast("int").as("bands_hit"))
      .select(col("probe_id"), col("id"), col("bands_hit"))
  }

  /** [[candidatesForAll]] FINISHED, like the point
    * [[verifiedCandidatesFor]]: exact n-gram Jaccard between each
    * probe's text and its candidates' CURRENT texts (fetched
    * candidate-restricted at the SAME state version key), kept at or
    * above `threshold` — still one job for N probes. One probe pass
    * derives signatures AND shingles (sigArray derives from shingleArr,
    * so a second pass would re-shingle for nothing). Returns
    * (probe_id, id, bands_hit, jaccard); probes with short/absent text
    * produce no rows.
    */
  def verifiedCandidatesForAll(spark: SparkSession, probes: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val key = md.latestKey(spark)
    val pf = ProbeFrames.unique(probes, idCol, textCol)
      .select(col("probe_id"),
        sigArrayOfText(col("_payload")).as("sigs"),
        shingleArrOfText(col("_payload")).as("psh"))
      .filter(col("sigs").isNotNull)
      // referenced by the hits core AND the Jaccard join
      .localCheckpoint()
    val cand = candidateHitsAt(spark, key, pf).localCheckpoint()
    val docs = docShingles(spark, key,
      cand.select(col("id").as("k")).distinct())
    cand
      .join(docs, Seq("id"))
      .join(pf.select(col("probe_id"), col("psh")), Seq("probe_id"))
      .withColumn("jaccard",
        size(array_intersect(col("sh"), col("psh"))).cast("double") /
          size(array_union(col("sh"), col("psh"))))
      .filter(col("jaccard") >= threshold)
      .select(col("probe_id"), col("id"), col("bands_hit"), col("jaccard"))
  }

  /** [[candidatesFor]] finished: exact Jaccard between the probe text and
    * each candidate's current text (fetched key-restricted, as in
    * [[verifiedPairs]]), kept at or above `threshold`. Returns
    * (id, bands_hit, jaccard); empty (same schema) for short probes.
    */
  def verifiedCandidatesFor(spark: SparkSession, text: String,
      threshold: Double = 0.8): DataFrame = {
    // one probe job serves both the signatures (bucket lookup) and the
    // shingles (Jaccard) — sigArray derives from shingleArr, so a second
    // probe-frame job would recompute the shingling for nothing
    val row = probeFrame(spark, text)
      .select(sigArray(col("im")).as("sigs"), shingleArr(col("im")).as("sh"))
      .head()
    val key = md.latestKey(spark)
    if (row.isNullAt(0))
      return emptyCandidates(spark, key)
        .withColumn("jaccard", lit(0.0d)).filter(lit(false))
    val cand = candidatesForAt(spark, key, row.getSeq[Long](0))
      .localCheckpoint()
    val probeSh = typedLit(row.getSeq[String](1))
    docShingles(spark, key, cand.select(col("id").as("k")).distinct())
      .join(cand, Seq("id"))
      .withColumn("jaccard",
        size(array_intersect(col("sh"), probeSh)).cast("double") /
          size(array_union(col("sh"), probeSh)))
      .filter(col("jaccard") >= threshold)
      .select(col("id"), col("bands_hit"), col("jaccard"))
  }

  /** (id, shingle-set) of the docs whose replica keys are in `keys` —
    * fetched via the restricted fold at the SAME state version key as the
    * candidate read, shingled by the same expression the signatures hash.
    */
  private def docShingles(spark: SparkSession, key: Option[(Long, Long)],
      keys: DataFrame): DataFrame =
    md.corpusAsOf(spark, key, Some(keys))
      .select(element_at(col("after"), idKey).as("id"),
        shingleArr(col("after")).as("sh"))
      .filter(col("sh").isNotNull)

  /** Fail-loud equivalence of the maintained signature state with a
    * seed-style re-shingle of the surviving corpus — see
    * [[MaintainedDistinct.verifyAgainstRebuild]]. The driver-gated
    * `q_mv` build runs this (LSH signatures have no cross-engine
    * oracle), so maintenance drift turns the driver red. Returns the
    * number of state rows compared (assert it > 0 where vacuity
    * matters).
    *
    * `sampleMod` > 1 restricts BOTH sides to the deterministic document
    * sample `xxhash64(id) % sampleMod == rem` — the re-shingle (the
    * expensive half) then touches only ~1/sampleMod of the corpus. The
    * remainder ROTATES with the applied interval
    * ([[SampleResidues.of]]: a mixed hash of the verified key's
    * position, so a refresh loop advancing in ANY stride still cycles
    * residues) — in a live deployment, drift outside today's sample
    * lands inside a later one rather than hiding in a fixed residue
    * class; a gate re-running at one fixed interval (q_mv per build)
    * gets no rotation and leans on its full-state oracle columns
    * instead. Sound per-document (each doc's signature rows derive from
    * that doc alone).
    */
  def assertConsistent(spark: SparkSession, sampleMod: Int = 1): Long = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    md.verifyAgainstRebuild(spark, key =>
      if (sampleMod == 1) None
      else {
        val rem = SampleResidues.of(key, sampleMod)
        Some((
          pmod(xxhash64(element_at(col("after"), idKey)),
            lit(sampleMod.toLong)) === rem,
          pmod(xxhash64(col("v")), lit(sampleMod.toLong)) === rem))
      })
  }

  /** Ops gauges — the underlying maintainer's family. */
  def gauges(spark: SparkSession): Seq[(String, Double)] = md.gauges(spark)
}

/** The rotating residue of the sampled equivalence checks: a MIXED hash
  * of the verified interval's position modulo `sampleMod`. The mix is a
  * deliberate trade: a plain `pos % mod` guarantees full residue
  * coverage under stride-1 refresh loops but pins ONE residue forever
  * whenever the stride divides the modulus; the mixed hash samples each
  * class with probability ~1/mod per horizon under ANY stride — no
  * stride can systematically skip a class, at the cost of a
  * probabilistic (geometric-tail) rather than bounded detection delay.
  * byteswap64 is a pure, JVM-stable mixer.
  */
private[sinks] object SampleResidues {
  def of(key: (Long, Long), sampleMod: Int): Long =
    math.floorMod(scala.util.hashing.byteswap64(key._2), sampleMod.toLong)
}

/** Shared intake of the set-oriented probe APIs: exact-duplicate probe
  * rows collapse (same id, same payload — harmless re-sends), and a
  * probe id carried by DIFFERING payloads fails loudly — every set API
  * keys its output on probe_id, so two payloads under one id would
  * silently merge into one garbled result row (doubled bands_hit,
  * double-counted term contributions, cross-matched re-ranks). Returns
  * a materialized (probe_id, _payload) frame.
  */
private[sinks] object ProbeFrames {
  def unique(probes: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    val src = probes
      .select(col(idCol).cast("string").as("probe_id"),
        col(payloadCol).as("_payload"))
      .distinct().localCheckpoint()
    val dup = src.groupBy("probe_id").count()
      .filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        s"probe frame carries id '${dup(0).getString(0)}' with " +
          s"${dup(0).getLong(1)} differing payloads — set-probe results " +
          "are keyed on the probe id, so duplicate ids with different " +
          "payloads would silently merge into one garbled row; " +
          "deduplicate or re-key the probe frame")
    src
  }
}

/** One-row frame carrying a synthetic image map under column `im` — the
  * shared probe seam of the maintained-index family: probes evaluate the
  * SAME engine expressions the index applied to documents (signatures,
  * shingles, tokens), so probe and index can never drift bit-for-bit the
  * way a driver-side reimplementation could.
  */
private[sinks] object ImageProbes {
  def frame(spark: SparkSession, im: Map[String, String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      new java.util.ArrayList(Seq(org.apache.spark.sql.Row(im)).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("im",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))))
  }
}
