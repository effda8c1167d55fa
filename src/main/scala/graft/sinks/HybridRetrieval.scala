package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval over the maintained-index family: reciprocal-rank
  * fusion (RRF, Cormack/Clarke/Buettcher 2009) of a lexical ranking
  * ([[MaintainedBm25Index.searchAll]]) and a vector ranking
  * ([[MaintainedIvfIndex.searchTopKAll]] / [[MaintainedIvfIndex.searchTopKAllAdc]])
  * — the retrieval shape a training-data curation or RAG-evaluation
  * pipeline actually runs nightly: "for these N incoming queries, the
  * top-k corpus documents by BOTH what they say and what they mean."
  *
  * RRF is the fusion that needs NO score calibration — BM25 scores and
  * squared L2 distances live on incomparable scales, so the fused score
  * is computed from each side's RANK alone:
  * `rrf(d) = Σ_lists 1/(rrfK + rank_list(d))`, documents absent from a
  * list contributing nothing for it. Ranks come from each side's own
  * deterministic order (BM25: score desc, id asc; IVF: dist asc,
  * id asc), so fusion output is deterministic too (ties by doc id).
  *
  * Scale shape: the two side reads are the already-pinned
  * probed-bucket-proportional set reads (one job apiece, never
  * probes × state); fusion itself touches ONLY their outputs — at most
  * `kLex + kVec` rows per probe — ranked per probe by one window
  * apiece and combined with a full-outer join on (probe_id, id). No
  * corpus access, no driver-side loop, no collect.
  *
  * Coherence contract: each side read is internally torn-proof (one
  * version key threads that index's candidates and payloads), but the
  * TWO indexes run on independent cursors over the same changelog —
  * a refresh landing between the two reads can leave the lexical side
  * one span ahead of the vector side (exactly the contract of reading
  * two independently-maintained tables without a global snapshot).
  * Callers needing batch-identical sides run
  * [[Maintainer.refreshCoherent]] — ONE pinned bound drives both
  * indexes to identical applied batch sets, whatever the writer lands
  * mid-barrier — then fuse with no concurrent refresher (or call
  * [[searchAllCoherent]], which does both).
  *
  * RRF generalizes to ANY number of rankings (the Σ is over lists):
  * [[fuseAll]] fuses N — the maintained family's natural third leg is
  * the LSH set read's exact-Jaccard ranking
  * ([[MaintainedLshIndex.verifiedCandidatesForAll]], ordered
  * `jaccard` descending) for near-duplicate-aware retrieval.
  */
object HybridRetrieval {

  /** Fuse two per-probe rankings by RRF. `lex` is (probe_id, id, score)
    * with HIGHER score better; `vec` is (probe_id, id, dist) with LOWER
    * distance better — the exact output schemas of
    * [[MaintainedBm25Index.searchAll]] and
    * [[MaintainedIvfIndex.searchTopKAll]]. Returns
    * (probe_id, id, rrf, lex_rank, vec_rank), top-k per probe by
    * (rrf desc, id asc); a rank is null when that side did not return
    * the document. Probes present in only one input still fuse
    * (single-list RRF = that list reweighted, order preserved). The
    * two-list convenience over [[fuseAll]].
    */
  def fuse(lex: DataFrame, vec: DataFrame, k: Int, rrfK: Int = 60): DataFrame =
    fuseAll(Seq(
      ("lex_rank", lex.select(col("probe_id"), col("id"), col("score")),
        col("score").desc),
      ("vec_rank", vec.select(col("probe_id"), col("id"), col("dist")),
        col("dist").asc)), k, rrfK)

  /** N-LIST RRF — `rrf(d) = Σ_lists 1/(rrfK + rank_list(d))`, documents
    * absent from a list contributing nothing for it. Each list is
    * (rank column name, frame with probe_id + id + whatever its
    * ordering reads, the WITHIN-PROBE ordering with the best document
    * first — e.g. `col("score").desc`, `col("dist").asc`,
    * `col("jaccard").desc` for the LSH set read's exact-Jaccard leg).
    * Ties inside a list break on the id string, so ranks — and the
    * fusion — are deterministic. Returns
    * (probe_id, id, rrf, <one nullable rank column per list>), top-k
    * per probe by (rrf desc, id asc).
    *
    * A list carrying DUPLICATE (probe_id, id) rows (fuse is documented
    * for arbitrary ranking frames, not just the maintained set reads,
    * which are unique by construction) contributes its BEST occurrence
    * only — duplicates are dropped under the list's own ordering before
    * ranks are assigned, so one document can never double-count inside
    * one list.
    *
    * Scale shape unchanged from the two-list fuse: ranking is one
    * window per list over that list's ≤k-rows-per-probe output, fusion
    * is a union + one per-(probe, doc) aggregate — never a join chain,
    * never corpus access, no driver loop.
    */
  def fuseAll(lists: Seq[(String, DataFrame, Column)], k: Int,
      rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "fuseAll needs at least one ranking")
    require(k > 0, s"top-k needs k > 0, got $k")
    require(rrfK > 0, s"rrfK must be positive, got $rrfK")
    val names = lists.map(_._1)
    require(names.distinct == names, s"duplicate rank column names: $names")
    // "rnk" is the internal fused-position column: a list named "rnk"
    // would have its ranks silently REPLACED by the top-k positions
    require(names.forall(n => !Set("probe_id", "id", "rrf", "rnk")(n)),
      s"rank column names collide with the output schema: $names")
    val ranked = lists.zipWithIndex.map { case ((_, df, better), i) =>
      val dedup = Window.partitionBy("probe_id", "id")
        .orderBy(better)
      val w = Window.partitionBy("probe_id").orderBy(better, col("id").asc)
      df.withColumn("_dup", row_number().over(dedup))
        .filter(col("_dup") === 1)
        .withColumn("_rnk", row_number().over(w))
        .select(col("probe_id"), col("id"), lit(i).as("_li"), col("_rnk"))
    }
    val rankCols = lists.zipWithIndex.map { case ((nm, _, _), i) =>
      max(when(col("_li") === i, col("_rnk"))).as(nm)
    }
    val wf = Window.partitionBy("probe_id")
      .orderBy(col("rrf").desc, col("id").asc)
    ranked.reduce(_ unionByName _)
      .groupBy("probe_id", "id")
      .agg(sum(lit(1.0) / (lit(rrfK) + col("_rnk"))).as("rrf"),
        rankCols: _*)
      .withColumn("rnk", row_number().over(wf))
      .filter(col("rnk") <= k)
      .select((Seq(col("probe_id"), col("id"), col("rrf")) ++
        names.map(col)): _*)
  }

  /** One-call hybrid set read: run both maintained-index set reads over
    * ONE probe frame (each side validates and consumes its own payload
    * column; a probe with a null/tokenless query still ranks on the
    * vector side, a probe with a null/mis-dimensioned embedding still
    * ranks lexically) and [[fuse]] the two rankings. `kLex`/`kVec` are
    * each side's candidate depth (RRF quality rises with depth, read
    * cost stays probe-proportional); `shortlist > 0` routes the vector
    * side through the PQ/ADC path (requires the index to carry
    * codebooks), `dfCap` bounds the lexical side's stop-term reads —
    * left unset it inherits the BM25 index's constructor-level
    * `defaultDfCap` (the scale posture the index was built with).
    * Returns (probe_id, id, rrf, lex_rank, vec_rank).
    */
  def searchAll(spark: SparkSession,
      bm25: MaintainedBm25Index, ivf: MaintainedIvfIndex,
      probes: DataFrame, idCol: String, queryCol: String, embCol: String,
      k: Int, kLex: Int, kVec: Int, nprobe: Int, rrfK: Int = 60,
      dfCap: Long = MaintainedBm25Index.InheritDfCap,
      shortlist: Int = 0): DataFrame = {
    require(kLex > 0 && kVec > 0,
      s"side depths must be positive, got kLex=$kLex kVec=$kVec")
    // fuse() re-checks these, but AFTER both side reads' eager driver
    // work — reject a rejectable input before any I/O
    require(k > 0, s"top-k needs k > 0, got $k")
    require(rrfK > 0, s"rrfK must be positive, got $rrfK")
    // the two side reads are independent consumers of independent state
    // dirs with several driver-blocking steps apiece (fingerprint read,
    // manifest listing, probe checkpoint, bucket-planning collect) — run
    // them concurrently, the same shape the BM25 composite uses for its
    // companions. Each side's read plan is fully CONSTRUCTED on its
    // thread; execution stays lazy inside fuse's one job.
    var lex: DataFrame = null
    var vec: DataFrame = null
    MaintainerOps.inParallel(
      () => lex = bm25.searchAll(spark, probes, idCol, queryCol, kLex, dfCap),
      () => vec =
        if (shortlist > 0)
          ivf.searchTopKAllAdc(spark, probes, idCol, embCol, nprobe, kVec,
            shortlist)
        else ivf.searchTopKAll(spark, probes, idCol, embCol, nprobe, kVec))
    fuse(lex, vec, k, rrfK)
  }

  /** [[searchAll]] behind the coherence barrier — the one-call shape a
    * nightly pipeline wants: [[Maintainer.refreshCoherent]] drives BOTH
    * indexes to the lake's committed hull pinned once, then the two set
    * reads fuse over identical applied batch sets (no torn sides,
    * whatever the writer lands mid-barrier; the no-concurrent-refresher
    * caveat between barrier and read is the caller's, as with any
    * read-after-refresh). Returns (pinned bound, fused frame).
    */
  def searchAllCoherent(spark: SparkSession, lake: LakeSink,
      bm25: MaintainedBm25Index, ivf: MaintainedIvfIndex,
      probes: DataFrame, idCol: String, queryCol: String, embCol: String,
      k: Int, kLex: Int, kVec: Int, nprobe: Int, rrfK: Int = 60,
      dfCap: Long = MaintainedBm25Index.InheritDfCap,
      shortlist: Int = 0): ((Long, Long), DataFrame) = {
    val bound = Maintainer.refreshCoherent(spark, lake, bm25, ivf)
    (bound, searchAll(spark, bm25, ivf, probes, idCol, queryCol, embCol,
      k, kLex, kVec, nprobe, rrfK, dfCap, shortlist))
  }
}
