package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted frames several queries share ([[ShingleSets]] and the LSH
  * signature table). Exposed as NAMED build entries so `graft.Bench` can
  * time each build as its own line item — otherwise the first query to
  * touch a memoized frame is billed for a build its siblings reuse
  * (q_ann_lsh was carrying the whole signature scan that
  * q_dedup_embedding reads for free), and per-query numbers misattribute
  * shared work. At true 100-TB scale these ARE separate jobs: you write
  * the shingle-set / signature tables once and every consumer reads them.
  */
object SharedCaches {

  /** (name, builder) for every shared frame, keyed like the consumers key
    * them: minhash + fingerprint share n=5 shingles, ngram uses n=3, the
    * ANN/embedding-dedup family shares the banded signatures.
    */
  def entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "prep_shingles_n5" -> ((s, d) => ShingleSets(s, d, 5)),
    "prep_shingles_n3" -> ((s, d) => ShingleSets(s, d, 3)),
    "prep_lsh_signatures" -> ((s, d) => AnnQueries.bandedSignatures(s, d)),
    "prep_ivf_centroids" -> ((s, d) => AnnQueries.ivfCentroidFrame(s, d)),
    "prep_trigram_counts" -> ((s, d) => TextQueries.triGramCounts(s, d)),
    "prep_streaming_dedup" -> ((s, d) => DedupQueries.streamingDedupDrive(s, d)),
    "prep_pq_index" -> ((s, d) => AnnQueries.pqCodeFrame(s, d)),
    "prep_cc_labels" -> ((s, d) => DedupQueries.clusterLabels(s, d)),
    "prep_train_vocab" -> ((s, d) => CurationQueries.trainVocabFrame(s, d)),
    // the lake build (3 changelog batches + compact + vacuum) that
    // q_lake_state / q_lake_asof read — a separate write job at scale
    "prep_lake" -> { (s, d) =>
      val sink = LakeQueries.lakeFor(s, d)
      import s.implicits._
      sink.committedBatchIds(s).toDF("batch_id")
    },
    // the maintained-view / maintained-join pipelines (their own lakes,
    // three churn batches with a refresh after each): at scale these are
    // long-lived maintenance jobs, not per-query work — q_mv / q_mj
    // measure the SERVED state read
    "prep_mv" -> ((s, d) => LakeQueries.mvOrders(s, d)),
    "prep_mj" -> ((s, d) => LakeQueries.mjOrders(s, d)))

  /** Drop every shared cache owned by the session (bench hygiene between
    * the warm-up corpus and the measured corpus).
    */
  def releaseAll(s: SparkSession): Unit = {
    ShingleSets.releaseAll(s)
    AnnQueries.releaseSignatures(s)
    AnnQueries.releaseCentroids(s)
    AnnQueries.releasePqCodebooks(s)
    AnnQueries.releaseSemanticAssign(s)
    DedupQueries.releaseClusterLabels(s)
    DedupQueries.releaseStreamingFlags(s)
    CurationQueries.releaseTrainVocab(s)
    TextQueries.releaseTrigrams(s)
  }
}
