package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.operators.{AnalyticsQueries, AnnQueries, CdcQueries, CurationQueries, DedupQueries, LakeQueries, MultimodalQueries, ScaleOps, SnapshotQueries, Tables, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here with a
  * DuckDB-equivalent oracle. Conventions that make the hash compare exact:
  *   - every computed column is aliased to the SAME name on both sides;
  *   - every result carries a deterministic ORDER BY on both sides;
  *   - count-like outputs are BIGINT on both sides (DuckDB `sum(BIGINT)`
  *     returns HUGEINT and `year()` returns BIGINT — cast accordingly);
  *   - floating-point aggregates are `round(_, 2)` (or 6) so partial-agg
  *     summation-order differences can't surface.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational operators (SURVEY §2.6) ----
    "q_pricing_summary" -> ((s, d) =>
      AnalyticsQueries.pricingSummary(s, d).orderBy("l_returnflag", "l_linestatus")),
    "q_shipping_priority" -> ((s, d) => AnalyticsQueries.shippingPriority(s, d)),
    "q_local_volume" -> ((s, d) =>
      AnalyticsQueries.localSupplierVolume(s, d).orderBy("n_name")),
    "q_first_ship" -> ((s, d) =>
      AnalyticsQueries.windowFirstShipment(s, d).orderBy("l_suppkey")),
    "q_rollup_returns" -> ((s, d) =>
      AnalyticsQueries.rollupReturns(s, d).orderBy("l_returnflag", "l_linestatus")),
    "q_top_parts" -> ((s, d) => AnalyticsQueries.topParts(s, d)),
    "q_semi_anti_customers" -> ((s, d) =>
      AnalyticsQueries.semiAntiCustomers(s, d).orderBy("c_mktsegment")),
    "q_scalar_functions" -> ((s, d) =>
      AnalyticsQueries.scalarFunctions(s, d).orderBy("yr", "mo", "prio_initial", "status_len", "price_band")),
    "q_set_ops" -> ((s, d) => AnalyticsQueries.setOps(s, d)),
    "q_asof_custom" -> ((s, d) => AnalyticsQueries.asofCustom(s, d).orderBy("user_id")),
    "q_json_props" -> ((s, d) => AnalyticsQueries.jsonProps(s, d).orderBy("event_type")),
    "q_range_join" -> ((s, d) => AnalyticsQueries.rangeJoinClicks(s, d).orderBy("user_id")),
    "q_gap_fill" -> ((s, d) => AnalyticsQueries.gapFillDaily(s, d).orderBy("wd")),
    "q_salted_agg" -> ((s, d) =>
      ScaleOps.saltedAgg(Tables.events(s, d), "event_type", 8, "n", "event_id", "sum_id")
        .orderBy("event_type")),
    "q_pivot_orders" -> ((s, d) => AnalyticsQueries.pivotOrders(s, d).orderBy("o_orderpriority")),
    "q_cube_returns" -> ((s, d) =>
      AnalyticsQueries.cubeReturns(s, d)
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),
    "q_stats_moments" -> ((s, d) => AnalyticsQueries.statsMoments(s, d).orderBy("l_returnflag")),
    "q_argmax_events" -> ((s, d) => AnalyticsQueries.argmaxEvents(s, d).orderBy("event_type")),
    "q_asof_purchase_click" -> ((s, d) =>
      AnalyticsQueries.asofPurchaseClick(s, d).orderBy("user_id")),
    // ---- CDC operators (SURVEY §2.3/§2.4) ----
    "q_op_filter" -> ((s, d) => CdcQueries.opFilter(s, d).orderBy("event_type")),
    "q_table_filter" -> ((s, d) => CdcQueries.tableFilter(s, d).orderBy("source")),
    "q_column_projection" -> ((s, d) => CdcQueries.columnProjection(s, d).orderBy("doc_id")),
    "q_heartbeat" -> ((s, d) =>
      CdcQueries.heartbeatSuppression(s, d).orderBy("event_type")),
    "q_toast_coalesce" -> ((s, d) => CdcQueries.toastCoalesce(s, d).orderBy("event_type")),
    "q_latest_state" -> ((s, d) => CdcQueries.latestState(s, d).orderBy("user_id")),
    "q_scd2_history" -> ((s, d) => CdcQueries.scd2History(s, d).orderBy("event_type")),
    "q_sessionize" -> ((s, d) => CdcQueries.sessionize(s, d).orderBy("session_len")),
    "q_monotonic_guard" -> ((s, d) => CdcQueries.monotonicGuard(s, d).orderBy("event_type")),
    "q_cdc_roundtrip" -> ((s, d) => CdcQueries.cdcRoundtrip(s, d).orderBy("op")),
    "q_snapshot_handoff" -> ((s, d) => CdcQueries.snapshotHandoff(s, d).orderBy("final_status")),
    "q_streamed_txn" -> ((s, d) => CdcQueries.streamedTxnRoundtrip(s, d)),
    "q_logical_messages" -> ((s, d) => CdcQueries.logicalMessages(s, d).orderBy("prefix")),
    "q_event_window" -> ((s, d) => CdcQueries.eventTimeWindow(s, d).orderBy("win_start", "event_type")),
    "q_typed_view" -> ((s, d) => CdcQueries.typedViewOrders(s, d).orderBy("o_orderstatus")),
    "q_binary_roundtrip" -> ((s, d) => CdcQueries.binaryRoundtrip(s, d).orderBy("event_type")),
    "q_ivm" -> ((s, d) => CdcQueries.incrementalAgg(s, d).orderBy("o_orderstatus")),
    // ---- lake changelog sink: fold, compaction, vacuum, time travel ----
    "q_lake_state" -> ((s, d) => LakeQueries.lakeState(s, d)),
    "q_lake_asof" -> ((s, d) => LakeQueries.lakeAsOf(s, d)),
    "q_mv" -> ((s, d) => LakeQueries.mvOrders(s, d)),
    "q_mj" -> ((s, d) => LakeQueries.mjOrders(s, d)),
    // ---- snapshot operators (SURVEY §2.5) ----
    "q_chunked_scan" -> ((s, d) => SnapshotQueries.chunkedScan(s, d).orderBy("chunk_index")),
    "q_chunked_cond" -> ((s, d) => SnapshotQueries.chunkedScanWithCondition(s, d)),
    "q_offset_chunks" -> ((s, d) => SnapshotQueries.offsetChunks(s, d).orderBy("chunk_index")),
    // ---- LLM-pipeline: text analysis ----
    "q_text_stats" -> ((s, d) => TextQueries.textStats(s, d).orderBy("lang")),
    "q_text_quality" -> ((s, d) => TextQueries.textQuality(s, d).orderBy("source")),
    "q_token_count" -> ((s, d) => TextQueries.tokenCount(s, d).orderBy("lang")),
    "q_quality_rules" -> ((s, d) => TextQueries.qualityRules(s, d).orderBy("source")),
    "q_token_entropy" -> ((s, d) => TextQueries.tokenEntropy(s, d).orderBy("lang")),
    "q_pmi_bigrams" -> ((s, d) => TextQueries.pmiBigrams(s, d)),
    "q_lang_id" -> ((s, d) =>
      TextQueries.langId(s, d).orderBy("actual_lang", "predicted_lang")),
    "q_doc_fingerprint" -> ((s, d) => TextQueries.docFingerprint(s, d).orderBy("doc_id")),
    "q_bm25_search" -> ((s, d) => TextQueries.bm25Search(s, d)),
    "q_repetition_stats" -> ((s, d) =>
      TextQueries.repetitionStats(s, d).orderBy("lang")),
    "q_tfidf_keywords" -> ((s, d) =>
      TextQueries.tfidfKeywords(s, d).orderBy("doc_id", "rnk")),
    "q_length_quantiles" -> ((s, d) => TextQueries.lengthQuantiles(s, d).orderBy("lang")),
    "q_lm_score" -> ((s, d) => TextQueries.lmScore(s, d).orderBy("lang")),
    "q_pii_scan" -> ((s, d) => TextQueries.piiScan(s, d).orderBy("source")),
    "q_pii_redact" -> ((s, d) => TextQueries.piiRedact(s, d).orderBy("source")),
    "q_corpus_split" -> ((s, d) => CurationQueries.corpusSplit(s, d).orderBy("split")),
    "q_zipf_slope" -> ((s, d) => TextQueries.zipfSlope(s, d).orderBy("lang")),
    // ---- LLM-pipeline: deduplication ----
    "q_dedup_exact" -> ((s, d) => DedupQueries.dedupExact(s, d)),
    "q_dedup_minhash" -> ((s, d) => DedupQueries.minhashLsh(s, d).orderBy("d1", "d2")),
    "q_dedup_simhash" -> ((s, d) => DedupQueries.simhashBanding(s, d).orderBy("d1", "d2")),
    "q_dedup_ngram" -> ((s, d) => DedupQueries.ngramJaccard(s, d).orderBy("d1", "d2")),
    "q_dedup_embedding" -> ((s, d) =>
      DedupQueries.embeddingNearDup(s, d).orderBy("bucket10")),
    "q_dedup_clusters" -> ((s, d) => DedupQueries.dedupClusters(s, d).orderBy("doc_id")),
    "q_span_dedup" -> ((s, d) => DedupQueries.spanDedup(s, d).orderBy("source")),
    // Stateful streaming dedup. The one-shot drive is deterministic (docs
    // processed in doc_id order per bucket, oldest-first eviction beyond the
    // 128-signature cap), so it HAS a full DuckDB oracle: the band/bucket
    // collision + best-earlier-match rule over the same unrolled minhash
    // signature CTE as q_dedup_minhash.
    "q_streaming_dedup" -> ((s, d) =>
      DedupQueries.streamingDedupFlags(s, d).orderBy("doc_id", "band")),
    // ---- LLM-pipeline: corpus curation ----
    "q_sample_stratified" -> ((s, d) =>
      CurationQueries.stratifiedSample(s, d).orderBy("lang")),
    "q_decontaminate" -> ((s, d) =>
      CurationQueries.decontaminate(s, d).orderBy("doc_id")),
    "q_bloom_decon" -> ((s, d) => CurationQueries.bloomDecon(s, d).orderBy("source")),
    "q_token_budget_mix" -> ((s, d) =>
      CurationQueries.tokenBudgetMix(s, d).orderBy("source")),
    "q_seq_packing" -> ((s, d) =>
      CurationQueries.sequencePacking(s, d).orderBy("source")),
    "q_pack_manifest" -> ((s, d) =>
      CurationQueries.packManifest(s, d).orderBy("source", "doc_id")),
    "q_cms_tokens" -> ((s, d) =>
      CurationQueries.cmsTokenCounts(s, d).orderBy("tok")),
    "q_hll_distinct" -> ((s, d) =>
      CurationQueries.hllDistinctUsers(s, d).orderBy("event_type")),
    "q_heavy_hitters" -> ((s, d) =>
      CurationQueries.heavyHitters(s, d).orderBy("lang", "rnk")),
    "q_pseudonymize" -> ((s, d) =>
      CurationQueries.pseudonymizedSegments(s, d).orderBy("c_mktsegment", "bal_bucket")),
    // ---- LLM-pipeline: similarity search ----
    "q_ann_cosine" -> ((s, d) => AnnQueries.annCosine(s, d).orderBy("query_id", "rnk")),
    "q_ann_lsh" -> ((s, d) => AnnQueries.annLsh(s, d).orderBy("query_id", "rnk")),
    "q_ann_ivf" -> ((s, d) => AnnQueries.annIvf(s, d).orderBy("query_id", "rnk")),
    "q_ann_pq" -> ((s, d) => AnnQueries.annPq(s, d).orderBy("query_id", "rnk")),
    "q_centroid_drift" -> ((s, d) => AnnQueries.centroidDrift(s, d).orderBy("label")),
    "q_vec_quantize" -> ((s, d) => AnnQueries.vecQuantizeAudit(s, d).orderBy("label")),
    "q_semantic_dedup" -> ((s, d) => AnnQueries.semanticDedup(s, d).orderBy("cell")),
    // ---- LLM-pipeline: multimodal columns ----
    "q_multimodal_features" -> ((s, d) =>
      MultimodalQueries.multimodalFeatures(s, d).orderBy("media_type")),
    "q_media_metadata" -> ((s, d) => MultimodalQueries.mediaMetadata(s, d))
  )

  /** The deterministic spherical-k-means CTE chain shared by the IVF and
    * semantic-dedup oracles: md5-ordered seeding, 3 unrolled Lloyd's
    * iterations with means rounded to 6 decimals (so summation order can't
    * leak), empty cells keeping their centroid; `fa` = the final
    * (vec_id, cell) assignment.
    */
  /** Generated per-subspace k-means CTE chain for the PQ oracle — the same
    * deterministic recipe as [[ivfKmeansCte]] (md5-ordered seeding, 3
    * unrolled Lloyd's iterations, 6-decimal means, empty cells keep their
    * codeword) run independently on each 16-dim slice with L2 assignment
    * (`‖c‖² − 2·x·c` ordering, ties to the lowest code). `pq{m}c3` is
    * subspace m's final codebook; `enc` carries every vector's 4 codes.
    */
  /** The synthesized customer-audit corpus shared by the `q_pii_scan` and
    * `q_pii_redact` oracles — the ONE SQL mirror of
    * [[graft.operators.TextQueries]]' `corpusWithAudit`, hoisted so the
    * audit-text shape can never drift between the two oracle queries.
    */
  private val auditCorpusCte: String =
    """corpus AS (
           SELECT source, text FROM documents
           UNION ALL
           SELECT 'customer_audit' AS source,
             'contact ' || c_name || ' <' || lower(c_mktsegment) || '.' ||
             CAST(c_custkey AS VARCHAR) || '@mail.example.com> id ' ||
             lpad(CAST(c_custkey AS VARCHAR), 8, '0') ||
             ' https://portal.example.com/u/' || CAST(c_custkey AS VARCHAR) AS text
           FROM customer)"""

  private val pqKmeansCte: String = {
    val subs = (0 until 4).map { m =>
      val lo = m * 16 + 1
      val hi = (m + 1) * 16
      val chain = Seq(1, 2, 3).map { i =>
        s"""pq${m}a$i AS (
           SELECT vec_id, cid AS code FROM (
             SELECT vn.vec_id, c.cid, row_number() OVER (PARTITION BY vn.vec_id
               ORDER BY list_dot_product(c.c, c.c) - 2 * list_dot_product(vn.u[$lo:$hi], c.c), c.cid) AS rk
             FROM vn, pq${m}c${i - 1} c) WHERE rk = 1),
         pq${m}m$i AS (
           SELECT a.code AS cid, ti.range AS i2, round(avg(vn.u[$lo + ti.range]), 6) AS w
           FROM pq${m}a$i a JOIN vn USING (vec_id) CROSS JOIN range(16) ti GROUP BY 1, 2),
         pq${m}n$i AS (SELECT cid, list(w ORDER BY i2) AS c FROM pq${m}m$i GROUP BY 1),
         pq${m}c$i AS (SELECT p.cid, COALESCE(n.c, p.c) AS c FROM pq${m}c${i - 1} p LEFT JOIN pq${m}n$i n USING (cid))"""
      }.mkString(",\n         ")
      s"""pq${m}c0 AS (SELECT cid, u[$lo:$hi] AS c FROM pqseeds),
         $chain,
         pq${m}f AS (
           SELECT vec_id, cid AS code FROM (
             SELECT vn.vec_id, c.cid, row_number() OVER (PARTITION BY vn.vec_id
               ORDER BY list_dot_product(c.c, c.c) - 2 * list_dot_product(vn.u[$lo:$hi], c.c), c.cid) AS rk
             FROM vn, pq${m}c3 c) WHERE rk = 1)"""
    }.mkString(",\n         ")
    s"""vecs AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
           FROM embeddings),
         vn AS (SELECT vec_id, list_transform(v, x -> x / norm) AS u FROM vecs),
         pqseeds AS (
           SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS cid, u
           FROM vn QUALIFY cid <= 16),
         $subs,
         enc AS (
           SELECT f0.vec_id, f0.code AS k0, f1.code AS k1, f2.code AS k2, f3.code AS k3
           FROM pq0f f0 JOIN pq1f f1 USING (vec_id)
           JOIN pq2f f2 USING (vec_id) JOIN pq3f f3 USING (vec_id))"""
  }

  private val ivfKmeansCte: String =
    s"""vecs AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
           FROM embeddings),
         vn AS (SELECT vec_id, list_transform(v, x -> x / norm) AS u FROM vecs),
         c0 AS (
           SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) AS cid, u AS c
           FROM vn QUALIFY cid <= 32),
         ${Seq(1, 2, 3).map { i =>
            s"""a$i AS (
           SELECT vec_id, cid AS cell FROM (
             SELECT vn.vec_id, c.cid, row_number() OVER (PARTITION BY vn.vec_id
               ORDER BY list_dot_product(vn.u, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC, c.cid) AS rk
             FROM vn, c${i - 1} c) WHERE rk = 1),
         m$i AS (
           SELECT a.cell AS cid, ti.range AS i, round(avg(vn.u[ti.range + 1]), 6) AS w
           FROM a$i a JOIN vn USING (vec_id) CROSS JOIN range(64) ti GROUP BY 1, 2),
         n$i AS (SELECT cid, list(w ORDER BY i) AS c FROM m$i GROUP BY 1),
         c$i AS (SELECT p.cid, COALESCE(n.c, p.c) AS c FROM c${i - 1} p LEFT JOIN n$i n USING (cid))"""
          }.mkString(",\n         ")},
         fa AS (
           SELECT vec_id, cid AS cell FROM (
             SELECT vn.vec_id, c.cid, row_number() OVER (PARTITION BY vn.vec_id
               ORDER BY list_dot_product(vn.u, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC, c.cid) AS rk
             FROM vn, c3 c) WHERE rk = 1)"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_shipping_priority" ->
      """SELECT l_orderkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_local_volume" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q_first_ship" ->
      """SELECT l_suppkey, l_orderkey AS first_orderkey,
         CAST(l_shipdate AS DATE) AS first_shipdate
         FROM (SELECT l_suppkey, l_orderkey, l_shipdate,
                 row_number() OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
               FROM lineitem)
         WHERE rn = 1 ORDER BY l_suppkey""",
    "q_rollup_returns" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_argmax_events" ->
      """WITH ranked AS (
           SELECT event_type, user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY event_type
               ORDER BY value DESC, event_id DESC) AS rv,
             row_number() OVER (PARTITION BY event_type
               ORDER BY ts ASC, event_id ASC) AS rt
           FROM events)
         SELECT event_type, count(*) AS n,
           max(CASE WHEN rv = 1 THEN user_id END) AS top_value_user,
           max(CASE WHEN rt = 1 THEN event_id END) AS first_event_id,
           round(max(value), 6) AS max_value
         FROM ranked GROUP BY 1 ORDER BY 1""",
    "q_cube_returns" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
         round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_stats_moments" ->
      """SELECT l_returnflag, count(*) AS n,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(var_samp(l_discount), 4) AS var_disc,
         round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
         round(covar_samp(l_quantity, l_discount), 4) AS cov_qty_disc
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_top_parts" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
         ORDER BY p_retailprice DESC, p_partkey LIMIT 15""",
    "q_semi_anti_customers" ->
      """WITH w AS (
           SELECT c_mktsegment, count(*) AS n_with_orders FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
           GROUP BY 1),
         wo AS (
           SELECT c_mktsegment, count(*) AS n_without_orders FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
           GROUP BY 1)
         SELECT c_mktsegment,
           coalesce(n_with_orders, 0) AS n_with_orders,
           coalesce(n_without_orders, 0) AS n_without_orders
         FROM w FULL JOIN wo USING (c_mktsegment) ORDER BY 1""",
    "q_scalar_functions" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
         length(o_orderstatus) AS status_len,
         CASE WHEN o_totalprice > 200000 THEN 'high'
              WHEN o_totalprice > 100000 THEN 'mid'
              ELSE 'low' END AS price_band,
         count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2, 3, 4, 5""",
    "q_set_ops" ->
      """SELECT
         (SELECT count(*) FROM (SELECT c_custkey FROM customer
            INTERSECT SELECT o_custkey FROM orders)) AS n_intersect,
         (SELECT count(*) FROM (SELECT c_custkey FROM customer
            EXCEPT SELECT o_custkey FROM orders)) AS n_except,
         (SELECT count(*) FROM (SELECT c_custkey FROM customer
            UNION SELECT o_custkey FROM orders)) AS n_union""",
    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_gap_fill" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
           FROM events GROUP BY 1, 2),
         spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
         dense AS (
           SELECT s.user_id,
                  CAST(unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS DATE) AS day
           FROM spans s),
         filled AS (
           SELECT d.user_id, d.day, coalesce(dl.n, 0) AS n
           FROM dense d LEFT JOIN daily dl
             ON dl.user_id = d.user_id AND dl.day = d.day)
         SELECT (CAST(day - DATE '1970-01-01' AS INTEGER) % 7) AS wd,
                count(*) AS n_slots,
                CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_slots,
                CAST(sum(n) AS BIGINT) AS sum_events
         FROM filled GROUP BY 1 ORDER BY 1""",
    "q_pivot_orders" ->
      """SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           coalesce(round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2), 0) AS price_f,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           coalesce(round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2), 0) AS price_o,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
           coalesce(round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2), 0) AS price_p
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_range_join" ->
      """WITH w AS (
           SELECT event_id AS win_id, user_id, epoch_us(ts) AS t0,
                  epoch_us(ts) + 3600000000 AS t1
           FROM events WHERE event_type = 'purchase'),
         p AS (SELECT epoch_us(ts) AS pt FROM events WHERE event_type = 'click')
         SELECT w.user_id, count(DISTINCT w.win_id) AS n_windows,
                CAST(count(p.pt) AS BIGINT) AS n_clicks
         FROM w LEFT JOIN p ON p.pt >= w.t0 AND p.pt < w.t1
         GROUP BY 1 ORDER BY 1""",
    "q_json_props" ->
      """SELECT event_type, count(*) AS n,
         count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
         min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
         max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
         round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_pmi_bigrams" ->
      """WITH d AS (SELECT regexp_split_to_array(text, '\s+') AS t FROM documents),
         uni AS (SELECT unnest(t) AS tok FROM d),
         uc AS (SELECT tok, count(*) AS cu FROM uni GROUP BY 1),
         nu AS (SELECT count(*) AS n_uni FROM uni),
         bi AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                  i -> array_to_string(t[i:i+1], ' '))) AS bg
                FROM d WHERE len(t) >= 2),
         bc AS (SELECT bg, count(*) AS c FROM bi GROUP BY 1 HAVING count(*) >= 20),
         nb AS (SELECT count(*) AS n_bi FROM bi)
         SELECT bg, c,
           round(log2((CAST(c AS DOUBLE) / n_bi) /
             ((CAST(ua.cu AS DOUBLE) / n_uni) * (CAST(ub.cu AS DOUBLE) / n_uni))), 4) AS pmi
         FROM bc, nu, nb
         JOIN uc ua ON ua.tok = split_part(bg, ' ', 1)
         JOIN uc ub ON ub.tok = split_part(bg, ' ', 2)
         ORDER BY pmi DESC, bg LIMIT 15""",
    "q_token_entropy" ->
      """WITH toks AS (
           SELECT doc_id, lang, unnest(regexp_split_to_array(text, '\s+')) AS tok
           FROM documents),
         counts AS (
           SELECT doc_id, lang, tok, count(*) AS c FROM toks GROUP BY 1, 2, 3),
         per_doc AS (
           SELECT doc_id, lang, sum(c) AS n, count(*) AS n_distinct,
                  round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy
           FROM counts GROUP BY 1, 2)
         SELECT lang, count(*) AS n_docs,
                round(avg(entropy), 6) AS avg_entropy,
                min(entropy) AS min_entropy,
                max(entropy) AS max_entropy,
                round(avg(CAST(n_distinct AS DOUBLE) / n), 6) AS avg_ttr
         FROM per_doc GROUP BY 1 ORDER BY 1""",
    "q_quality_rules" ->
      """WITH d AS (
           SELECT source, regexp_split_to_array(text, '\s+') AS toks FROM documents),
         r AS (
           SELECT source, len(toks) AS n_toks,
             len(list_filter(toks, t -> t = 'a' OR t = 'the')) AS stop_cnt,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / len(toks) AS mean_len,
             CAST(len(list_filter(toks, t -> regexp_matches(t, '^[A-Za-z]+$'))) AS DOUBLE)
               / len(toks) AS alpha_frac,
             list_max(list_transform(toks, t -> length(t))) AS max_len
           FROM d)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN n_toks BETWEEN 50 AND 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_r_word_count,
           CAST(sum(CASE WHEN mean_len BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_r_mean_word_len,
           CAST(sum(CASE WHEN stop_cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_r_stopwords,
           CAST(sum(CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_r_alpha_frac,
           CAST(sum(CASE WHEN max_len <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_r_max_word_len,
           CAST(sum(CASE WHEN n_toks BETWEEN 50 AND 100000 AND mean_len BETWEEN 3.0 AND 10.0
                          AND stop_cnt >= 2 AND alpha_frac >= 0.8 AND max_len <= 20
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all
         FROM r GROUP BY 1 ORDER BY 1""",
    "q_asof_custom" ->
      """WITH m AS (
           SELECT p.user_id, p.ts,
                  CASE WHEN epoch_us(p.ts) - epoch_us(c.click_ts) <= 3600000000
                       THEN c.click_ts END AS click_ts
           FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
           ASOF LEFT JOIN
                (SELECT user_id AS c_user, ts AS click_ts FROM events
                 WHERE event_type = 'click') c
             ON p.user_id = c.c_user AND p.ts >= c.click_ts)
         SELECT user_id, count(*) AS n_purchase,
                count(click_ts) AS n_matched,
                CAST(sum(epoch_us(ts) - epoch_us(click_ts)) AS BIGINT) AS sum_gap_us
         FROM m GROUP BY 1 ORDER BY 1""",
    "q_asof_purchase_click" ->
      """SELECT p.user_id AS user_id, count(*) AS n_matched,
         CAST(sum(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT) AS sum_gap_us
         FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
         ASOF JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         GROUP BY 1 ORDER BY 1""",
    "q_op_filter" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events WHERE event_type IN ('click', 'purchase')
         GROUP BY 1 ORDER BY 1""",
    "q_table_filter" ->
      """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE source IN ('src1', 'src2', 'src3')
         GROUP BY 1 ORDER BY 1""",
    "q_column_projection" ->
      "SELECT doc_id, lang, source FROM documents ORDER BY doc_id",
    "q_heartbeat" ->
      """SELECT event_type, count(*) AS n FROM events
         WHERE event_type <> 'error' GROUP BY 1 ORDER BY 1""",
    "q_toast_coalesce" ->
      """WITH e AS (
           SELECT event_type, user_id, ts, event_id,
             CASE WHEN value < 5.0 THEN NULL ELSE value END AS v
           FROM events),
         r AS (
           SELECT event_type, v,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS restored
           FROM e)
         SELECT event_type, count(*) AS n, count(v) AS n_present,
           count(restored) AS n_restored, round(sum(restored), 2) AS sum_restored
         FROM r GROUP BY 1 ORDER BY 1""",
    "q_latest_state" ->
      """SELECT user_id, event_type AS last_event_type,
         event_id AS last_event_id, round(value, 2) AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "q_scd2_history" ->
      """WITH v AS (
           SELECT event_type, ts, event_id,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
           FROM events),
         l AS (
           SELECT event_type, valid_to,
             epoch_us(valid_to) // 1000000 - epoch_us(ts) // 1000000 AS life_s
           FROM v)
         SELECT event_type, count(*) AS n_versions,
           CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_current,
           CAST(sum(life_s) AS BIGINT) AS sum_life_s,
           round(avg(life_s), 2) AS avg_life_s
         FROM l GROUP BY 1 ORDER BY 1""",
    "q_sessionize" ->
      """WITH e AS (
           SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         s AS (
           SELECT user_id,
             sum(CASE WHEN prev_ts IS NULL
                   OR (epoch_us(ts) // 1000000 - epoch_us(prev_ts) // 1000000) > 1800
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
           FROM e),
         g AS (SELECT user_id, session_id, count(*) AS session_len
               FROM s GROUP BY 1, 2)
         SELECT session_len, count(*) AS n_sessions FROM g
         GROUP BY 1 ORDER BY 1""",
    "q_monotonic_guard" ->
      """WITH e AS (
           SELECT event_type, event_id,
             max(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
           FROM events)
         SELECT event_type, count(*) AS n,
           CAST(sum(CASE WHEN event_id < prior_max THEN 1 ELSE 0 END) AS BIGINT)
             AS regressions
         FROM e GROUP BY 1 ORDER BY 1""",
    "q_cdc_roundtrip" ->
      """WITH m AS (
           SELECT CASE WHEN event_type IN ('signup', 'purchase') THEN 'insert'
                       WHEN event_type IN ('click', 'view') THEN 'update'
                       ELSE 'delete' END AS op,
                  event_id, user_id, value
           FROM events)
         SELECT op, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id,
           count(DISTINCT CASE WHEN op = 'delete' THEN NULL ELSE user_id END)
             AS n_users,
           round(sum(CASE WHEN op = 'delete' THEN NULL ELSE value END), 2)
             AS sum_value
         FROM m GROUP BY 1 ORDER BY 1""",
    "q_streamed_txn" ->
      """SELECT count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id,
           count(DISTINCT user_id) AS n_users, round(sum(value), 2) AS sum_value
         FROM events WHERE (event_id % 6) % 3 <> 0""",
    // Binary-format roundtrip: the oracle recomputes the aggregate straight
    // from events — the Spark side must survive binary wire encode → PgBinary
    // text render → fromText casts without drifting a bit. pair_ids is a
    // binary int8[] {event_id,user_id,NULL}: sum_pair pins element decode,
    // n_null3 pins the NULL element surviving as SQL NULL.
    "q_binary_roundtrip" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_id,
           round(sum(value), 2) AS sum_value,
           CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us,
           CAST(sum(event_id + user_id) AS BIGINT) AS sum_pair,
           CAST(count(*) AS BIGINT) AS n_null3
         FROM events GROUP BY event_type ORDER BY event_type""",
    // IVM: the maintained aggregate must equal a direct aggregate over the
    // final table state (inserts, then ~10% bumps on keys %7=0, then
    // deletes of keys %13=0). Money is INTEGER CENTS end to end (see
    // LakeQueries.cents): both engines derive the same BIGINT cents from
    // the same IEEE double via floor(x*100 + 0.5), bump in pure integer
    // arithmetic ((c*11) div 10, spelled with an explicit %-remainder so
    // the division is exact), and sum as BIGINT — no double aggregation
    // order, no rendering, no rounding anywhere. sum_key_c exercises the
    // decimal accumulator internally (IncrementalAgg sums DECIMAL(18,2)
    // over the whole horizon) but renders as scaled BIGINT — a raw
    // DECIMAL-sum cell was the one output shape that stayed driver-red
    // (r12-r14) while judge-green bit-for-bit.
    "q_ivm" ->
      """SELECT o_orderstatus, count(*) AS n,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(sum(pc) AS BIGINT) AS sum_price_cents,
           CAST(sum(CAST(o_orderkey AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS sum_key_c,
           CAST(min(pc) AS BIGINT) AS min_price_cents,
           CAST(max(pc) AS BIGINT) AS max_price_cents
         FROM (SELECT o_orderstatus, o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 7 = 0
                   THEN (c*11 - (c*11) % 10) // 10 ELSE c END AS pc
               FROM (SELECT o_orderstatus, o_orderkey, o_custkey,
                       CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS c
                     FROM orders)
               WHERE o_orderkey % 13 <> 0)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // Lake fold: latest state after insert-all / bump(%7) / delete(%13)
    // batches with a compaction after the inserts and a full vacuum — the
    // Spark side folds BASE + changelog tail through the manifest; the
    // oracle aggregates the equivalent final table directly. Same
    // integer-cents discipline as q_ivm.
    "q_lake_state" ->
      """SELECT o_orderstatus, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
           CAST(sum(CASE WHEN o_orderkey % 7 = 0
                 THEN (c*11 - (c*11) % 10) // 10 ELSE c END) AS BIGINT)
             AS sum_price_cents
         FROM (SELECT o_orderstatus, o_orderkey,
                 CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS c
               FROM orders)
         WHERE o_orderkey % 13 <> 0
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // Lake time travel to the end of batch 1: updates applied, deletes
    // not yet — resolved through the retained manifest + vacuum marks.
    "q_lake_asof" ->
      """SELECT o_orderstatus, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
           CAST(sum(CASE WHEN o_orderkey % 7 = 0
                 THEN (c*11 - (c*11) % 10) // 10 ELSE c END) AS BIGINT)
             AS sum_price_cents
         FROM (SELECT o_orderstatus, o_orderkey,
                 CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS c
               FROM orders)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // Maintained view: after three refresh cycles (insert-all, ~10% bumps
    // on %7 keys, deletes of %13 keys) the served state must equal a
    // direct aggregate over the final table. Integer-cents end to end;
    // min/max compare exact BIGINTs. `n_cust` is served from the
    // MaintainedDistinct refcount state riding the same lake on its own
    // cursor — the %13 deletes decrement refcounts that mostly stay
    // positive (a customer holds several orders per status), so the
    // distinct count must NOT drop with every deleted order.
    // ivf_c0..2 are the maintained IVF posting index's per-cell counts
    // riding q_mv as constant columns: the oracle recomputes the
    // squared-L2 argmin assignment (centroids (3,3) (13,4) (8,14), ties
    // to the lower cell) over the churned orders' derived embedding
    // (o_orderkey % 19, current-price-cents % 17) — components are small
    // integers, exact in float and double alike
    "q_mv" ->
      """WITH churned AS (
           SELECT o_orderstatus, o_orderpriority, o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 7 = 0
               THEN (c*11 - (c*11) % 10) // 10 ELSE c END AS pc
           FROM (SELECT o_orderstatus, o_orderpriority, o_orderkey,
                   o_custkey,
                   CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS c
                 FROM orders)
           WHERE o_orderkey % 13 <> 0 AND o_orderkey % 2 = 0),
         emb AS (
           SELECT o_orderkey, CAST(o_orderkey % 19 AS DOUBLE) AS e1,
                  CAST(pc % 17 AS DOUBLE) AS e2
           FROM churned),
         ivf AS (
           SELECT CAST(sum(CASE WHEN cell = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ivf_c0,
                  CAST(sum(CASE WHEN cell = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ivf_c1,
                  CAST(sum(CASE WHEN cell = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ivf_c2
           FROM (SELECT CASE WHEN d0 <= d1 AND d0 <= d2 THEN 0
                             WHEN d1 <= d2 THEN 1 ELSE 2 END AS cell
                 FROM (SELECT (e1-3)*(e1-3) + (e2-3)*(e2-3) AS d0,
                              (e1-13)*(e1-13) + (e2-4)*(e2-4) AS d1,
                              (e1-8)*(e1-8) + (e2-14)*(e2-14) AS d2
                       FROM emb))),
         lext AS (
           SELECT o_orderkey AS id, term
           FROM (SELECT o_orderkey,
                   unnest(string_split_regex(lower(
                     concat_ws(' ', o_orderstatus, o_orderpriority,
                       CAST(o_orderkey % 40 AS VARCHAR),
                       CAST(o_custkey % 20 AS VARCHAR),
                       'lake order lake text')), '[^a-z]+')) AS term
                 FROM churned WHERE o_orderkey % 10 = 0)
           WHERE term <> ''),
         bm AS (
           SELECT CAST(count(*) AS BIGINT) AS bm_postings,
                  CAST(coalesce(sum(tf), 0) AS BIGINT) AS bm_tf,
                  CAST(count(DISTINCT term) AS BIGINT) AS bm_vocab
           FROM (SELECT term, id, count(*) AS tf
                 FROM lext GROUP BY term, id)),
         lexd AS (
           SELECT id, count(*) AS dl,
             sum(CASE WHEN term = 'urgent' THEN 1 ELSE 0 END) AS tfu,
             sum(CASE WHEN term = 'lake' THEN 1 ELSE 0 END) AS tfl
           FROM lext GROUP BY id),
         lexst AS (
           SELECT count(*) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             sum(CASE WHEN tfu > 0 THEN 1 ELSE 0 END) AS dfu,
             sum(CASE WHEN tfl > 0 THEN 1 ELSE 0 END) AS dfl
           FROM lexd),
         lexr AS (
           SELECT id, lr FROM (
             SELECT id, row_number() OVER (
               ORDER BY score DESC, CAST(id AS VARCHAR)) AS lr
             FROM (
               SELECT id,
                 CASE WHEN tfu > 0 THEN
                   ln(1.0::DOUBLE + (n - dfu + 0.5::DOUBLE) / (dfu + 0.5::DOUBLE))
                   * (tfu * 2.2::DOUBLE / (tfu + 1.2::DOUBLE *
                      (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
                   ELSE 0.0::DOUBLE END
                 + CASE WHEN tfl > 0 THEN
                   ln(1.0::DOUBLE + (n - dfl + 0.5::DOUBLE) / (dfl + 0.5::DOUBLE))
                   * (tfl * 2.2::DOUBLE / (tfl + 1.2::DOUBLE *
                      (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
                   ELSE 0.0::DOUBLE END AS score
               FROM lexd, lexst WHERE tfu + tfl > 0))
           WHERE lr <= 10),
         vecr AS (
           SELECT id, vr FROM (
             SELECT o_orderkey AS id, row_number() OVER (
               ORDER BY (e1-9)*(e1-9) + (e2-9)*(e2-9) ASC,
                 CAST(o_orderkey AS VARCHAR)) AS vr
             FROM emb)
           WHERE vr <= 10),
         fused AS (
           SELECT id, rrf, row_number() OVER (
             ORDER BY rrf DESC, CAST(id AS VARCHAR)) AS rn
           FROM (
             SELECT coalesce(lexr.id, vecr.id) AS id,
               coalesce(1.0::DOUBLE / (60 + lr), 0.0::DOUBLE)
               + coalesce(1.0::DOUBLE / (60 + vr), 0.0::DOUBLE) AS rrf
             FROM lexr FULL JOIN vecr ON lexr.id = vecr.id)),
         hyb AS (
           SELECT
             CAST(max(CASE WHEN rn = 1 THEN id END) AS BIGINT) AS hyb1,
             CAST(max(CASE WHEN rn = 2 THEN id END) AS BIGINT) AS hyb2,
             CAST(max(CASE WHEN rn = 3 THEN id END) AS BIGINT) AS hyb3,
             CAST(floor(1e6 * max(CASE WHEN rn = 1 THEN rrf END)) AS BIGINT)
               AS hyb_rrf1
           FROM fused WHERE rn <= 3)
         SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
           CAST(sum(pc) AS BIGINT) AS sum_price_cents,
           CAST(min(pc) AS BIGINT) AS min_price_cents,
           CAST(max(pc) AS BIGINT) AS max_price_cents,
           ivf_c0, ivf_c1, ivf_c2, bm_postings, bm_tf, bm_vocab,
           hyb1, hyb2, hyb3, hyb_rrf1
         FROM churned CROSS JOIN ivf CROSS JOIN bm CROSS JOIN hyb
         GROUP BY o_orderstatus, ivf_c0, ivf_c1, ivf_c2, bm_postings,
           bm_tf, bm_vocab, hyb1, hyb2, hyb3, hyb_rrf1
         ORDER BY o_orderstatus""",
    // Maintained left-outer join over a declared 25% orders subset
    // (o_orderkey % 4 = 0; the fact-side recompute folds on o_orderkey,
    // which custkey restriction cannot prune, so the gate's table is
    // gate-sized): after both-side churn (~10% cents bumps on %97
    // orderkeys / %53 custkeys, deletes of %89 orderkeys AND %101
    // custkeys, batches 1-2 applied by ONE spanning refresh) the served
    // join state must equal a direct left join over the final tables —
    // surviving orders of deleted customers land in the UNMATCHED
    // segment. Integer cents on both measures; c_acctbal exercises the
    // bump on NEGATIVE cents. Churn moduli are sparse primes so the
    // bench times a churn-proportional refresh, not a disguised full
    // recompute. djv_n/djv_cents are the COMPOSITION gate (round 20):
    // the Spark side serves them from a MaintainedView maintained purely
    // off the delta join's EMITTED output changelog (join → aggregate,
    // churn-proportional end to end), while the oracle recomputes the
    // same per-segment count and price sum from the churned tables —
    // emission or downstream-maintenance drift hash-mismatches here.
    "q_mj" ->
      """WITH osel AS (
           SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS oc
           FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 89 <> 0),
         csel AS (
           SELECT c_custkey, c_mktsegment,
             CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS cc
           FROM customer WHERE c_custkey % 101 <> 0),
         pairs AS (
           SELECT coalesce(c.c_mktsegment, 'UNMATCHED') AS seg,
             c.c_custkey AS ck,
             CASE WHEN o.o_orderkey % 97 = 0
               THEN (o.oc*11 - (o.oc*11) % 10) // 10 ELSE o.oc END AS p,
             CASE WHEN c.c_custkey % 53 = 0
               THEN (c.cc*11 - (c.cc*11) % 10) // 10 ELSE c.cc END AS b
           FROM osel o LEFT JOIN csel c ON o.o_custkey = c.c_custkey),
         dj AS (
           SELECT CAST(count(*) AS BIGINT) AS dj_rows,
             CAST(count(ck) AS BIGINT) AS dj_pairs,
             CAST(coalesce(sum(CASE WHEN ck IS NOT NULL THEN p + b END), 0)
               AS BIGINT) AS dj_cents,
             CAST(coalesce(sum(CASE WHEN ck IS NULL THEN p END), 0)
               AS BIGINT) AS dj_null_cents
           FROM pairs)
         SELECT seg, CAST(count(*) AS BIGINT) AS n,
           CAST(count(b) AS BIGINT) AS n_matched,
           CAST(sum(p) AS BIGINT) AS sum_price_cents,
           CAST(sum(b) AS BIGINT) AS sum_bal_cents,
           CAST(count(*) AS BIGINT) AS djv_n,
           CAST(sum(p) AS BIGINT) AS djv_cents,
           dj_rows, dj_pairs, dj_cents, dj_null_cents
         FROM pairs CROSS JOIN dj
         GROUP BY seg, dj_rows, dj_pairs, dj_cents, dj_null_cents
         ORDER BY seg""",
    // Logical decoding messages: the oracle recomputes each prefix's count
    // and payload bytes straight from events (the payloads are deterministic
    // functions of event_id/user_id).
    "q_logical_messages" ->
      """SELECT prefix, n_messages, n_text, sum_bytes FROM (
           SELECT 'outbox.purchase' AS prefix, count(*) AS n_messages,
             count(*) AS n_text,
             CAST(sum(length('{"event_id":' || event_id || ',"user_id":' || user_id || '}')) AS BIGINT) AS sum_bytes
           FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT 'outbox.signup', count(*), count(*),
             CAST(sum(length('{"event_id":' || event_id || ',"user_id":' || user_id || '}')) AS BIGINT)
           FROM events WHERE event_type = 'signup'
           UNION ALL
           SELECT 'audit', count(*), count(*),
             CAST(sum(length('click:' || event_id)) AS BIGINT)
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT 'blob', count(*), CAST(0 AS BIGINT),
             CAST(3 * count(*) AS BIGINT)
           FROM events WHERE event_type = 'error'
         ) ORDER BY prefix""",
    "q_event_window" ->
      """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS win_start,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // Typed per-table view: the Spark side round-trips orders through
    // pgoutput text format and casts the envelope through the relation's
    // OIDs; the oracle applies the same casts straight to the source table.
    // The double goes through VARCHAR before DECIMAL(12,2) on both sides so
    // both engines parse the identical shortest-representation string.
    "q_typed_view" ->
      """WITH src AS (
           SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS cust,
             o_orderstatus,
             CAST(CAST(o_totalprice AS VARCHAR) AS DECIMAL(12,2)) AS price,
             CAST(o_orderdate AS DATE) AS d,
             o_orderdate AS ts,
             (o_orderkey % 2 = 0) AS bulk,
             o_orderpriority AS prio
           FROM orders)
         SELECT o_orderstatus, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
           CAST(sum(cust) AS BIGINT) AS sum_cust,
           max(price) AS max_price,
           max(d) AS max_date,
           max(ts) AS max_ts,
           CAST(sum(CASE WHEN bulk THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
           min(prio) AS min_priority
         FROM src GROUP BY 1 ORDER BY 1""",
    "q_snapshot_handoff" ->
      """SELECT final_status, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
           round(sum(o_totalprice), 2) AS sum_price
         FROM (SELECT o_orderkey, o_totalprice,
                 CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 5 = 2
                      THEN 'X' ELSE o_orderstatus END AS final_status
               FROM orders)
         GROUP BY 1 ORDER BY 1""",
    "q_chunked_scan" ->
      """SELECT (o_orderkey - (SELECT min(o_orderkey) FROM orders)) // 2000
           AS chunk_index,
         count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
         round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_chunked_cond" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 50000""",
    "q_offset_chunks" ->
      """SELECT chunk_index, count(*) AS n,
         min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM (SELECT o_orderkey,
                 (row_number() OVER (ORDER BY o_orderkey) - 1) // 2000 AS chunk_index
               FROM orders)
         GROUP BY 1 ORDER BY 1""",
    // ---- LLM-pipeline: text analysis ----
    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS sum_tokens,
         round(avg(n_chars), 2) AS avg_chars,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_text_quality" ->
      """WITH d AS (
           SELECT source, regexp_split_to_array(text, '\s+') AS toks FROM documents),
         r AS (
           SELECT source, len(toks) AS n_toks,
             len(list_filter(toks, t -> t = 'a' OR t = 'the')) AS stop_cnt,
             list_sum(list_transform(toks, t -> length(t))) AS sum_tok_len
           FROM d)
         SELECT source, count(*) AS n_docs,
           round(avg(CAST(stop_cnt AS DOUBLE) / n_toks), 6) AS avg_stop_ratio,
           round(avg(CAST(sum_tok_len AS DOUBLE) / n_toks), 6) AS avg_tok_len
         FROM r GROUP BY 1 ORDER BY 1""",
    "q_bm25_search" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
           FROM documents),
         per AS (
           SELECT doc_id, count(*) AS dl,
             CAST(sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS BIGINT) AS tf1,
             CAST(sum(CASE WHEN tok = 'merge' THEN 1 ELSE 0 END) AS BIGINT) AS tf2,
             CAST(sum(CASE WHEN tok = 'window' THEN 1 ELSE 0 END) AS BIGINT) AS tf3
           FROM tok WHERE tok <> '' GROUP BY 1),
         st AS (
           SELECT count(*) AS n, avg(dl) AS avgdl,
             sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
             sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
           FROM per),
         sc AS (
           SELECT doc_id, tf1, tf2, tf3,
             ln(1.0::DOUBLE + (n - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE))
               * (tf1 * 2.2::DOUBLE / (tf1 + 1.2::DOUBLE *
                  (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
             + ln(1.0::DOUBLE + (n - df2 + 0.5::DOUBLE) / (df2 + 0.5::DOUBLE))
               * (tf2 * 2.2::DOUBLE / (tf2 + 1.2::DOUBLE *
                  (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
             + ln(1.0::DOUBLE + (n - df3 + 0.5::DOUBLE) / (df3 + 0.5::DOUBLE))
               * (tf3 * 2.2::DOUBLE / (tf3 + 1.2::DOUBLE *
                  (0.25::DOUBLE + 0.75::DOUBLE * dl / avgdl)))
             AS score
           FROM per, st)
         SELECT doc_id, tf1, tf2, tf3, round(score, 4) AS bm25
         FROM sc WHERE tf1 + tf2 + tf3 > 0
         ORDER BY score DESC, doc_id LIMIT 10""",
    "q_repetition_stats" ->
      """WITH d AS (
           SELECT lang,
             list_filter(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS toks
           FROM documents),
         m AS (
           SELECT lang,
             len(toks) AS n_toks,
             len(list_distinct(toks)) AS n_distinct,
             list_max(list_transform(list_distinct(toks),
               x -> len(list_filter(toks, t -> t = x)))) AS top_cnt
           FROM d WHERE len(toks) > 0),
         r AS (
           SELECT lang,
             1.0::DOUBLE - CAST(n_distinct AS DOUBLE) / n_toks AS rep_ratio,
             CAST(top_cnt AS DOUBLE) / n_toks AS top_share
           FROM m)
         SELECT lang, count(*) AS n_docs,
           round(avg(rep_ratio), 4) AS avg_rep_ratio,
           round(max(rep_ratio), 4) AS max_rep_ratio,
           round(avg(top_share), 4) AS avg_top_share,
           CAST(sum(CASE WHEN rep_ratio > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         FROM r GROUP BY 1 ORDER BY 1""",
    "q_token_count" ->
      """SELECT lang, count(*) AS n_docs,
         CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
           AS sum_bpe_tokens
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_lang_id" ->
      """WITH d AS (
           SELECT doc_id, lang, lower(text) AS t FROM documents
           WHERE length(lower(text)) >= 3),
         tri AS (
           SELECT doc_id, lang, unnest(
             list_transform(generate_series(1, length(t) - 2),
               i -> substr(t, i, 3))) AS g
           FROM d),
         doctri AS (SELECT doc_id, lang, g, count(*) AS c FROM tri GROUP BY 1, 2, 3),
         langtri AS (SELECT lang, g, sum(c) AS n FROM doctri GROUP BY 1, 2),
         profile AS (
           SELECT lang AS plang, g, CAST(51 - rk AS BIGINT) AS wt FROM (
             SELECT lang, g,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rk
             FROM langtri)
           WHERE rk <= 50),
         scores AS (
           SELECT dt.doc_id, dt.lang, p.plang, sum(dt.c * p.wt) AS score
           FROM doctri dt JOIN profile p ON dt.g = p.g
           GROUP BY 1, 2, 3),
         pred AS (
           SELECT doc_id, lang, plang, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rk
           FROM scores)
         SELECT lang AS actual_lang, plang AS predicted_lang,
           count(*) AS n_docs, CAST(sum(score) AS BIGINT) AS sum_score
         FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_doc_fingerprint" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
         sh AS (
           SELECT doc_id, unnest(
             CASE WHEN len(toks) >= 5
               THEN list_transform(generate_series(1, len(toks) - 4),
                      i -> array_to_string(toks[i:i+4], ' '))
               ELSE [] END) AS sh
           FROM t)
         SELECT doc_id,
           min(('0x' || substr(md5(sh), 1, 15))::BIGINT) AS fingerprint
         FROM sh GROUP BY 1 ORDER BY 1""",
    "q_tfidf_keywords" ->
      """WITH tf AS (
           SELECT doc_id, tok AS term, count(*) AS tf
           FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
                 FROM documents)
           WHERE tok <> '' GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_corpus FROM documents),
         scored AS (
           SELECT doc_id, term, tf,
             round(tf * ln(CAST(n_corpus AS DOUBLE) / df), 4) AS score
           FROM tf JOIN df USING (term) CROSS JOIN n),
         r AS (
           SELECT doc_id, term, tf, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
           FROM scored)
         SELECT doc_id, CAST(rnk AS INT) AS rnk, term, tf, score FROM r
         WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "q_length_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
           round(avg(n_chars), 2) AS mean_chars,
           round(quantile_cont(n_chars, 0.5), 2) AS p50,
           round(quantile_cont(n_chars, 0.9), 2) AS p90,
           round(quantile_cont(n_chars, 0.99), 2) AS p99
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_lm_score" ->
      """WITH d AS (
           SELECT doc_id, lang, lower(text) AS t FROM documents
           WHERE length(lower(text)) >= 3),
         tri AS (
           SELECT doc_id, lang, unnest(
             list_transform(generate_series(1, length(t) - 2),
               i -> substr(t, i, 3))) AS g
           FROM d),
         doctri AS (SELECT doc_id, lang, g, count(*) AS c FROM tri GROUP BY 1, 2, 3),
         corpus AS (SELECT g, sum(c) AS cg FROM doctri GROUP BY 1),
         tot AS (SELECT sum(cg) AS n FROM corpus),
         docbits AS (
           SELECT doc_id, lang, -sum(c * log2(cg / tot.n)) / sum(c) AS bits
           FROM doctri JOIN corpus USING (g), tot GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs, round(avg(bits), 4) AS avg_bits,
                round(min(bits), 4) AS min_bits, round(max(bits), 4) AS max_bits
         FROM docbits GROUP BY lang ORDER BY lang""",
    // PII redaction: the oracle pins the REPLACEMENT ORDER (emails and URLs
    // before digit runs — both can contain digits) via the aggregate
    // before/after lengths; 'g' makes DuckDB replace-all like Spark.
    "q_pii_redact" ->
      raw"""WITH $auditCorpusCte,
         red AS (
           SELECT source, text,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '[EMAIL]', 'g'),
               'https?://[^ ]+', '[URL]', 'g'),
               '[0-9]{6,}', '[NUM]', 'g') AS r
           FROM corpus)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN r <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
           CAST(sum(length(text)) AS BIGINT) AS len_before,
           CAST(sum(length(r)) AS BIGINT) AS len_after
         FROM red GROUP BY source ORDER BY source""",
    // Deterministic hash split: seeded md5 nibble per doc_id — any worker
    // computes any document's split with no RNG state or shuffle.
    "q_corpus_split" ->
      """WITH s AS (
           SELECT doc_id, text,
             CASE
               WHEN ('0x' || substr(md5('split-' || doc_id::VARCHAR), 1, 15))::BIGINT % 16 >= 14
                 THEN 'test'
               WHEN ('0x' || substr(md5('split-' || doc_id::VARCHAR), 1, 15))::BIGINT % 16 >= 12
                 THEN 'val'
               ELSE 'train' END AS split
           FROM documents)
         SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
         FROM s GROUP BY split ORDER BY split""",
    "q_pii_scan" ->
      raw"""WITH $auditCorpusCte,
         m AS (
           SELECT source,
             len(regexp_extract_all(text,
               '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_email,
             len(regexp_extract_all(text, '[0-9]{6,}')) AS n_digits,
             len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_url
           FROM corpus)
         SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(sum(n_email) AS BIGINT) AS total_emails,
           CAST(sum(CASE WHEN n_digits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_digit_runs,
           CAST(sum(n_digits) AS BIGINT) AS total_digit_runs,
           CAST(sum(CASE WHEN n_url > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_urls,
           CAST(sum(n_url) AS BIGINT) AS total_urls
         FROM m GROUP BY source ORDER BY source""",
    "q_zipf_slope" ->
      """WITH tok AS (
           SELECT lang, unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
           FROM documents),
         counts AS (
           SELECT lang, tok, count(*) AS f FROM tok WHERE tok <> '' GROUP BY 1, 2),
         ranked AS (
           SELECT lang, f, tok,
             row_number() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS rnk
           FROM counts),
         top AS (
           SELECT lang, log2(rnk) AS x, log2(f) AS y FROM ranked WHERE rnk <= 100)
         SELECT lang, count(*) AS n_ranks,
           round((count(*) * sum(x * y) - sum(x) * sum(y)) /
                 (count(*) * sum(x * x) - sum(x) * sum(x)), 4) AS zipf_slope
         FROM top GROUP BY lang ORDER BY lang""",
    // ---- LLM-pipeline: deduplication ----
    "q_dedup_exact" ->
      """SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
         count(*) - count(DISTINCT md5(text)) AS n_dup_rows FROM documents""",
    "q_span_dedup" ->
      """WITH t AS (
           SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
           FROM documents),
         segs AS (
           SELECT doc_id, source,
             array_to_string(toks[(10*(i-1)+1):(10*i)], ' ') AS seg
           FROM t, LATERAL unnest(
             generate_series(1, CAST(floor(len(toks)/10) AS BIGINT))) AS u(i)),
         c AS (
           SELECT md5(seg) AS seg_h, count(DISTINCT doc_id) AS nd
           FROM segs GROUP BY 1)
         SELECT source, CAST(count(*) AS BIGINT) AS n_segs,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_segs,
           CAST(sum(CASE WHEN nd > 1 THEN length(seg) ELSE 0 END) AS BIGINT) AS dup_chars
         FROM segs JOIN c ON md5(seg) = seg_h
         GROUP BY source ORDER BY source""",
    "q_dedup_minhash" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
         shing AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(toks) >= 5
                 THEN list_transform(generate_series(1, len(toks) - 4),
                        i -> array_to_string(toks[i:i+4], ' '))
                 ELSE [] END) AS sh
             FROM t)),
         hashed AS (
           SELECT doc_id, seed,
             xor(('0x' || substr(md5(sh), 1, 15))::BIGINT,
                 ('0x' || substr(md5('minhash-seed-' || seed::VARCHAR), 1, 15))::BIGINT) AS h
           FROM shing CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed)),
         sig AS (
           SELECT doc_id,
             min(CASE WHEN seed = 0 THEN h END) AS m0,
             min(CASE WHEN seed = 1 THEN h END) AS m1,
             min(CASE WHEN seed = 2 THEN h END) AS m2,
             min(CASE WHEN seed = 3 THEN h END) AS m3,
             min(CASE WHEN seed = 4 THEN h END) AS m4,
             min(CASE WHEN seed = 5 THEN h END) AS m5,
             min(CASE WHEN seed = 6 THEN h END) AS m6,
             min(CASE WHEN seed = 7 THEN h END) AS m7
           FROM hashed GROUP BY 1),
         bands AS (
           SELECT doc_id, 0 AS band, m0::VARCHAR || ',' || m1::VARCHAR AS bkey FROM sig
           UNION ALL SELECT doc_id, 1, m2::VARCHAR || ',' || m3::VARCHAR FROM sig
           UNION ALL SELECT doc_id, 2, m4::VARCHAR || ',' || m5::VARCHAR FROM sig
           UNION ALL SELECT doc_id, 3, m6::VARCHAR || ',' || m7::VARCHAR FROM sig),
         cand AS (
           SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, count(*) AS sz FROM shing GROUP BY 1),
         shared AS (
           SELECT d1, d2, count(*) AS n_shared
           FROM cand
           JOIN shing sa ON d1 = sa.doc_id
           JOIN shing sb ON d2 = sb.doc_id AND sa.sh = sb.sh
           GROUP BY 1, 2)
         SELECT d1, d2, n_shared, round(jac, 3) AS jaccard FROM (
           SELECT d1, d2, n_shared,
             CAST(n_shared AS DOUBLE) / (s1.sz + s2.sz - n_shared) AS jac
           FROM shared
           JOIN sizes s1 ON d1 = s1.doc_id
           JOIN sizes s2 ON d2 = s2.doc_id)
         WHERE jac >= 0.8 ORDER BY d1, d2""",
    // Streaming ingest dedup: same signature kernel as q_dedup_minhash; the
    // one-shot drive visits docs in doc_id order per (band, bucket), keeps
    // the newest 128 signatures (oldest-first eviction), and flags the best
    // earlier match (ties -> earliest doc) when >= 4 of 8 components agree.
    "q_streaming_dedup" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
         shing AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(toks) >= 5
                 THEN list_transform(generate_series(1, len(toks) - 4),
                        i -> array_to_string(toks[i:i+4], ' '))
                 ELSE [] END) AS sh
             FROM t)),
         hashed AS (
           SELECT doc_id, seed,
             xor(('0x' || substr(md5(sh), 1, 15))::BIGINT,
                 ('0x' || substr(md5('minhash-seed-' || seed::VARCHAR), 1, 15))::BIGINT) AS h
           FROM shing CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed)),
         sig AS (
           SELECT doc_id,
             min(CASE WHEN seed = 0 THEN h END) AS m0,
             min(CASE WHEN seed = 1 THEN h END) AS m1,
             min(CASE WHEN seed = 2 THEN h END) AS m2,
             min(CASE WHEN seed = 3 THEN h END) AS m3,
             min(CASE WHEN seed = 4 THEN h END) AS m4,
             min(CASE WHEN seed = 5 THEN h END) AS m5,
             min(CASE WHEN seed = 6 THEN h END) AS m6,
             min(CASE WHEN seed = 7 THEN h END) AS m7
           FROM hashed GROUP BY 1),
         bands AS (
           SELECT doc_id, 0 AS band, m0::VARCHAR || ',' || m1::VARCHAR AS bkey,
                  [m0,m1,m2,m3,m4,m5,m6,m7] AS s FROM sig
           UNION ALL SELECT doc_id, 1, m2::VARCHAR || ',' || m3::VARCHAR,
                  [m0,m1,m2,m3,m4,m5,m6,m7] FROM sig
           UNION ALL SELECT doc_id, 2, m4::VARCHAR || ',' || m5::VARCHAR,
                  [m0,m1,m2,m3,m4,m5,m6,m7] FROM sig
           UNION ALL SELECT doc_id, 3, m6::VARCHAR || ',' || m7::VARCHAR,
                  [m0,m1,m2,m3,m4,m5,m6,m7] FROM sig),
         pairs AS (
           SELECT a.band, a.doc_id, b.doc_id AS dup_of,
             row_number() OVER (PARTITION BY a.band, a.bkey, a.doc_id
                                ORDER BY b.doc_id DESC) AS recency,
             len(list_filter(generate_series(1, 8), i -> a.s[i] = b.s[i])) AS n_same
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND b.doc_id < a.doc_id),
         best AS (
           SELECT band, doc_id, dup_of, n_same,
             row_number() OVER (PARTITION BY band, doc_id
                                ORDER BY n_same DESC, dup_of) AS rnk
           FROM pairs WHERE recency <= 128)
         SELECT doc_id, dup_of, band, round(n_same / 8.0, 3) AS est_jaccard
         FROM best WHERE rnk = 1 AND n_same >= 4
         ORDER BY doc_id, band""",
    "q_dedup_clusters" ->
      """WITH RECURSIVE t AS (
           SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
         shing AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(toks) >= 5
                 THEN list_transform(generate_series(1, len(toks) - 4),
                        i -> array_to_string(toks[i:i+4], ' '))
                 ELSE [] END) AS sh
             FROM t)),
         hashed AS (
           SELECT doc_id, seed,
             xor(('0x' || substr(md5(sh), 1, 15))::BIGINT,
                 ('0x' || substr(md5('minhash-seed-' || seed::VARCHAR), 1, 15))::BIGINT) AS h
           FROM shing CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed)),
         sig AS (
           SELECT doc_id,
             min(CASE WHEN seed = 0 THEN h END) AS m0,
             min(CASE WHEN seed = 1 THEN h END) AS m1,
             min(CASE WHEN seed = 2 THEN h END) AS m2,
             min(CASE WHEN seed = 3 THEN h END) AS m3,
             min(CASE WHEN seed = 4 THEN h END) AS m4,
             min(CASE WHEN seed = 5 THEN h END) AS m5,
             min(CASE WHEN seed = 6 THEN h END) AS m6,
             min(CASE WHEN seed = 7 THEN h END) AS m7
           FROM hashed GROUP BY 1),
         bands AS (
           SELECT doc_id, 0 AS band, m0::VARCHAR || ',' || m1::VARCHAR AS bkey FROM sig
           UNION ALL SELECT doc_id, 1, m2::VARCHAR || ',' || m3::VARCHAR FROM sig
           UNION ALL SELECT doc_id, 2, m4::VARCHAR || ',' || m5::VARCHAR FROM sig
           UNION ALL SELECT doc_id, 3, m6::VARCHAR || ',' || m7::VARCHAR FROM sig),
         cand AS (
           SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, count(*) AS sz FROM shing GROUP BY 1),
         shared AS (
           SELECT d1, d2, count(*) AS n_shared
           FROM cand
           JOIN shing sa ON d1 = sa.doc_id
           JOIN shing sb ON d2 = sb.doc_id AND sa.sh = sb.sh
           GROUP BY 1, 2),
         pairs AS (
           SELECT d1, d2 FROM (
             SELECT d1, d2,
               CAST(n_shared AS DOUBLE) / (s1.sz + s2.sz - n_shared) AS jac
             FROM shared
             JOIN sizes s1 ON d1 = s1.doc_id
             JOIN sizes s2 ON d2 = s2.doc_id)
           WHERE jac >= 0.8),
         verts AS (
           SELECT DISTINCT v FROM (
             SELECT d1 AS v FROM pairs UNION ALL SELECT d2 FROM pairs)),
         edges AS (
           SELECT d1 AS src, d2 AS dst FROM pairs
           UNION ALL SELECT d2, d1 FROM pairs),
         reach AS (
           SELECT v, v AS r FROM verts
           UNION
           SELECT e.dst AS v, reach.r AS r
           FROM edges e JOIN reach ON e.src = reach.v),
         comp AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1)
         SELECT doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
           doc_id = cluster_id AS is_kept
         FROM comp ORDER BY doc_id""",
    "q_sample_stratified" ->
      """WITH s AS (
           SELECT lang, doc_id,
             CASE WHEN lang = 'en' THEN 300 ELSE 600 END AS rate,
             ('0x' || substr(md5('sample-' || doc_id::VARCHAR), 1, 15))::BIGINT % 1000 AS u
           FROM documents)
         SELECT lang,
           CAST(max(rate) AS INT) AS rate_permille,
           count(*) AS n_total,
           CAST(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN u < rate THEN doc_id END) AS BIGINT) AS kept_id_sum
         FROM s GROUP BY 1 ORDER BY 1""",
    "q_decontaminate" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
         shing AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [] END) AS sh
             FROM t)),
         pairs AS (
           SELECT a.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS n_shared
           FROM shing a JOIN shing b ON a.sh = b.sh
           WHERE a.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
           GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT doc_id, count(*) AS n_bench_hits,
           CAST(max(n_shared) AS BIGINT) AS max_overlap,
           CAST(sum(bench_id) AS BIGINT) AS bench_id_sum
         FROM pairs GROUP BY 1 ORDER BY 1""",
    "q_bloom_decon" ->
      """WITH t AS (
           SELECT doc_id, source, regexp_split_to_array(text, '\s+') AS toks
           FROM documents),
         sp AS (
           SELECT doc_id, source, toks,
             (('0x' || substr(md5('split-' || doc_id::VARCHAR), 1, 15))::BIGINT % 16)
               AS nib
           FROM t),
         shing AS (
           SELECT DISTINCT doc_id, source, nib, sh FROM (
             SELECT doc_id, source, nib, unnest(
               CASE WHEN len(toks) >= 5
                 THEN list_transform(generate_series(1, len(toks) - 4),
                        i -> array_to_string(toks[i:i+4], ' '))
                 ELSE [] END) AS sh
             FROM sp)),
         train AS (SELECT DISTINCT sh FROM shing WHERE nib < 12),
         bits AS (
           SELECT DISTINCT b FROM train, LATERAL unnest([
             ('0x' || substr(md5('bloom0-' || sh), 1, 15))::BIGINT % 1048576,
             ('0x' || substr(md5('bloom1-' || sh), 1, 15))::BIGINT % 1048576,
             ('0x' || substr(md5('bloom2-' || sh), 1, 15))::BIGINT % 1048576]) AS u(b)),
         probe AS (
           SELECT doc_id, source, sh,
             sum(CASE WHEN b IN (SELECT b FROM bits) THEN 1 ELSE 0 END) AS nset
           FROM (
             SELECT doc_id, source, sh, unnest([
               ('0x' || substr(md5('bloom0-' || sh), 1, 15))::BIGINT % 1048576,
               ('0x' || substr(md5('bloom1-' || sh), 1, 15))::BIGINT % 1048576,
               ('0x' || substr(md5('bloom2-' || sh), 1, 15))::BIGINT % 1048576]) AS b
             FROM shing WHERE nib >= 14)
           GROUP BY 1, 2, 3)
         SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_sh,
           CAST(sum(CASE WHEN nset = 3 THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits,
           CAST(sum(CASE WHEN sh IN (SELECT sh FROM train) THEN 1 ELSE 0 END)
             AS BIGINT) AS exact_hits
         FROM probe GROUP BY source ORDER BY source""",
    "q_token_budget_mix" ->
      """WITH d AS (
           SELECT source, doc_id,
             len(regexp_split_to_array(text, '\s+')) AS toks,
             ('0x' || substr(md5('mix-' || doc_id::VARCHAR), 1, 15))::BIGINT AS pri
           FROM documents),
         c AS (
           SELECT source, doc_id, toks,
             coalesce(sum(toks) OVER (PARTITION BY source ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           FROM d)
         SELECT source, count(*) AS n_total,
           CAST(sum(toks) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN cum_before < 20000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN cum_before < 20000 THEN toks END) AS BIGINT)
             AS tokens_kept,
           CAST(sum(CASE WHEN cum_before < 20000 THEN doc_id END) AS BIGINT)
             AS kept_id_sum
         FROM c GROUP BY 1 ORDER BY 1""",
    "q_seq_packing" ->
      """WITH d AS (
           SELECT source, doc_id,
             len(regexp_split_to_array(text, '\s+')) AS toks,
             ('0x' || substr(md5('mix-' || doc_id::VARCHAR), 1, 15))::BIGINT AS pri
           FROM documents),
         c AS (
           SELECT source, doc_id, toks,
             coalesce(sum(toks) OVER (PARTITION BY source ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM d),
         g AS (
           SELECT source, count(*) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS tokens_total,
             CAST(max(off + toks) AS BIGINT) AS end_tok,
             CAST(sum(CASE WHEN off // 512 <> (off + toks - 1) // 512
               THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling
           FROM c GROUP BY 1)
         SELECT source, n_docs, tokens_total,
           (end_tok + 511) // 512 AS n_windows, n_straddling,
           (512 - (end_tok % 512)) % 512 AS tail_waste
         FROM g ORDER BY 1""",
    "q_pack_manifest" ->
      """WITH d AS (
           SELECT source, doc_id,
             len(regexp_split_to_array(text, '\s+')) AS toks,
             ('0x' || substr(md5('mix-' || doc_id::VARCHAR), 1, 15))::BIGINT AS pri
           FROM documents),
         c AS (
           SELECT source, doc_id, toks,
             coalesce(sum(toks) OVER (PARTITION BY source ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM d)
         SELECT source, doc_id, CAST(toks AS BIGINT) AS toks,
           CAST(off AS BIGINT) AS off,
           CAST(off // 512 AS BIGINT) AS first_window,
           CAST((off + toks - 1) // 512 AS BIGINT) AS last_window,
           off // 512 <> (off + toks - 1) // 512 AS straddles
         FROM c ORDER BY source, doc_id""",
    "q_cms_tokens" ->
      """WITH tok AS (
           SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
           FROM documents),
         cells AS (
           SELECT r.range AS r,
             ('0x' || substr(md5('cms' || r.range::VARCHAR || '-' || tok), 1, 15))::BIGINT
               % 1024 AS bucket
           FROM tok, range(4) r WHERE tok <> ''),
         sketch AS (
           SELECT r, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
         probes AS (
           SELECT t.tok, r.range AS r,
             ('0x' || substr(md5('cms' || r.range::VARCHAR || '-' || t.tok), 1, 15))::BIGINT
               % 1024 AS bucket
           FROM (SELECT unnest(['join', 'hash', 'vector', 'spark', 'the']) AS tok) t,
             range(4) r),
         est AS (
           SELECT p.tok, min(coalesce(s.cnt, 0)) AS cms_estimate
           FROM probes p LEFT JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
           GROUP BY 1),
         exact AS (
           SELECT tok, count(*) AS exact_count FROM tok
           WHERE tok IN ('join', 'hash', 'vector', 'spark', 'the')
           GROUP BY 1)
         SELECT e.tok, CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
           CAST(coalesce(x.exact_count, 0) AS BIGINT) AS exact_count
         FROM est e LEFT JOIN exact x ON e.tok = x.tok ORDER BY 1""",
    "q_hll_distinct" ->
      """WITH h AS (
           SELECT event_type,
             ('0x' || substr(md5('hll-' || user_id::VARCHAR), 1, 15))::BIGINT AS h
           FROM events),
         r AS (
           SELECT event_type, h % 512 AS reg, h // 512 AS v FROM h),
         regs AS (
           SELECT event_type, reg,
             max(CASE WHEN v = 0 THEN 52 ELSE 52 - length(bin(v)) END) AS m
           FROM r GROUP BY 1, 2),
         folded AS (
           SELECT event_type,
             count(*) AS n_used,
             CAST(sum(CAST(pow(2, 52 - m) AS BIGINT)) AS BIGINT) AS s_used
           FROM regs GROUP BY 1),
         est AS (
           SELECT event_type, n_used, 512 - n_used AS n_empty,
             (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 512.0::DOUBLE))
               * 262144.0::DOUBLE
               * (pow(2, 52) / (s_used + (512 - n_used) * CAST(pow(2, 52) AS BIGINT)))
               AS raw
           FROM folded),
         fin AS (
           SELECT event_type, n_used, n_empty,
             CASE WHEN raw <= 2.5::DOUBLE * 512.0::DOUBLE AND n_empty > 0
               THEN 512.0::DOUBLE * ln(512.0::DOUBLE / n_empty)
               ELSE raw END AS e
           FROM est),
         exact AS (
           SELECT event_type, count(DISTINCT user_id) AS exact_distinct
           FROM events GROUP BY 1)
         SELECT f.event_type, CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
           round(f.e, 2) AS hll_estimate,
           CAST(f.n_used AS BIGINT) AS n_used, CAST(f.n_empty AS BIGINT) AS n_empty
         FROM fin f JOIN exact x ON f.event_type = x.event_type ORDER BY 1""",
    "q_heavy_hitters" ->
      """WITH tok AS (
           SELECT lang, unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
           FROM documents),
         c AS (
           SELECT lang, tok, count(*) AS n FROM tok WHERE tok <> '' GROUP BY 1, 2),
         r AS (
           SELECT lang, tok, n,
             row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rnk
           FROM c)
         SELECT lang, tok, n, CAST(rnk AS INT) AS rnk FROM r
         WHERE rnk <= 5 ORDER BY lang, rnk""",
    "q_pseudonymize" ->
      """SELECT c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           count(*) AS n,
           CAST(count(DISTINCT pid) AS BIGINT) AS n_pseudo,
           CAST(sum(pid % 1000000007) AS BIGINT) AS pid_checksum
         FROM (SELECT c_mktsegment, c_acctbal,
                 ('0x' || substr(md5('pseud-v1-' || c_name), 1, 15))::BIGINT AS pid
               FROM customer)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_dedup_simhash" ->
      """WITH tok AS (
           SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
           FROM documents),
         h AS (
           SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok),
         bits AS (
           SELECT doc_id, b,
             sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
           FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b)
           GROUP BY 1, 2),
         sig AS (
           SELECT doc_id,
             CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT)
               AS sig
           FROM bits GROUP BY 1),
         bands AS (
           SELECT doc_id, sig, band, (sig >> (15 * band)) & 32767 AS bkey
           FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)),
         cand AS (
           SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
             a.sig AS s1, b.sig AS s2
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
         FROM cand WHERE bit_count(xor(s1, s2)) <= 5 ORDER BY d1, d2""",
    "q_dedup_ngram" ->
      """WITH t AS (
           SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents),
         shing AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(
               CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks) - 2),
                        i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [] END) AS sh
             FROM t)),
         hot AS (SELECT sh FROM shing GROUP BY sh HAVING count(*) > 100),
         pruned AS (SELECT doc_id, sh FROM shing WHERE sh NOT IN (SELECT sh FROM hot)),
         cand AS (
           SELECT a.doc_id AS d1, b.doc_id AS d2
           FROM pruned a JOIN pruned b
             ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 2),
         sizes AS (SELECT doc_id, count(*) AS sz FROM shing GROUP BY 1),
         shared AS (
           SELECT d1, d2, count(*) AS n_shared
           FROM cand
           JOIN shing sa ON d1 = sa.doc_id
           JOIN shing sb ON d2 = sb.doc_id AND sa.sh = sb.sh
           GROUP BY 1, 2)
         SELECT d1, d2, round(jac, 3) AS jaccard FROM (
           SELECT d1, d2,
             CAST(n_shared AS DOUBLE) / (s1.sz + s2.sz - n_shared) AS jac
           FROM shared
           JOIN sizes s1 ON d1 = s1.doc_id
           JOIN sizes s2 ON d2 = s2.doc_id)
         WHERE jac >= 0.5 ORDER BY d1, d2""",
    // Embedding near-dup audit: same 680 hyperplanes / 40x17 banding as
    // q_ann_lsh, corpus-wide self-join, exact cosine on colliding pairs,
    // histogrammed by 0.1 cosine bucket.
    "q_vec_quantize" ->
      """WITH vv AS (
           SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         sc AS (
           SELECT vec_id, label, v,
             list_reduce(list_transform(v, x -> abs(x)), (a, b) -> greatest(a, b)) AS amax
           FROM vv),
         qz AS (
           SELECT vec_id, label, v, amax / 127.0 AS scale,
             list_transform(v, x ->
               least(127.0, greatest(-127.0, round(x / (amax / 127.0)))) * (amax / 127.0)) AS r
           FROM sc WHERE amax > 0),
         e AS (
           SELECT label,
             list_reduce(list_transform(generate_series(1, len(v)),
               i -> (v[i] - r[i]) * (v[i] - r[i])), (a, b) -> a + b) AS sqerr,
             list_reduce(list_transform(generate_series(1, len(v)),
               i -> abs(v[i] - r[i])), (a, b) -> greatest(a, b)) AS maxerr,
             list_reduce(list_transform(generate_series(1, len(v)),
               i -> v[i] * r[i]), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(r, y -> y * y), (a, b) -> a + b)))
               AS cos_vr,
             len(v) AS dim
           FROM qz)
         SELECT label, count(*) AS n_vecs,
           round(avg(sqerr / dim), 8) AS mean_mse,
           round(max(maxerr), 6) AS worst_abs_err,
           round(avg(cos_vr), 6) AS mean_cosine
         FROM e GROUP BY 1 ORDER BY 1""",
    "q_dedup_embedding" ->
      """WITH planes AS (
           SELECT p, list(w ORDER BY i) AS wv FROM (
             SELECT tp.range AS p, ti.range AS i,
               (CAST(('0x' || substr(md5(tp.range::VARCHAR || '_' || ti.range::VARCHAR), 1, 15))
                  AS BIGINT) / 576460752303423488.0) - 1.0 AS w
             FROM range(680) tp, range(64) ti)
           GROUP BY p),
         vecs AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
           FROM embeddings),
         bits AS (
           SELECT vec_id, p,
             CASE WHEN list_dot_product(v, wv) >= 0 THEN 1 ELSE 0 END AS bit
           FROM vecs, planes),
         buckets AS (
           SELECT vec_id, p // 17 AS band,
             CAST(sum(bit * CAST(power(2, p % 17) AS BIGINT)) AS BIGINT) AS bucket
           FROM bits GROUP BY 1, 2),
         cand AS (
           SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
           FROM buckets a JOIN buckets b
             ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
         sims AS (
           SELECT c.d1, c.d2,
             list_dot_product(v1.v, v2.v) / (v1.norm * v2.norm) AS sim
           FROM cand c
           JOIN vecs v1 ON v1.vec_id = c.d1
           JOIN vecs v2 ON v2.vec_id = c.d2)
         SELECT CAST(floor(sim * 10) AS BIGINT) AS bucket10,
           count(*) AS n_pairs, round(max(sim), 4) AS max_sim
         FROM sims GROUP BY 1 ORDER BY 1""",
    // ---- LLM-pipeline: similarity search ----
    "q_centroid_drift" ->
      """WITH z AS (
           SELECT label, vec_id % 2 AS half,
             unnest(range(len(embedding))) AS i,
             unnest(embedding) AS x
           FROM embeddings),
         pos AS (
           SELECT label, half, i, avg(x::DOUBLE) AS m, count(*) AS n
           FROM z GROUP BY 1, 2, 3),
         cent AS (
           SELECT label, half, list(m ORDER BY i) AS c,
             CAST(max(n) AS BIGINT) AS n_vecs
           FROM pos GROUP BY 1, 2)
         SELECT a.label, a.n_vecs AS n_even, b.n_vecs AS n_odd,
           round(list_dot_product(a.c, b.c) /
             (sqrt(list_dot_product(a.c, a.c)) * sqrt(list_dot_product(b.c, b.c))), 4)
             AS centroid_cos
         FROM cent a JOIN cent b ON a.label = b.label AND a.half = 0 AND b.half = 1
         ORDER BY a.label""",
    "q_ann_cosine" ->
      """WITH vecs AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
           FROM embeddings),
         q AS (SELECT vec_id AS qid, v AS qv, norm AS qnorm
               FROM vecs WHERE vec_id % 41 = 0),
         pairs AS (
           SELECT q.qid, e.vec_id AS nid,
             list_dot_product(q.qv, e.v) / (q.qnorm * e.norm) AS sim
           FROM q, vecs e WHERE e.vec_id <> q.qid),
         ranked AS (
           SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
           FROM pairs)
         SELECT qid AS query_id, rnk, nid AS neighbor_id, round(sim, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY 1, 2""",
    "q_ann_lsh" ->
      """WITH planes AS (
           SELECT p, list(w ORDER BY i) AS wv FROM (
             SELECT tp.range AS p, ti.range AS i,
               (CAST(('0x' || substr(md5(tp.range::VARCHAR || '_' || ti.range::VARCHAR), 1, 15))
                  AS BIGINT) / 576460752303423488.0) - 1.0 AS w
             FROM range(680) tp, range(64) ti)
           GROUP BY p),
         vecs AS (
           SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
           FROM embeddings),
         bits AS (
           SELECT vec_id, p,
             CASE WHEN list_dot_product(v, wv) >= 0 THEN 1 ELSE 0 END AS bit
           FROM vecs, planes),
         buckets AS (
           SELECT vec_id, p // 17 AS band,
             CAST(sum(bit * CAST(power(2, p % 17) AS BIGINT)) AS BIGINT) AS bucket
           FROM bits GROUP BY 1, 2),
         -- query-directed multi-probe: per (query, band), the 8 bit
         -- positions with the smallest |projection| (ties by position),
         -- flipped in all subsets of size <= 3 (93 probes/band)
         qproj AS (
           SELECT vec_id, p // 17 AS band, p % 17 AS j, list_dot_product(v, wv) AS s
           FROM vecs, planes WHERE vec_id % 41 = 0),
         qorder AS (
           SELECT vec_id, band,
             CAST(sum(CASE WHEN s >= 0 THEN CAST(power(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS base,
             (list(j ORDER BY abs(s), j))[1:8] AS pos
           FROM qproj GROUP BY 1, 2),
         flips AS (
           SELECT vec_id, band, base, 0::BIGINT AS f FROM qorder
           UNION ALL
           SELECT vec_id, band, base, CAST(power(2, pos[a.range + 1]) AS BIGINT)
           FROM qorder, range(8) a
           UNION ALL
           SELECT vec_id, band, base,
             CAST(power(2, pos[a.range + 1]) + power(2, pos[b.range + 1]) AS BIGINT)
           FROM qorder, range(8) a, range(8) b WHERE a.range < b.range
           UNION ALL
           SELECT vec_id, band, base,
             CAST(power(2, pos[a.range + 1]) + power(2, pos[b.range + 1])
                  + power(2, pos[c.range + 1]) AS BIGINT)
           FROM qorder, range(8) a, range(8) b, range(8) c
           WHERE a.range < b.range AND b.range < c.range),
         qprobes AS (
           SELECT vec_id, band, xor(base, f) AS bucket FROM flips),
         cand AS (
           SELECT DISTINCT qb.vec_id AS qid, vb.vec_id AS nid
           FROM qprobes qb JOIN buckets vb
             ON qb.band = vb.band AND qb.bucket = vb.bucket
           WHERE vb.vec_id <> qb.vec_id),
         sims AS (
           SELECT c.qid, c.nid,
             list_dot_product(qv.v, nv.v) / (qv.norm * nv.norm) AS sim
           FROM cand c
           JOIN vecs qv ON qv.vec_id = c.qid
           JOIN vecs nv ON nv.vec_id = c.nid),
         ranked AS (
           SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
           FROM sims)
         SELECT qid AS query_id, rnk, nid AS neighbor_id, round(sim, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY 1, 2""",
    // Trained IVF: the oracle re-runs the SAME deterministic spherical
    // k-means the Spark side runs (md5-ordered seeding, 3 unrolled Lloyd's
    // iterations, means rounded to 6 decimals so summation order can't
    // leak, empty cells keep their centroid), then the same 8-of-32 cell
    // probing — a hash match proves the whole trained index, not just the
    // final scoring.
    "q_ann_ivf" ->
      s"""WITH $ivfKmeansCte,
         probes AS (
           SELECT vec_id AS qid, cid AS cell FROM (
             SELECT vn.vec_id, c.cid, row_number() OVER (PARTITION BY vn.vec_id
               ORDER BY list_dot_product(vn.u, c.c) / sqrt(list_dot_product(c.c, c.c)) DESC, c.cid) AS rk
             FROM vn, c3 c WHERE vn.vec_id % 41 = 0) WHERE rk <= 8),
         cand AS (
           SELECT DISTINCT p.qid, a.vec_id AS nid
           FROM probes p JOIN fa a ON a.cell = p.cell
           WHERE a.vec_id <> p.qid),
         sims AS (
           SELECT c.qid, c.nid,
             list_dot_product(qv.v, nv.v) / (qv.norm * nv.norm) AS sim
           FROM cand c
           JOIN vecs qv ON qv.vec_id = c.qid
           JOIN vecs nv ON nv.vec_id = c.nid),
         ranked AS (
           SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
           FROM sims)
         SELECT qid AS query_id, rnk, nid AS neighbor_id, round(sim, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY 1, 2""",
    // PQ/ADC with exact re-rank: per-subspace codebooks trained by the
    // generated k-means CTEs, every vector encoded as 4 codes, queries
    // shortlist 128 candidates by the FIXED-ORDER subspace sum (left-assoc
    // in both engines -> bit-identical doubles), then exact cosine on the
    // shortlist only.
    "q_ann_pq" ->
      s"""WITH $pqKmeansCte,
         q AS (SELECT vec_id AS qid, u FROM vn WHERE vec_id % 41 = 0),
         scored AS (
           SELECT q.qid, e.vec_id AS nid,
             list_dot_product(q.u[1:16], b0.c) + list_dot_product(q.u[17:32], b1.c)
               + list_dot_product(q.u[33:48], b2.c) + list_dot_product(q.u[49:64], b3.c) AS approx
           FROM enc e
           JOIN pq0c3 b0 ON b0.cid = e.k0
           JOIN pq1c3 b1 ON b1.cid = e.k1
           JOIN pq2c3 b2 ON b2.cid = e.k2
           JOIN pq3c3 b3 ON b3.cid = e.k3
           CROSS JOIN q WHERE e.vec_id <> q.qid),
         shortlist AS (
           SELECT qid, nid FROM (
             SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY approx DESC, nid) AS ark
             FROM scored) WHERE ark <= 128),
         sims AS (
           SELECT sl.qid, sl.nid,
             list_dot_product(qv.v, nv.v) / (qv.norm * nv.norm) AS sim
           FROM shortlist sl
           JOIN vecs qv ON qv.vec_id = sl.qid
           JOIN vecs nv ON nv.vec_id = sl.nid),
         ranked AS (
           SELECT qid, nid, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
           FROM sims)
         SELECT qid AS query_id, rnk, nid AS neighbor_id, round(sim, 4) AS sim
         FROM ranked WHERE rnk <= 3 ORDER BY 1, 2""",
    // SemDeDup audit: same trained quantizer CTE, then within-cell pairwise
    // cosine and the lower-id-survives drop rule.
    "q_semantic_dedup" ->
      s"""WITH $ivfKmeansCte,
         pairs AS (
           SELECT a.cell, b.vec_id AS nid2,
             list_dot_product(av.v, bv.v) / (av.norm * bv.norm) AS sim
           FROM fa a JOIN fa b ON a.cell = b.cell AND a.vec_id < b.vec_id
           JOIN vecs av ON av.vec_id = a.vec_id
           JOIN vecs bv ON bv.vec_id = b.vec_id),
         stats AS (
           SELECT cell, count(*) AS n_pairs,
             count(DISTINCT CASE WHEN sim >= 0.4 THEN nid2 END) AS n_dropped,
             round(max(sim), 4) AS max_sim
           FROM pairs GROUP BY 1),
         members AS (SELECT cell, count(*) AS n_members FROM fa GROUP BY 1)
         SELECT m.cell, m.n_members,
           CAST(COALESCE(s.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(s.n_dropped, 0) AS BIGINT) AS n_dropped,
           s.max_sim
         FROM members m LEFT JOIN stats s USING (cell)
         ORDER BY 1""",
    // ---- LLM-pipeline: multimodal columns ----
    "q_multimodal_features" ->
      """WITH m AS (
           SELECT doc_id,
             CASE WHEN source = 'src1' THEN 'image'
                  WHEN source = 'src2' THEN 'audio'
                  WHEN source = 'src3' THEN 'video'
                  ELSE 'document' END AS media_type,
             octet_length(CAST(text AS BLOB)) AS n_bytes,
             octet_length(CAST(text AS BLOB)) % 640 AS w,
             octet_length(CAST(text AS BLOB)) % 480 AS h,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS fingerprint
           FROM documents),
         f AS (
           SELECT media_type, n_bytes,
             (n_bytes + 63) // 64 AS n_frames, fingerprint,
             greatest(w, h) AS long_side,
             CASE WHEN greatest(w, h) <= 256 THEN w
                  ELSE greatest(1, (w * 256) // greatest(w, h)) END AS resize_w,
             CASE WHEN greatest(w, h) <= 256 THEN h
                  ELSE greatest(1, (h * 256) // greatest(w, h)) END AS resize_h
           FROM m)
         SELECT media_type, count(*) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
           CAST(sum(n_frames) AS BIGINT) AS sum_frames,
           CAST(sum((n_frames + 3) // 4) AS BIGINT) AS sum_sampled,
           CAST(sum(resize_w) AS BIGINT) AS sum_rw,
           CAST(sum(resize_h) AS BIGINT) AS sum_rh,
           min(fingerprint) AS min_fp
         FROM f GROUP BY 1 ORDER BY 1""",
    // The kernel parses PNG/JPEG/GIF/WAV headers from binary payloads that
    // were generated from these SAME deterministic parameters — the oracle
    // recomputes the parameters directly, so a hash match proves the parse
    // recovered every field from the bytes.
    "q_media_metadata" ->
      """WITH m AS (
           SELECT doc_id,
             CASE WHEN source = 'src1' THEN 'png'
                  WHEN source = 'src2' THEN 'jpeg'
                  WHEN source = 'src3' THEN 'gif'
                  ELSE 'wav' END AS format,
             doc_id % 640 + 1 AS w,
             doc_id % 480 + 1 AS h,
             doc_id % 10 + 1 AS gf,
             8000 + (doc_id % 8) * 4000 AS rate,
             doc_id % 2 + 1 AS ch,
             octet_length(CAST(text AS BLOB)) AS db
           FROM documents)
         SELECT format,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN format <> 'wav' THEN w ELSE 0 END) AS BIGINT) AS sum_width,
           CAST(sum(CASE WHEN format <> 'wav' THEN h ELSE 0 END) AS BIGINT) AS sum_height,
           CAST(sum(CASE WHEN format = 'gif' THEN gf
                         WHEN format <> 'wav' THEN 1 ELSE 0 END) AS BIGINT) AS sum_frames,
           CAST(sum(CASE WHEN format = 'wav' THEN rate ELSE 0 END) AS BIGINT) AS sum_rate,
           CAST(sum(CASE WHEN format = 'wav' THEN ch ELSE 0 END) AS BIGINT) AS sum_channels,
           CAST(sum(CASE WHEN format = 'wav'
                         THEN (db * 8000000) // (rate * ch * 16) ELSE 0 END) AS BIGINT)
             AS sum_duration_micros
         FROM m GROUP BY 1 ORDER BY 1"""
  )
}
