package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AnalyticsQueries, CdcQueries, SnapshotQueries}

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
    "q_local_supplier_volume" -> ((s, d) =>
      AnalyticsQueries.localSupplierVolume(s, d).orderBy("n_name")),
    "q_window_first_shipment" -> ((s, d) =>
      AnalyticsQueries.windowFirstShipment(s, d).orderBy("l_suppkey")),
    "q_rollup_returns" -> ((s, d) =>
      AnalyticsQueries.rollupReturns(s, d).orderBy("l_returnflag", "l_linestatus")),
    "q_top_parts" -> ((s, d) => AnalyticsQueries.topParts(s, d)),
    "q_semi_anti_customers" -> ((s, d) =>
      AnalyticsQueries.semiAntiCustomers(s, d).orderBy("c_mktsegment")),
    "q_scalar_functions" -> ((s, d) =>
      AnalyticsQueries.scalarFunctions(s, d).orderBy("yr", "mo", "prio_initial", "status_len", "price_band")),
    "q_asof_purchase_click" -> ((s, d) =>
      AnalyticsQueries.asofPurchaseClick(s, d).orderBy("user_id")),
    // ---- CDC operators (SURVEY §2.3/§2.4) ----
    "q_op_filter" -> ((s, d) => CdcQueries.opFilter(s, d).orderBy("event_type")),
    "q_table_filter" -> ((s, d) => CdcQueries.tableFilter(s, d).orderBy("source")),
    "q_column_projection" -> ((s, d) => CdcQueries.columnProjection(s, d).orderBy("doc_id")),
    "q_heartbeat_suppression" -> ((s, d) =>
      CdcQueries.heartbeatSuppression(s, d).orderBy("event_type")),
    "q_toast_coalesce" -> ((s, d) => CdcQueries.toastCoalesce(s, d).orderBy("event_type")),
    "q_latest_state" -> ((s, d) => CdcQueries.latestState(s, d).orderBy("user_id")),
    "q_sessionize" -> ((s, d) => CdcQueries.sessionize(s, d).orderBy("session_len")),
    "q_monotonic_guard" -> ((s, d) => CdcQueries.monotonicGuard(s, d).orderBy("event_type")),
    "q_cdc_roundtrip" -> ((s, d) => CdcQueries.cdcRoundtrip(s, d).orderBy("op")),
    // ---- snapshot operators (SURVEY §2.5) ----
    "q_chunked_scan" -> ((s, d) => SnapshotQueries.chunkedScan(s, d).orderBy("chunk_index")),
    "q_chunked_scan_condition" -> ((s, d) => SnapshotQueries.chunkedScanWithCondition(s, d)),
    "q_offset_chunks" -> ((s, d) => SnapshotQueries.offsetChunks(s, d).orderBy("chunk_index"))
  )

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
    "q_local_supplier_volume" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q_window_first_shipment" ->
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
    "q_heartbeat_suppression" ->
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
    "q_chunked_scan" ->
      """SELECT (o_orderkey - (SELECT min(o_orderkey) FROM orders)) // 2000
           AS chunk_index,
         count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
         round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q_chunked_scan_condition" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 50000""",
    "q_offset_chunks" ->
      """SELECT chunk_index, count(*) AS n,
         min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM (SELECT o_orderkey,
                 (row_number() OVER (ORDER BY o_orderkey) - 1) // 2000 AS chunk_index
               FROM orders)
         GROUP BY 1 ORDER BY 1"""
  )
}
