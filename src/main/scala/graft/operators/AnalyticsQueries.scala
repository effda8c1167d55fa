package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Relational operator coverage (SURVEY §2.6): joins, aggregations, windows,
  * sorts/top-k, set ops, scalar functions — expressed Spark-first so Catalyst
  * owns pushdown, join strategy (broadcast for the small dims), and partial
  * aggregation. Oracles in [[graft.SparkEntry.oracleSql]].
  */
object AnalyticsQueries {

  /** Hash aggregation with partial/final split — TPC-H Q1 shape. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Multi-way join with small-side broadcast — TPC-H Q3 shape, top-10 by
    * revenue (deterministic tie-break on o_orderkey).
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Five-way join through the region→nation→customer/supplier star —
    * TPC-H Q5 shape; dims broadcast, fact tables shuffle on join keys.
    */
  def localSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val supp = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust.select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Window functions: per-supplier first shipment (row_number) +
    * running revenue rank bucketing.
    */
  def windowFirstShipment(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_suppkey"), col("l_orderkey").as("first_orderkey"),
        col("l_shipdate").cast("date").as("first_shipdate"))
  }

  /** Grouping sets via rollup — partial aggregates at multiple granularities. */
  def rollupReturns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))

  /** CUBE — all 2^2 grouping-set combinations in one pass (rollup's superset;
    * Catalyst expands to a single Expand + hash aggregate, not four scans).
    */
  def cubeReturns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))

  /** Statistical-moment aggregates: sample stddev/variance, correlation and
    * covariance between quantity and price, per return flag. Both engines
    * stream these with merge-formula aggregators; results are rounded to 4
    * decimals so low-bit summation-order noise can't surface.
    */
  def statsMoments(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_discount")), 4).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qty_disc"))

  /** Argmax/argmin aggregates (`max_by`/`min_by`) — "which row holds the
    * extreme", without a window or self-join: per event type, the user who
    * produced the highest-value event and the event id of the earliest one.
    * Ties are broken by pairing the target with a unique tiebreaker column
    * before aggregation, so both engines pick the same row.
    */
  def argmaxEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        max_by(col("user_id"), struct(col("value"), col("event_id"))).as("top_value_user"),
        min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("first_event_id"),
        round(max("value"), 6).as("max_value"))

  /** Sort + deterministic top-k. */
  def topParts(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(15)
      .select("p_partkey", "p_name", "p_retailprice")

  /** Set operations: semi join (EXISTS), anti join (NOT EXISTS), and their
    * counts by segment — Catalyst plans LeftSemi/LeftAnti natively.
    */
  def semiAntiCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ordKeys = Tables.orders(s, dir).select(col("o_custkey"))
    val withOrders = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val withoutOrders = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
      .na.fill(0L, Seq("n_with_orders", "n_without_orders"))
  }

  /** INTERSECT / EXCEPT / UNION DISTINCT over key sets — the remaining
    * SURVEY §2.6 set-ops row. Catalyst plans intersect/except as
    * LeftSemi/LeftAnti over distinct inputs, so each leg is one shuffle on
    * the key; the three counts are planning-sized single rows cross-joined.
    */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey").as("k"))
    val o = Tables.orders(s, dir).select(col("o_custkey").as("k"))
    c.intersect(o).agg(count(lit(1)).as("n_intersect"))
      .crossJoin(c.except(o).agg(count(lit(1)).as("n_except")))
      .crossJoin(c.union(o).distinct().agg(count(lit(1)).as("n_union")))
  }

  /** Scalar function coverage: string/date/math/conditional expressions
    * (SURVEY §2.6 "scalar functions" row).
    */
  def scalarFunctions(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        // cast to long: DuckDB's year()/month()/length() are BIGINT and the
        // driver's compare is schema-strict
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        upper(substring(col("o_orderpriority"), 1, 1)).as("prio_initial"),
        length(col("o_orderstatus")).cast("long").as("status_len"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"),
        col("o_totalprice"))
      .groupBy("yr", "mo", "prio_initial", "status_len", "price_band")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))

  /** As-of join — the classic operator Spark lacks natively (SURVEY §2.6
    * joins row): for each purchase, the latest prior click of the same user.
    * Implemented shuffle-once: union-tag both sides, one window pass per
    * user ordered by time carries the last click forward — O(n log n) per
    * key, no range-join blowup. DuckDB's native ASOF JOIN is the oracle.
    */
  /** Calendar gap-fill (time-series densification): each user's sparse daily
    * activity is expanded to a contiguous day series over their active span
    * (`sequence` + `explode` — generation is row-local, proportional to span,
    * never a cross join against a global calendar) and left-joined back so
    * silent days materialize as zero rows, then rolled up by weekday. The
    * dense frame is what training-data mixing schedules and SLA dashboards
    * consume; at 100 TB the explode fans out inside the scan stage and only
    * the (user, day) aggregate shuffles.
    */
  def gapFillDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val dense = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .withColumn("day", explode(expr("sequence(d0, d1, interval 1 day)")))
      .join(daily, Seq("user_id", "day"), "left")
      .na.fill(0L, Seq("n"))
    dense
      .withColumn("wd", pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(7)))
      .groupBy("wd")
      .agg(
        count(lit(1)).as("n_slots"),
        sum(when(col("n") === 0, 1).otherwise(0)).as("n_zero_slots"),
        sum("n").as("sum_events"))
  }

  /** Pivot (long-to-wide): order counts and total price per priority, spread
    * across status columns. Values are enumerated explicitly, so the pivot
    * compiles to one pass of conditional aggregates — no distinct-values
    * pre-query, no second scan, no extra shuffle beyond the groupBy.
    */
  def pivotOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("price"))
      .na.fill(0L)
      .select(col("o_orderpriority"),
        col("F_n").as("n_f"), col("F_price").as("price_f"),
        col("O_n").as("n_o"), col("O_price").as("price_o"),
        col("P_n").as("n_p"), col("P_price").as("price_p"))

  /** Interval (range) join via bucket decomposition — the scale pattern for
    * non-equi joins. Naively, "clicks inside each purchase's 1-hour window"
    * is a pure inequality join: Spark plans that as broadcast-nested-loop,
    * O(|W|·|P|), hopeless at 100 TB. Instead both sides are binned to the
    * hour: each window explodes to the <=2 hour-bins it overlaps, each point
    * maps to exactly ONE bin, and the join becomes an equi-join on the bin
    * key followed by the exact containment filter. A qualifying pair meets
    * in precisely the point's own bin, so no dedup stage is needed. Shuffle
    * volume is O(|W| + |P|) rows on 8-byte keys; bin width tunes the
    * replication-vs-selectivity trade exactly like Flink's interval join or
    * the IEJoin bucketing literature.
    */
  def rangeJoinClicks(s: SparkSession, dir: String): DataFrame = {
    val binUs = 3600L * 1000000L // 1-hour bins = the window length
    val ev = Tables.events(s, dir)
    val wins = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("win_id"), col("user_id"),
        unix_micros(col("ts")).as("t0"))
      .withColumn("t1", col("t0") + binUs)
    val pts = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("pt"))
      .withColumn("bin", floor(col("pt") / binUs))
    val binned = wins.withColumn("bin",
      explode(sequence(floor(col("t0") / binUs), floor((col("t1") - 1) / binUs))))
    val hits = binned.join(pts, "bin")
      .where(col("pt") >= col("t0") && col("pt") < col("t1"))
      .groupBy("win_id").agg(count(lit(1)).as("n_in"))
    wins.join(hits, Seq("win_id"), "left")
      .na.fill(0L, Seq("n_in"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_windows"), sum("n_in").as("n_clicks"))
  }

  /** Semi-structured extraction: parse the `events.props` JSON payload with a
    * declared schema (`from_json` — schema-on-read, codegen'd, no UDF) and
    * aggregate the extracted field per event type. The 100-TB shape: JSON
    * parsing is row-local in the scan stage; only the (event_type, k)
    * aggregates shuffle.
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k",
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        count(col("k")).as("n_with_k"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        round(avg("k"), 6).as("avg_k"))

  /** As-of join via the custom Catalyst operator ([[graft.plans.AsOfJoinExec]]
    * — hash co-partitioned merge, no union/window state), left-outer with a
    * 1-hour tolerance: every purchase keeps or loses its preceding click.
    * Contrast with [[asofPurchaseClick]], the composed-window formulation of
    * the same semantic (inner, no tolerance).
    */
  def asofCustom(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    graft.plans.AsOf.join(purchases, clicks,
        Seq("user_id"), Seq("c_user"), "ts", "click_ts",
        toleranceUs = Some(3600L * 1000000L), joinType = "left")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchase"),
        count(col("click_ts")).as("n_matched"),
        sum(unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("sum_gap_us"))
  }

  def asofPurchaseClick(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val tagged = ev.filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "click", col("ts")).as("click_ts"))
    // RANGE frame to current row: ties on ts are all in-frame, making the
    // match inclusive (click.ts <= purchase.ts), exactly ASOF semantics.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_ts", last("click_ts", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_click_ts").isNotNull)
      .select(col("user_id"),
        (unix_micros(col("ts")) - unix_micros(col("last_click_ts"))).as("gap_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_matched"), sum("gap_us").as("sum_gap_us"))
  }
}
