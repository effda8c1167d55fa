package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.{HybridRetrieval, LakeSink, MaintainedBm25Index,
  MaintainedDeltaJoin, MaintainedDistinct, MaintainedIvfIndex,
  MaintainedJoin, MaintainedLshIndex, MaintainedView}

/** Driver-gated lake queries: put the changelog → fold → compact → vacuum
  * → time-travel pipeline of [[graft.sinks.LakeSink]] under the same
  * DuckDB-oracle hash check as every operator query, instead of only
  * in-repo specs. Construction mirrors `q_ivm`'s: a DETERMINISTIC
  * three-batch changelog derived from `orders` —
  *
  *  - batch 0: insert every order,
  *  - batch 1: bump the price ~10% where `o_orderkey % 7 = 0`,
  *  - batch 2: delete where `o_orderkey % 13 = 0`,
  *
  * with a COMPACTION after batch 0 (so the fold reads BASE + a two-batch
  * tail, the steady-state shape) and a full vacuum (so batch 0's
  * changelog is gone and only BASE covers it — reads must resolve through
  * the manifest, and time travel must pass the precise retention check
  * over the vacuum marks). The batch ids double as history anchors:
  * `q_lake_state` folds the latest state, `q_lake_asof` time-travels to
  * the end of batch 1 (updates applied, deletes not yet).
  *
  * The lake lands in a per-(sf-dir) temp root built once per JVM
  * (`Verify` and `Bench` each run many queries over one dir); the content
  * is a pure function of `orders`, so a rebuild in a fresh JVM
  * reproduces it bit-for-bit up to parquet encoding.
  *
  * 100-TB shape: the build is three executor-parallel parquet writes plus
  * one churn-proportional compaction; each query is the lake's standard
  * fold — one shuffle on the replica-identity key over BASE + bounded
  * tail — then a map-side-combinable aggregate.
  */
object LakeQueries {

  private val built = new java.util.concurrent.ConcurrentHashMap[String, LakeSink]()

  private val L0 = 100000000L
  private val L1 = 200000000L
  private val L2 = 300000000L

  /** Integer-cents money discipline (round 13). The round-12 gates carried
    * churned prices as doubles rendered to strings, and the driver's DuckDB
    * rendered the same double differently often enough to flip a cent after
    * DECIMAL parsing — an engine-pair property, not a code property. Every
    * churned measure is now derived ONCE as `BIGINT` cents with an
    * expression both engines evaluate bit-identically
    * (`floor(x*100 + 0.5)` over the same IEEE double), churned in pure
    * integer space, and summed as `BIGINT`: no aggregation-order
    * sensitivity, no rendering, no rounding anywhere.
    */
  private[operators] def cents(x: Column): Column =
    floor(x * 100 + lit(0.5)).cast("long")

  /** `(c*11) div 10` — the ~10% bump in truncating integer division,
    * written as `(t - t%10)/10` so Spark and DuckDB (both C-style `%`,
    * exact double division of a 10-divisible value) agree even on
    * negative cents — exercised for real by q_mj's `c_acctbal` churn
    * (~10% of TPC-H acctbals are negative) and pinned by
    * `LakeQueriesSpec`'s negative-input cases.
    */
  private[operators] def bump(c: Column): Column = {
    val t = c * 11
    ((t - (t % 10)) / 10).cast("long")
  }

  private def img(priceCents: Column): Column = map(
    lit("o_orderkey"), col("o_orderkey").cast("string"),
    lit("o_orderstatus"), col("o_orderstatus"),
    lit("o_custkey"), col("o_custkey").cast("string"),
    lit("o_totalprice_cents"), priceCents.cast("string"))

  /** One batch of envelope rows over a filtered orders frame. `before` /
    * `after` null-ness encodes the op like the wire decoder produces.
    */
  private def envelope(df: DataFrame, op: String, commitLsn: Long,
      before: Column, after: Column): DataFrame =
    df.select(
      (lit(commitLsn) + col("o_orderkey")).as("lsn"),
      lit(commitLsn).as("commit_lsn"), lit(0L).as("xid"),
      lit(op).as("op"), lit("public").as("schema"), lit("orders").as("table"),
      timestamp_micros(lit(0L)).as("message_time"),
      timestamp_micros(lit(0L)).as("commit_time"),
      typedLit(Seq("o_orderkey")).as("key_names"),
      before.as("before"), after.as("after"))

  // independent-consumer concurrency — shared with the BM25 index's
  // companion refreshes
  private def inParallel(fs: (() => Unit)*): Unit =
    graft.sinks.MaintainerOps.inParallel(fs: _*)

  /** Per-phase wall timings of the gate builds (q_mv / q_mj), keyed by
    * short phase names — the r19 verdict's prep-attribution ask:
    * [[graft.Bench]] writes these into the committed
    * `bench_history/prep_<sf>.tsv`, so a driver-run prep regression
    * decomposes to the responsible build phase without costing stdout
    * budget. Members of an `inParallel` group each record their OWN
    * wall time and the group records a `*_wall` entry — `sum(members) ≫
    * wall` is healthy overlap; `wall ≈ sum(members)` under concurrency
    * is the scheduler/GC-contention signature the r19 driver run
    * exhibited on prep_mv.
    */
  private[graft] val prepPhases =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  private[graft] def clearPrepPhases(): Unit = prepPhases.clear()

  private def ph[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime
    try body
    finally {
      prepPhases.merge(name, (System.nanoTime - t0) / 1e9, (a, b) => a + b)
      ()
    }
  }

  def lakeFor(s: SparkSession, dir: String): LakeSink =
    built.computeIfAbsent(dir, d => build(s, d))

  private def build(s: SparkSession, dir: String): LakeSink = {
    val root = new Path(
      new Path(System.getProperty("java.io.tmpdir")),
      "graft_lake_q_" + Integer.toHexString(dir.hashCode)).toString
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    // a fresh JVM rebuilds from scratch — a stale root from a crashed
    // previous process must not leak half-built state into the queries
    f.delete(rootPath, true)
    val sink = new LakeSink(root, baseBuckets = 16)
    // seed batch fanned out (Tables.fanOut): the source scan is one
    // unsplittable row group, and every later fold reads this batch's
    // files — one file would serialize every downstream fold's scan+CPU.
    // Churn batches stay narrow (near-empty files otherwise).
    val ordersNarrow = Tables.orders(s, dir)
    val orders = Tables.fanOut(ordersNarrow)
    val mapT = "map<string,string>"
    val cents0 = cents(col("o_totalprice"))
    val newCents = bump(cents0)
    val curCents =
      when(col("o_orderkey") % 7 === 0, newCents).otherwise(cents0)
    sink.appendBatch(envelope(orders, "insert", L0,
      lit(null).cast(mapT), img(cents0)), 0L)
    sink.compact(s) // BASE covers batch 0; batches 1-2 are the fold tail
    sink.appendBatch(envelope(ordersNarrow.filter(col("o_orderkey") % 7 === 0),
      "update", L1, img(cents0), img(newCents)), 1L)
    sink.appendBatch(envelope(ordersNarrow.filter(col("o_orderkey") % 13 === 0),
      "delete", L2, img(curCents), lit(null).cast(mapT)), 2L)
    // batch 0's changelog is deletable (BASE covers it): every later read
    // must survive on manifest + marks alone
    sink.vacuum(s)
    sink
  }

  // Price sums stay in BIGINT cents end to end (see [[cents]]): integer
  // sums are exact under any aggregation order and need no rendering or
  // rounding agreement between the engines — the r12 double→string→
  // DECIMAL discipline flipped cents at the driver's DuckDB/JDK pair.
  private def aggState(st: DataFrame): DataFrame =
    st.select(
        element_at(col("after"), "o_orderstatus").as("o_orderstatus"),
        element_at(col("after"), "o_orderkey").cast("long").as("k"),
        element_at(col("after"), "o_totalprice_cents").cast("long").as("pc"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast("long").as("sum_key"),
        sum(col("pc")).cast("long").as("sum_price_cents"))
      .orderBy("o_orderstatus")

  /** Latest state after all three batches: BASE + tail fold, post-vacuum. */
  def lakeState(s: SparkSession, dir: String): DataFrame =
    aggState(lakeFor(s, dir).latestState(s, "public", "orders"))

  /** Time travel to the end of batch 1: updates applied, deletes not. */
  def lakeAsOf(s: SparkSession, dir: String): DataFrame =
    aggState(lakeFor(s, dir).stateAsOf(s, "public", "orders", asOf = 1L))

  // ---------------------------------------------------------------------
  // q_mv — the MAINTAINED-VIEW runtime loop under the oracle gate.
  //
  // q_ivm drives IncrementalAgg.step directly on in-memory frames; this
  // drives the full persistence loop around it: the lake's durable named
  // cursor, MaintainedView.refresh polling one committed batch per call,
  // the bucketed state log (only touched buckets rewritten per refresh),
  // and the stateAsOf-pinned dirty-group recompute that min/max
  // retraction triggers. Same deterministic three-batch churn as
  // q_lake_state, but on its OWN lake root so a refresh runs AFTER EACH
  // batch (the shared lake vacuums batch 0's changelog before any view
  // could poll it).

  // ---- the maintained-INDEX gates ride q_mv (round 17) ----------------
  //
  // The mv lake's images additionally carry a deterministic embedding and
  // text derived from order columns, so the SAME three-batch churn drives
  // the two maintained indexes under the driver's oracle:
  //
  //  - MaintainedIvfIndex: squared-L2 argmin assignment is engine-neutral
  //    and DuckDB-expressible, so its per-cell posting counts ride q_mv as
  //    three constant BIGINT columns checked against a SQL recompute. The
  //    embedding's second component derives from the CURRENT price cents,
  //    so the %7 bump MOVES postings between cells and the %13 deletes
  //    retract them — assignment, migration, and retraction all under the
  //    hash gate. Components are small integers (exact in float and
  //    double alike; ties break to the lower cell on both engines).
  //
  //  - MaintainedLshIndex: xxhash64 signatures are deliberately not
  //    oracle-expressible, so its gate is the churn==rebuild equivalence
  //    asserted INSIDE this build (assertConsistent: maintained state ==
  //    seed-style recompute of the surviving corpus) — a drift throws and
  //    turns the driver's q_mv entry red, not just a spec. The text is
  //    price-independent, so the same %7 updates must telescope to
  //    zero-net signature deltas.
  //
  // (The bench's stdout line budget is exhausted — SURVEY §6 — so the
  // verdict's ask is explicitly to ride an existing entry, not add one.)
  private val MvCentroids = Seq(Seq(3f, 3f), Seq(13f, 4f), Seq(8f, 14f))

  private def mvEmb(priceCents: Column): Column =
    concat_ws(",", (col("o_orderkey") % 19).cast("string"),
      (priceCents % 17).cast("string"))

  /** Text for the LSH gate on a DECLARED 10% subset (o_orderkey % 10 = 0;
    * the rest carry a NULL text and contribute no signatures — the
    * index's documented drop rule, here under the gated build). The
    * gate's purpose is maintenance==rebuild equivalence, which a 10%
    * corpus proves as well as 100% at a tenth of the per-round bench
    * cost; collisions stay plentiful (orders sharing status/priority/
    * key%40/cust%20 are exact text duplicates).
    */
  private def mvText: Column = when(col("o_orderkey") % 10 === 0, concat_ws(" ",
    col("o_orderstatus"), col("o_orderpriority"),
    (col("o_orderkey") % 40).cast("string"),
    (col("o_custkey") % 20).cast("string"),
    // "lake" appears twice: every subset doc carries a tf=2 posting, so
    // the oracle's bm_tf column is strictly greater than bm_postings and
    // genuinely load-bearing (all-unique tokens would make sum(tf) ==
    // count(postings) and let tf-corruption drift pass the gate)
    lit("lake order lake text")))

  private def imgMv(priceCents: Column): Column = map(
    lit("o_orderkey"), col("o_orderkey").cast("string"),
    lit("o_orderstatus"), col("o_orderstatus"),
    lit("o_custkey"), col("o_custkey").cast("string"),
    lit("o_totalprice_cents"), priceCents.cast("string"),
    lit("o_emb"), mvEmb(priceCents),
    lit("o_text"), mvText)

  /** The q_mv gate build's memo: the four served maintainers plus the
    * HYBRID gate row — (fused top-3 ids, floor(1e6·rrf₁)) from one fixed
    * probe through [[HybridRetrieval.searchAll]] over the maintained
    * BM25 + IVF state. Computed in the BUILD (prep-billed, rerun-exempt)
    * because the set read costs ~2.5 s of fixed job overhead at any SF —
    * the r17 verdict's bound-the-gate-cost ask; the oracle still
    * recomputes the whole ranking from scratch, so the gate's power is
    * unchanged, and the READ-latency story is pinned where it belongs
    * (the side reads' scale specs + SetProbeSpec, not the bench line).
    */
  private val builtViews = new java.util.concurrent.ConcurrentHashMap[
    String,
    (MaintainedView, MaintainedDistinct, MaintainedIvfIndex,
      MaintainedBm25Index, (Long, Long, Long, Long))]()

  private def viewFor(s: SparkSession, dir: String)
      : (MaintainedView, MaintainedDistinct, MaintainedIvfIndex,
        MaintainedBm25Index, (Long, Long, Long, Long)) =
    builtViews.computeIfAbsent(dir, d => buildView(s, d))

  private def buildView(s: SparkSession, dir: String)
      : (MaintainedView, MaintainedDistinct, MaintainedIvfIndex,
        MaintainedBm25Index, (Long, Long, Long, Long)) = {
    val root = new Path(
      new Path(System.getProperty("java.io.tmpdir")),
      "graft_lake_mv_" + Integer.toHexString(dir.hashCode)).toString
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(rootPath, true)
    val sink = new LakeSink(root, baseBuckets = 8)
    // integer-cents end to end (see [[cents]]): the envelope carries the
    // price as BIGINT cents, and the maintained sums/mins/maxs stay long —
    // exact under any aggregation or retraction order
    val priceCents = (i: Column) =>
      element_at(i, "o_totalprice_cents").cast("long")
    val agg = new IncrementalAgg(
      group = Seq("o_orderstatus" -> (i => element_at(i, "o_orderstatus"))),
      sums = Seq(
        "key" -> (i => element_at(i, "o_orderkey").cast("long")),
        "price_cents" -> priceCents),
      mins = Seq("price_cents" -> priceCents),
      maxs = Seq("price_cents" -> priceCents))
    // o_orderstatus is immutable per row in this churn (updates bump
    // price only) and every image carries it — so the min/max-retraction
    // dirty-group recompute runs GROUP-RESTRICTED (fold input pruned to
    // the dirty statuses) instead of folding all of orders, and the
    // oracle gate proves the restricted path end-to-end
    val view =
      new MaintainedView(sink, agg, "public", "orders", "mv", stateBuckets = 8,
        groupIsImmutable = true, groupCol = Some("o_orderstatus"))
    // the PERSISTENCE maintainer for count(DISTINCT o_custkey) rides the
    // same lake and churn on its own cursor — this puts
    // MaintainedDistinct's full loop (bucketed refcount state, replay
    // skip, carry-forward, gc) under the driver oracle, not just the
    // in-memory fold q_ivm gates. A customer holds several orders per
    // status, so the %13 deletes decrement refcounts that mostly stay
    // positive — the distinct count must NOT drop with them.
    val dist = new MaintainedDistinct(sink,
      new IncrementalDistinct(
        group = Seq("o_orderstatus" -> (i => element_at(i, "o_orderstatus"))),
        name = "cust",
        value = i => element_at(i, "o_custkey").cast("long")),
      "public", "orders", "mvd", stateBuckets = 8)
    // the two maintained indexes ride the same lake and churn on their
    // own cursors (see the gate rationale above the centroids)
    val ivf = new MaintainedIvfIndex(sink, "public", "orders", "mvivf",
      idKey = "o_orderkey", embKey = "o_emb",
      centroids = MvCentroids, stateBuckets = 8)
    val lsh = new MaintainedLshIndex(sink, "public", "orders", "mvlsh",
      idKey = "o_orderkey", textKey = "o_text", stateBuckets = 8)
    // the BM25 postings maintainer shares the same 10% text subset; its
    // tf postings ARE DuckDB-expressible (the proven string_split_regex
    // tokenizer), so q_mv carries (postings, Σtf) as oracle-checked
    // constant columns AND the churn==rebuild equivalence runs in-build
    // subBuckets = 2 puts the SUB-SLICED state geometry under the
    // cross-engine gate: the oracle's bm_* / hyb* recomputes hash-check
    // postings maintained through dirty-sub-slice rewrites every round
    val bm = new MaintainedBm25Index(sink, "public", "orders", "mvbm",
      idKey = "o_orderkey", textKey = "o_text", stateBuckets = 8,
      subBuckets = 2)
    // The gate maintains a DECLARED 50% subset of orders
    // (o_orderkey % 2 = 0, mirrored by the oracle's WHERE) — the same
    // gate-sizing rationale as q_mj's 25% (round-12 ask #7): this build
    // advances SEVEN maintainer cursors (view, distinct, ivf, lsh, bm's
    // postings/stats/df) through a seed fold apiece plus EIGHT
    // churn-span cursor refreshes (view after batch 1, all seven after
    // batch 2) and two sampled equivalence recomputes, each proportional
    // to the gate table, and the r17 verdict asked for prep_mv bounded
    // (ask #4). Maintenance LOGIC
    // coverage is unchanged — the same churn shapes hit the same code
    // paths on half the rows; full-table lake scale stays covered by
    // q_lake_state/q_lake_asof and the 10k-doc scale specs.
    // seed batch fanned out like the shared lake's (see [[build]]): its
    // file layout is what every maintainer's seed fold scans; churn
    // batches stay narrow (near-empty files otherwise — see buildJoin)
    val ordersNarrow = Tables.orders(s, dir).filter(col("o_orderkey") % 2 === 0)
    val orders = Tables.fanOut(ordersNarrow)
    val mapT = "map<string,string>"
    val cents0 = cents(col("o_totalprice"))
    val newCents = bump(cents0)
    val curCents =
      when(col("o_orderkey") % 7 === 0, newCents).otherwise(cents0)
    ph("mv_append0") {
      sink.appendBatch(envelope(orders, "insert", L0,
        lit(null).cast(mapT), imgMv(cents0)), 0L)
    }
    // The five maintainers are INDEPENDENT consumers (own cursors, own
    // state dirs) — refresh them concurrently, the shape a real
    // deployment runs (each maintainer is its own refresh loop; Spark
    // schedules concurrent jobs from multiple threads). At sf0.1 the
    // build is fixed-job-overhead-bound (~1-3 s per refresh regardless
    // of rows), so sequencing seven cursors serially was paying that
    // overhead seven times over (r17 verdict ask #4: bound prep_mv).
    // sharedFolds (r22): all five seeds recompute from stateAsOf over the
    // SAME pinned interval (batch 0) — the scope folds it once, persisted,
    // instead of once per maintainer
    ph("mv_seed_wall")(sink.sharedFolds(inParallel(
      () => ph("mv_seed_view")(view.refresh(s)), // full-state seed:
                             // every bucket written once
      () => ph("mv_seed_dist")(dist.refresh(s)), // refcount seed
                             // through the same span
      () => ph("mv_seed_ivf")(ivf.refresh(s)),   // posting seed: every
                             // order assigned once
      () => ph("mv_seed_lsh")(lsh.refresh(s)),   // signature seed: every
                             // order shingled once
      () => ph("mv_seed_bm")(bm.refresh(s)))))   // tf-posting seed
                             // (postings + stats + df)
    ph("mv_compact")(sink.compact(s)) // later recomputes resolve batch 0
                                      // through BASE
    ph("mv_append1") {
      sink.appendBatch(envelope(ordersNarrow.filter(col("o_orderkey") % 7 === 0),
        "update", L1, imgMv(cents0), imgMv(newCents)), 1L)
    }
    ph("mv_ref1_view")(view.refresh(s)) // signed update deltas, touched
                                        // buckets only
    ph("mv_append2") {
      sink.appendBatch(envelope(ordersNarrow.filter(col("o_orderkey") % 13 === 0),
        "delete", L2, imgMv(curCents), lit(null).cast(mapT)), 2L)
    }
    ph("mv_ref2_wall")(inParallel(
      () => ph("mv_ref2_view")(view.refresh(s)), // retractions: min/max
                             // dirty groups recompute from stateAsOf(2)
                             // — through BASE + tail, not latestState
      () => ph("mv_ref2_dist")(dist.refresh(s)), // ONE spanning refresh
                             // over batches 1-2: the bump's net-zero
                             // refcount deltas telescope away and the
                             // delete decrements land in the same
                             // merge; counts drop only at refcount zero
      () => ph("mv_ref2_ivf")(ivf.refresh(s)),   // same span: the bump's
                             // cents change MOVES postings (retract old
                             // cell, add new), deletes retract
      () => ph("mv_ref2_lsh")(lsh.refresh(s)),   // same span: price-only
                             // churn telescopes to zero-net signature
                             // deltas; deletes retract
      () => ph("mv_ref2_bm")(bm.refresh(s))))    // same span:
                             // text-unchanged updates telescope to
                             // zero-net tf deltas; deletes retract
                             // occurrences
    // the LSH and BM25 maintenance gates: maintained state must equal a
    // seed-style recompute of the surviving corpus — drift throws HERE,
    // inside the driver-gated q_mv build, on a DETERMINISTIC 25% doc
    // sample whose residue rotates with the applied interval: the
    // sampled recompute re-derives only ~1/4 of the subset's
    // signatures/postings (r17 verdict: the two full recomputes were
    // 58% of all bench prep). Coverage split, stated honestly: the
    // cross-engine oracle columns (IVF cell counts, BM25
    // postings/Σtf/vocab, all recomputed by DuckDB from scratch) catch
    // any drift that moves a COUNT; count-preserving drift (a posting
    // or cell assignment swapped between two docs) is caught by the
    // sampled equivalence only when a victim doc falls in the round's
    // sample (~44% per round at mod 4) — but the rotating residue means
    // a persisting swap cannot hide across refresh horizons. The
    // compared-row requirements keep the sampled equivalences
    // non-vacuous (a sample matching zero docs would prove nothing).
    ph("mv_assert_wall")(inParallel(
      () => ph("mv_assert_lsh")(require(
        lsh.assertConsistent(s, sampleMod = 4) > 0,
        "LSH gate vacuous: sampled equivalence compared no state rows")),
      () => ph("mv_assert_bm")(require(
        bm.assertConsistent(s, sampleMod = 4) > 0,
        "BM25 gate vacuous: sampled equivalence compared no state rows"))))
    require(!lsh.buckets(s).isEmpty,
      "LSH gate vacuous: no signatures in the maintained index state")
    ph("mv_vacuum")(sink.vacuum(s)) // all maintainers must keep serving
                    // after their source's folded changelog is gone
    // the HYBRID gate row (see the memo scaladoc): one fixed probe
    // through the full maintained hybrid read — BM25 set read + exact
    // IVF set read (nprobe = all 3 cells, so the vector ranking is
    // global L2 and the oracle needs no cell logic) fused by RRF —
    // with the fused top-3 ids and floor(1e6·rrf₁) riding q_mv as
    // BIGINT columns the oracle recomputes from scratch (the proven
    // tokenizer + BM25 formula + exact L2 + rank windows + 1/(60+rank)
    // fusion, ties on the id STRING both engines; floor, not round:
    // rounding-mode-neutral). Rank-monotone fusion bugs preserve id
    // order by construction — those are pinned by HybridRetrievalSpec's
    // hand-computed doubles; THIS gate is the cross-engine check that
    // maintenance + candidate reads + both scoring formulas + fusion
    // compose to the right RANKING. Deliberately AFTER vacuum: the
    // hybrid read must serve once the source's folded changelog is gone.
    val hybProbe = s.createDataFrame(Seq(("hq", "urgent lake", "9,9")))
      .toDF("pid", "q", "e")
    val hybRows = ph("mv_hybrid")(HybridRetrieval.searchAll(s, bm, ivf,
        hybProbe, "pid", "q", "e", k = 3, kLex = 10, kVec = 10, nprobe = 3)
      .orderBy(col("rrf").desc, col("id").asc).collect())
    // GATE CONTRACT: exactly 3 fused rows (hyb1..3 are fixed oracle
    // columns, so the gate cannot degrade with the corpus). The vector
    // side ranks every surviving subset doc (nprobe = all cells), so 3
    // rankable docs need only 3 survivors of the 50% subset post-churn —
    // orders ≥ ~8 rows, i.e. any sf ≥ 0.001 (the smallest generated
    // dir, where orders has 1500 rows). A smaller custom dir fails HERE,
    // loudly, not with a hash mismatch downstream.
    require(hybRows.length == 3,
      s"hybrid gate expects 3 fused rows, got ${hybRows.length} — the " +
        "gate supports sf >= 0.001 (>= ~8 orders rows); this corpus is " +
        "below its minimum")
    val hyb = (hybRows(0).getString(1).toLong,
      hybRows(1).getString(1).toLong, hybRows(2).getString(1).toLong,
      math.floor(hybRows(0).getDouble(2) * 1e6).toLong)
    (view, dist, ivf, bm, hyb)
  }

  /** The maintained view's served contents — a pure group-cardinality
    * state read, no fold, no scan of `orders` — joined with the
    * maintained distinct custkey count served from its refcount state.
    */
  def mvOrders(s: SparkSession, dir: String): DataFrame = {
    val (view, dist, ivf, bm, hyb) = viewFor(s, dir)
    // bounded planning pull (≤ |centroids| = 3 rows): the maintained IVF
    // index's per-cell posting counts ride q_mv as constant columns, hash-
    // checked against the oracle's squared-L2 argmin recompute
    val cells = ivf.cells(s).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // one-row pull: the BM25 index's (distinct postings, Σtf) — the
    // oracle recomputes both from the same tokenizer over the churned
    // subset texts, so tf maintenance drift turns the driver red
    val bmRow = bm.postings(s)
      .agg(count(lit(1)).cast("long"), sum(col("tf")).cast("long")).head()
    val (bmPostings, bmTf) =
      if (bmRow.isNullAt(1)) (0L, 0L) else (bmRow.getLong(0), bmRow.getLong(1))
    // one-row pull over the VOCABULARY-sized df view (the search-time
    // stop-term gate's state): its row count rides q_mv as an
    // oracle-checked column, and Σdf == distinct postings ties the df
    // state to the postings state row-for-row — df maintenance drift
    // (the +1/−1 per doc-term transition) fails HERE or cross-engine
    val dfRow = bm.termDfs(s)
      .agg(count(lit(1)).cast("long"), sum(col("df")).cast("long")).head()
    val bmVocab = dfRow.getLong(0)
    require((if (dfRow.isNullAt(1)) 0L else dfRow.getLong(1)) == bmPostings,
      s"BM25 df view diverged from postings: Σdf=${dfRow.get(1)} vs " +
        s"$bmPostings distinct postings")
    view.read(s).join(dist.read(s), Seq("o_orderstatus"), "left_outer")
      .select(
        col("o_orderstatus"),
        col("n").cast("long").as("n"),
        coalesce(col("nd_cust"), lit(0L)).cast("long").as("n_cust"),
        col("sum_key").cast("long").as("sum_key"),
        col("sum_price_cents").cast("long").as("sum_price_cents"),
        col("min_price_cents").cast("long").as("min_price_cents"),
        col("max_price_cents").cast("long").as("max_price_cents"),
        lit(cells.getOrElse(0, 0L)).as("ivf_c0"),
        lit(cells.getOrElse(1, 0L)).as("ivf_c1"),
        lit(cells.getOrElse(2, 0L)).as("ivf_c2"),
        lit(bmPostings).as("bm_postings"),
        lit(bmTf).as("bm_tf"),
        lit(bmVocab).as("bm_vocab"),
        lit(hyb._1).as("hyb1"),
        lit(hyb._2).as("hyb2"),
        lit(hyb._3).as("hyb3"),
        lit(hyb._4).as("hyb_rrf1"))
      .orderBy("o_orderstatus")
  }

  // ---------------------------------------------------------------------
  // q_mj — the MAINTAINED two-table equi-JOIN under the oracle gate.
  //
  // orders LEFT OUTER customer on custkey, maintained by dirty-key
  // recompute across three churn batches, each touching BOTH sides:
  //
  //  - batch 0: insert every customer + every order  → refresh (seed)
  //  - batch 1: bump o_totalprice ~10% (%97 keys) and
  //             c_acctbal ~10% (%53 custkeys)         → refresh
  //  - batch 2: delete orders (%89 keys) and
  //             CUSTOMERS (%101 custkeys)             → refresh
  //
  // The customer deletes are the interesting part: left_outer must flip
  // the surviving orders of a deleted customer from matched to
  // null-extended — exactly the transition a naive "recompute only
  // changed rows" maintenance misses. The final read aggregates the
  // served join state by market segment with the null-extended rows in
  // their own bucket; the oracle recomputes the same left join over the
  // equivalently churned tables.
  //
  // Churn fractions are SPARSE by design (prime moduli ~1-2% of keys):
  // the maintained join's whole point is churn-proportional refresh, and
  // the old %5/%7 fractions dirtied nearly every custkey per refresh —
  // the bench was timing a disguised full recompute (round-12 ask #7).
  // Correctness coverage is unchanged: both sides still see updates AND
  // deletes, overlap cases included (%53 ∩ %101 custkeys exist at sf0.1),
  // and c_acctbal exercises [[bump]] on NEGATIVE cents.
  //
  // Three further bench-scale levers, all declared to the oracle:
  //  - the join maintains a DETERMINISTIC 25% subset of orders
  //    (o_orderkey % 4 = 0, all customers): the fact side's recompute is
  //    a fold keyed on o_orderkey, which o_custkey restriction cannot
  //    prune (non-key predicate — see stateAsOf's soundness contract),
  //    so its per-refresh cost is table- not churn-proportional and the
  //    gate's table should be gate-sized;
  //  - churn batches 1 and 2 land BEFORE one spanning refresh, putting
  //    the join's multi-batch SPAN semantics (update and delete deltas
  //    telescoping to one dirty-key recompute) under the oracle gate —
  //    per-batch sequencing stays covered by q_mv and MaintainedJoinSpec;
  //  - no in-loop compaction: dirty-key recompute reading through a
  //    compacted BASE (and the restricted fold's BASE bucket pruning) is
  //    gated by q_lake_state/q_lake_asof and spec'd by
  //    MaintainedJoinSpec's row-key and seedCursor tests — repeating it
  //    here bought ~2.3 s of bench time for no new coverage.

  private val builtJoins = new java.util.concurrent.ConcurrentHashMap[
    String,
    (MaintainedJoin, (Long, Long, Long, Long), Seq[(String, Long, Long)])]()

  private def joinFor(s: SparkSession, dir: String)
      : (MaintainedJoin, (Long, Long, Long, Long), Seq[(String, Long, Long)]) =
    builtJoins.computeIfAbsent(dir, d => buildJoin(s, d))

  private def cimg(balCents: Column): Column = map(
    lit("c_custkey"), col("c_custkey").cast("string"),
    lit("c_mktsegment"), col("c_mktsegment"),
    lit("c_acctbal_cents"), balCents.cast("string"))

  private def oimg(priceCents: Column): Column = map(
    lit("o_orderkey"), col("o_orderkey").cast("string"),
    lit("o_custkey"), col("o_custkey").cast("string"),
    lit("o_orderstatus"), col("o_orderstatus"),
    lit("o_totalprice_cents"), priceCents.cast("string"))

  private def cenv(df: DataFrame, op: String, commitLsn: Long,
      before: Column, after: Column): DataFrame =
    df.select(
      (lit(commitLsn) + col("c_custkey")).as("lsn"),
      lit(commitLsn).as("commit_lsn"), lit(0L).as("xid"),
      lit(op).as("op"), lit("public").as("schema"), lit("customer").as("table"),
      timestamp_micros(lit(0L)).as("message_time"),
      timestamp_micros(lit(0L)).as("commit_time"),
      typedLit(Seq("c_custkey")).as("key_names"),
      before.as("before"), after.as("after"))

  private def oenv(df: DataFrame, op: String, commitLsn: Long,
      before: Column, after: Column): DataFrame =
    df.select(
      (lit(commitLsn) + col("o_orderkey")).as("lsn"),
      lit(commitLsn).as("commit_lsn"), lit(0L).as("xid"),
      lit(op).as("op"), lit("public").as("schema"), lit("orders").as("table"),
      timestamp_micros(lit(0L)).as("message_time"),
      timestamp_micros(lit(0L)).as("commit_time"),
      typedLit(Seq("o_orderkey")).as("key_names"),
      before.as("before"), after.as("after"))

  private def buildJoin(s: SparkSession, dir: String)
      : (MaintainedJoin, (Long, Long, Long, Long), Seq[(String, Long, Long)]) = {
    val root = new Path(
      new Path(System.getProperty("java.io.tmpdir")),
      "graft_lake_mj_" + Integer.toHexString(dir.hashCode)).toString
    val rootPath = new Path(root)
    val f = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    f.delete(rootPath, true)
    // the delta join's emitted OUTPUT changelog lands in its own lake —
    // the composition gate's downstream source (round 20)
    val outRoot = root + "_out"
    f.delete(new Path(outRoot), true)
    val sink = new LakeSink(root, baseBuckets = 4)
    val outLake = new LakeSink(outRoot, baseBuckets = 4)
    val join = new MaintainedJoin(sink,
      left = ("public", "orders"), right = ("public", "customer"),
      leftKey = i => element_at(i, "o_custkey"),
      rightKey = i => element_at(i, "c_custkey"),
      name = "mj", joinType = "left_outer", stateBuckets = 4,
      // custkey IS customer's replica key: the dim side recomputes via
      // the key-restricted fold (touched buckets of BASE, not the table)
      rightKeyIsRowKey = true,
      // o_custkey never changes across an order's versions and every
      // image carries it: the FACT side's recompute prunes its fold
      // input to the touched custkeys instead of folding all of orders —
      // the churn-proportional shape for FK joins at scale, and this
      // gate proves it against the DuckDB oracle
      leftKeyImmutable = true, leftKeyCol = Some("o_custkey"))
    // the SIGNED-DELTA join rides the same lake and churn on its own
    // cursor, in LEFT OUTER mode (round 19) — delta algebra (telescoped
    // spans, the cross term), the pair-refcount state, sub-slicing
    // (subBuckets = 2), AND the outer null-extension machinery (the
    // per-custkey match-count companion; the %101 customer deletes force
    // >0→0 flips whose surviving orders move matched → null-extended)
    // all under the cross-engine gate: the oracle recomputes the left
    // join's row/pair counts and both cents sums from scratch
    val djoin = new MaintainedDeltaJoin(sink,
      left = ("public", "orders"), right = ("public", "customer"),
      leftKey = i => element_at(i, "o_custkey"),
      rightKey = i => element_at(i, "c_custkey"),
      name = "mjd", joinType = "left_outer", stateBuckets = 4,
      subBuckets = 2, rightKeyIsRowKey = true,
      // the fact side's fold prunes to the churned custkeys (the
      // immutable tier) instead of folding all of orders per refresh
      leftKeyImmutable = true, leftKeyCol = Some("o_custkey"),
      // COMPOSITION (round 20): the join's output delta lands as a
      // changelog in outLake, and the downstream MaintainedView below
      // maintains a per-segment aggregate OVER the join from it —
      // churn-proportional end to end, gated by the oracle's djv_*
      // recompute
      emitTo = Some(outLake))
    // the downstream aggregate over the EMITTED join output: per market
    // segment (null-extended rows under UNMATCHED), count + price-cents
    // sum — its served rows ride q_mj as djv_* columns the oracle
    // recomputes from the churned tables from scratch
    val dview = new MaintainedView(outLake,
      new IncrementalAgg(
        group = Seq("seg" -> (i =>
          coalesce(element_at(i, "r.c_mktsegment"), lit("UNMATCHED")))),
        sums = Seq("price_cents" -> (i =>
          element_at(i, "l.o_totalprice_cents").cast("long")))),
      djoin.emitTable._1, djoin.emitTable._2, "mjdagg", stateBuckets = 4)
    // the declared fact-side subset (25%) — the oracle and LakeQueriesSpec
    // recompute over exactly this slice
    // seed batches fanned out (parallel downstream folds); churn batches
    // stay on the narrow scan — a 1-2% filter repartitioned to the full
    // parallelism writes dozens of near-empty files per append and every
    // later span read pays per-file overhead for nothing
    val ordersNarrow = Tables.orders(s, dir).filter(col("o_orderkey") % 4 === 0)
    val orders = Tables.fanOut(ordersNarrow)
    val custNarrow = Tables.customer(s, dir)
    val cust = Tables.fanOut(custNarrow)
    val mapT = "map<string,string>"
    val pCents0 = cents(col("o_totalprice"))
    val pCentsNew = bump(pCents0)
    val pCentsCur =
      when(col("o_orderkey") % 97 === 0, pCentsNew).otherwise(pCents0)
    val bCents0 = cents(col("c_acctbal")) // negative for ~10% of customers
    val bCentsNew = bump(bCents0)
    ph("mj_append0") {
      sink.appendBatch(
        cenv(cust, "insert", L0, lit(null).cast(mapT), cimg(bCents0))
          .unionByName(oenv(orders, "insert", L0 + 50000000L,
            lit(null).cast(mapT), oimg(pCents0))), 0L)
    }
    // sharedFolds (r22): both join maintainers seed from stateAsOf of the
    // SAME two tables over the same pinned interval — fold each table once
    sink.sharedFolds {
      ph("mj_seed_join")(join.refresh(s)) // seed: every bucket written once
      ph("mj_seed_dj")(djoin.refresh(s))  // also emits the seeded output
                                          // (truncate + inserts)
    }
    ph("mj_seed_dview")(dview.refresh(s)) // downstream seed from the
                                          // emitted batch
    ph("mj_append12") {
      sink.appendBatch(
        cenv(custNarrow.filter(col("c_custkey") % 53 === 0), "update", L1,
          cimg(bCents0), cimg(bCentsNew))
          .unionByName(oenv(ordersNarrow.filter(col("o_orderkey") % 97 === 0),
            "update", L1 + 50000000L,
            oimg(pCents0), oimg(pCentsNew))), 1L)
      sink.appendBatch(
        cenv(custNarrow.filter(col("c_custkey") % 101 === 0), "delete", L2,
          cimg(when(col("c_custkey") % 53 === 0, bCentsNew)
            .otherwise(bCents0)), lit(null).cast(mapT))
          .unionByName(oenv(ordersNarrow.filter(col("o_orderkey") % 89 === 0),
            "delete", L2 + 50000000L,
            oimg(pCentsCur), lit(null).cast(mapT))), 2L)
    }
    ph("mj_ref_join")(join.refresh(s)) // ONE refresh spans both churn
                    // batches: update and delete deltas telescope into
                    // one dirty-key recompute, and surviving orders of
                    // dropped customers flip matched → null-extended vs
                    // the seed
    ph("mj_ref_dj")(djoin.refresh(s)) // the delta join's span
                     // telescoping + cross term run over the same
                     // two-batch span; the span's signed output delta
                     // (incl. the %101 deletes' matched→UNMATCHED flip
                     // transitions) emits as one changelog batch
    ph("mj_ref_dview")(dview.refresh(s)) // the downstream aggregate
                     // absorbs the emitted delta — no re-read of the
                     // join state
    ph("mj_vacuum")(sink.vacuum(s))
    // the delta-join gate scalars (prep-billed bounded pull, 1 row):
    // total left-outer rows, matched-pair count, the matched cents sum,
    // and the NULL-EXTENDED rows' price sum (pins WHICH rows the
    // match-count flips null-extended, not just how many) — all
    // recomputed by the oracle from the churned tables
    val p = element_at(col("left_after"), "o_totalprice_cents").cast("long")
    val b = element_at(col("right_after"), "c_acctbal_cents").cast("long")
    val djRow = ph("mj_dj_scalars")(djoin.read(s).select(
        count(lit(1)).cast("long"),
        count(col("right_after")).cast("long"),
        coalesce(sum(when(col("right_after").isNotNull, p + b)), lit(0L))
          .cast("long"),
        coalesce(sum(when(col("right_after").isNull, p)), lit(0L))
          .cast("long"))
      .head())
    // the COMPOSITION gate rows (prep-billed bounded pull, ≤ segments+1
    // rows): the downstream view's per-segment (count, price-cents sum),
    // maintained purely from the emitted changelog — the oracle
    // recomputes both per segment from the churned tables, so emission
    // or downstream-maintenance drift turns q_mj red
    val dviewRows = ph("mj_dview_scalars")(dview.read(s).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    (join, (djRow.getLong(0), djRow.getLong(1), djRow.getLong(2),
      djRow.getLong(3)), dviewRows)
  }

  /** Aggregate of the served join state by market segment (null-extended
    * rows under 'UNMATCHED') — a state read plus one group-by, no refold
    * of either table.
    */
  def mjOrders(s: SparkSession, dir: String): DataFrame = {
    val (join, dj, dv) = joinFor(s, dir)
    // the composed view's per-segment rows (maintained from the delta
    // join's EMITTED changelog) join in as djv_* columns — a FULL OUTER
    // join on seg, so a segment missing from the composed state NULLs
    // the djv_* columns and a stale EXTRA composed segment lands as its
    // own row with NULL aggregates: both drift directions fail the
    // driver's row/hash check loudly
    val dviewDf = s.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(
          dv.map { case (seg, n, cents) =>
            org.apache.spark.sql.Row(seg, n, cents) }).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("seg",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("djv_n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("djv_cents",
            org.apache.spark.sql.types.LongType))))
    join.read(s).select(
        coalesce(element_at(col("right_after"), "c_mktsegment"),
          lit("UNMATCHED")).as("seg"),
        element_at(col("left_after"), "o_totalprice_cents")
          .cast("long").as("p"),
        element_at(col("right_after"), "c_acctbal_cents")
          .cast("long").as("b"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"),
        count(col("b")).as("n_matched"),
        sum(col("p")).cast("long").as("sum_price_cents"),
        sum(col("b")).cast("long").as("sum_bal_cents"))
      // no broadcast hint: Spark cannot broadcast the build side of a
      // full outer join (it would warn and ignore it); both sides are
      // segment-cardinality rows
      .join(dviewDf, Seq("seg"), "full_outer")
      .withColumn("dj_rows", lit(dj._1))
      .withColumn("dj_pairs", lit(dj._2))
      .withColumn("dj_cents", lit(dj._3))
      .withColumn("dj_null_cents", lit(dj._4))
      .orderBy("seg")
  }
}
