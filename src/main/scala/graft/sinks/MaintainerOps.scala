package graft.sinks

/** Per-refresh ops facts a maintainer records — the observability a
  * 100-TB deployment needs to operate a maintainer it cannot read whole:
  * how long the last refresh took, how much churn it applied (span
  * batches/rows, dirty keys), and how much state it physically rewrote
  * vs carried forward by manifest reference. The reference ships the
  * equivalent pipeline gauge set for its CDC loop
  * (`internal/metric/metric.go:16-38`); these are the maintainer-side
  * analogues.
  *
  * Every field is recorded from values the refresh already computes (the
  * span bounds aggregate, the delta's per-bucket counts, the
  * touched-bucket set), so recording adds NO extra Spark actions.
  *
  * Rendered as LABELED Prometheus series — `view_refresh_ms{view="x"}` —
  * so the series NAME is deployment-stable and one dashboard panel plots
  * every maintainer of a kind without knowing its name.
  */
private[sinks] final class MaintainerOps(kind: String, name: String) {
  @volatile private var lastRefreshMs: Double = -1
  @volatile private var lastSpanBatches: Double = 0
  @volatile private var lastSpanRows: Double = 0
  @volatile private var lastDirtyKeys: Double = 0
  @volatile private var lastBucketsRewritten: Double = 0
  @volatile private var lastBucketsCarried: Double = 0
  private val applied = new java.util.concurrent.atomic.AtomicLong

  /** Record one applied (non-empty) span: events for the maintained
    * table(s), delta/dirty-key cardinality, and the physical rewrite
    * split. A full rebuild (seed/truncate) reports every bucket
    * rewritten; a pure carry-forward reports zero.
    */
  def recordSpan(rows: Long, dirty: Long, rewritten: Int, carried: Int): Unit = {
    lastSpanRows = rows.toDouble
    lastDirtyKeys = dirty.toDouble
    lastBucketsRewritten = rewritten.toDouble
    lastBucketsCarried = carried.toDouble
  }

  /** Record one refresh() call: wall time and batches applied. */
  def recordRefresh(ms: Double, batches: Int): Unit = {
    lastRefreshMs = ms
    lastSpanBatches = batches.toDouble
    if (batches > 0) { applied.addAndGet(batches.toLong); () }
  }

  private def esc(s: String) =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
  private def lbl(suffix: String) = s"""${kind}_$suffix{$kind="${esc(name)}"}"""

  /** One extra labeled gauge in this maintainer's family — for facts a
    * maintainer computes outside the refresh loop (e.g. the served
    * version's bucket-size skew), rendered with the same
    * deployment-stable NAME + label shape as the built-in series.
    */
  def labeled(suffix: String, v: Double): (String, Double) = lbl(suffix) -> v

  /** Labeled gauge suffixes for the `graft_lake_*` family. */
  def gauges: Seq[(String, Double)] = Seq(
    lbl("refresh_ms") -> lastRefreshMs,
    lbl("span_batches") -> lastSpanBatches,
    lbl("span_rows") -> lastSpanRows,
    lbl("dirty_keys") -> lastDirtyKeys,
    lbl("buckets_rewritten") -> lastBucketsRewritten,
    lbl("buckets_carried") -> lastBucketsCarried,
    lbl("batches_applied_total") -> applied.get.toDouble)
}

/** Independent-consumer concurrency for maintainer operations. */
private[graft] object MaintainerOps {
  /** Run independent maintainer operations concurrently — each target is
    * its own consumer (own cursor, own state dir), and Spark is built
    * for concurrent job submission from multiple threads (a real
    * deployment runs each maintainer's refresh loop as its own
    * process). Failure semantics: every thread is joined, then the
    * first failure is rethrown with every OTHER failure attached as a
    * suppressed exception — a concurrent drift detection must not
    * vanish behind an unrelated sibling error.
    */
  def inParallel(fs: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = fs.map(f => new Thread(() => {
      try f() catch { case t: Throwable => errs.add(t) }
    }))
    ts.foreach(_.start())
    // join EVERY thread even if the caller is interrupted mid-join:
    // abandoning live refresh threads would let them run on after the
    // caller unwinds, violating the single-writer quiesce assumption a
    // subsequent rebuild depends on. The interrupt flag is restored
    // after the last join so cancellation still propagates.
    var interrupted = false
    ts.foreach { t =>
      var joined = false
      while (!joined) {
        try { t.join(); joined = true }
        catch { case _: InterruptedException => interrupted = true }
      }
    }
    if (interrupted) Thread.currentThread().interrupt()
    if (!errs.isEmpty) {
      val it = errs.iterator()
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }
}
