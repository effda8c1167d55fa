package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Marker-committed parquet state versions under one directory — the
  * shared persistence protocol of the maintained views: state for a span
  * lands under `asof=<neg>_<pos>` and becomes visible only once its marker
  * in `_commits/` exists, so a crash mid-write is invisible and a replay
  * that finds its marker skips the rewrite (concurrent reads never see a
  * committed version torn).
  *
  * Versions are keyed by the consumer's CURSOR INTERVAL after the span —
  * the two-sided `[neg, pos]` batch-id range applied so far (epochs count
  * up from 0, snapshot batches down from -1). Intervals only ever grow,
  * so version order is containment order: the latest state is the maximal
  * interval, and the replay-prev for a span is the maximal version
  * contained in the pre-span cursor. A legacy single-ended version
  * `asof=<hi>` reads as `[0, hi]`.
  */
/** The `[neg, pos]` interval-key protocol both state logs share: one
  * spelling, one containment order, one replay-prev rule — a single
  * definition so the logs can never silently diverge.
  */
private[sinks] object IntervalKeys {

  def name(key: (Long, Long)): String = s"${key._1}_${key._2}"

  def parse(name: String): Option[(Long, Long)] =
    name.split("_") match {
      case Array(a, b) => for (n <- a.toLongOption; p <- b.toLongOption) yield (n, p)
      case _ => None
    }

  /** Intervals only grow, so containment order IS `(pos, -neg)`. */
  def sorted(keys: Seq[(Long, Long)]): Seq[(Long, Long)] =
    keys.sortBy { case (n, p) => (p, -n) }

  /** The maximal key contained in `from` — the replay-prev. */
  def within(sortedKeys: Seq[(Long, Long)], from: (Long, Long)): Option[(Long, Long)] =
    sortedKeys.filter { case (n, p) => n >= from._1 && p <= from._2 }.lastOption

  /** True when `a` strictly succeeds `b` in containment order. */
  def succeeds(a: (Long, Long), b: (Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
}

private[sinks] final class StateLog(dir: Path) {

  private def commitsDir = new Path(dir, "_commits")

  private def keyOf(name: String): Option[(Long, Long)] =
    IntervalKeys.parse(name).orElse(
      // legacy single-ended spelling `asof=<hi>` reads as [0, hi]
      if (name.contains("_")) None
      else name.toLongOption.map(v => (0L, v)))

  private def nameOf(key: (Long, Long)): String = IntervalKeys.name(key)

  def fs(spark: SparkSession): FileSystem =
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions in containment order (latest = last). */
  def committed(f: FileSystem): Seq[(Long, Long)] =
    if (!f.exists(commitsDir)) Seq.empty
    else IntervalKeys.sorted(
      f.listStatus(commitsDir).toSeq.flatMap(st => keyOf(st.getPath.getName)))

  /** The newest committed version, if any. */
  def latest(f: FileSystem): Option[(Long, Long)] = committed(f).lastOption

  /** The replay-prev: the maximal committed version CONTAINED in the
    * pre-span cursor interval (so a replayed span recomputes from the
    * state before it, never from its own output).
    */
  def latestWithin(f: FileSystem, from: (Long, Long)): Option[(Long, Long)] =
    IntervalKeys.within(committed(f), from)

  def read(spark: SparkSession, key: (Long, Long)): DataFrame = {
    // Mirror [[isCommitted]]: fall back to the LEGACY single-ended
    // directory only when its MARKER exists (and the two-sided marker
    // does not). Keying on directory existence alone would let
    // uncommitted crash debris from the old code (parquet landed, no
    // marker) shadow a version newly committed under the two-sided name.
    val f = fs(spark)
    val newCommitted = f.exists(new Path(commitsDir, nameOf(key)))
    val p =
      if (!newCommitted && key._1 == 0 &&
          f.exists(new Path(commitsDir, key._2.toString)))
        new Path(dir, s"asof=${key._2}")
      else new Path(dir, s"asof=${nameOf(key)}")
    spark.read.parquet(p.toString)
  }

  def isCommitted(f: FileSystem, key: (Long, Long)): Boolean =
    f.exists(new Path(commitsDir, nameOf(key))) ||
      (key._1 == 0 && f.exists(new Path(commitsDir, key._2.toString)))

  /** Write one state version and commit it with a marker. */
  def commit(f: FileSystem, state: DataFrame, key: (Long, Long)): Unit = {
    state.write.mode("overwrite")
      .parquet(new Path(dir, s"asof=${nameOf(key)}").toString)
    f.mkdirs(commitsDir)
    f.create(new Path(commitsDir, nameOf(key)), true).close()
  }

  /** Delete one version's data and markers (including the legacy
    * single-ended spelling of a `[0, hi]` key).
    */
  def retire(f: FileSystem, key: (Long, Long)): Unit = {
    f.delete(new Path(dir, s"asof=${nameOf(key)}"), true)
    f.delete(new Path(commitsDir, nameOf(key)), false)
    if (key._1 == 0) {
      f.delete(new Path(dir, s"asof=${key._2}"), true)
      f.delete(new Path(commitsDir, key._2.toString), false)
    }
  }

  /** Drop versions strictly contained in the replay horizon, except the
    * maximal one (the replay-prev stays until the horizon passes it).
    */
  def gcWithin(f: FileSystem, from: (Long, Long)): Unit =
    committed(f)
      .filter { case (n, p) => n >= from._1 && p <= from._2 }
      .dropRight(1).foreach(retire(f, _))
}
