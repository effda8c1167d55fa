package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Marker-committed parquet state versions under one directory — the
  * shared persistence protocol of the maintained views: state for a span
  * lands under `asof=<hi>` and becomes visible only once its marker in
  * `_commits/<hi>` exists, so a crash mid-write is invisible and a replay
  * that finds its marker skips the rewrite (concurrent reads never see a
  * committed version torn).
  */
private[sinks] final class StateLog(dir: Path) {

  private def commitsDir = new Path(dir, "_commits")

  def fs(spark: SparkSession): FileSystem =
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed state versions, ascending. */
  def committed(f: FileSystem): Seq[Long] =
    if (!f.exists(commitsDir)) Seq.empty
    else f.listStatus(commitsDir).toSeq
      .flatMap(st => st.getPath.getName.toLongOption).sorted

  def read(spark: SparkSession, asOf: Long): DataFrame =
    spark.read.parquet(new Path(dir, s"asof=$asOf").toString)

  def isCommitted(f: FileSystem, asOf: Long): Boolean =
    f.exists(new Path(commitsDir, asOf.toString))

  /** Write one state version and commit it with a marker. */
  def commit(f: FileSystem, state: DataFrame, asOf: Long): Unit = {
    state.write.mode("overwrite")
      .parquet(new Path(dir, s"asof=$asOf").toString)
    f.mkdirs(commitsDir)
    f.create(new Path(commitsDir, asOf.toString), true).close()
  }

  /** Drop versions strictly below the replay horizon. */
  def gcBelow(f: FileSystem, horizon: Long): Unit =
    committed(f).filter(_ < horizon).foreach { v =>
      f.delete(new Path(dir, s"asof=$v"), true)
      f.delete(new Path(commitsDir, v.toString), false)
    }
}
