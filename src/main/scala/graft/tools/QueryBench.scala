package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop for one query's wall time: `runMain graft.tools.QueryBench
  * <sfDir> <nReps> <query> [query ...]`. Prints per-rep seconds so a
  * regression can be bisected without paying for the full Bench sweep.
  * Same session shape as [[graft.Bench]] (local[N], N shuffle partitions,
  * UTC, nanos-as-long) so numbers are comparable.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, reps, names @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps.toInt).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[qbench] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
