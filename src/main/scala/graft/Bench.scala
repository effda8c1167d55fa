package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at the target SF, printing ONE
  * JSON line the driver parses. Methodology:
  *  - a warm-up pass at sf0.001 first, so JVM/codegen startup isn't billed to
  *    whichever query happens to run first;
  *  - shared persisted frames (shingle sets, LSH signatures) are built and
  *    timed as explicit `prep_*` entries BEFORE the query pass — without
  *    this, the first query to touch a memoized frame is billed for a build
  *    its siblings reuse and per-query numbers misattribute shared work
  *    (the warm-up corpus's caches are released first so nothing stale
  *    lingers);
  *  - the timed action is a `noop`-format write, which materializes EVERY
  *    column of every row — `count()` let Catalyst prune projection-shaped
  *    queries down to a scan of zero columns (q_column_projection and
  *    q_top_parts were measuring nothing);
  *  - failures are recorded per-query and fail the run (nonzero exit) — a
  *    throwing query must never read as a fast success.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up: run everything once at the smallest SF (codegen, classloading,
    // parquet footer caches). Warm-up failures are ignored — the timed pass
    // reports them.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // Drop the warm-up corpus's shared caches, then pre-build the measured
    // corpus's as their own timed entries.
    graft.operators.SharedCaches.releaseAll(spark)

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Settle between timed entries: without this, cache eviction and GC
    // debt from one query bleeds into the next's wall time (round-5 bench
    // showed unchanged queries inflated up to 9× by a neighbor's
    // unpersist), and a real regression would hide inside the noise. GC
    // runs outside the timed window; the sleep lets async block-manager
    // cleanup drain.
    def settle(): Unit = { System.gc(); Thread.sleep(150) }
    def timed(name: String, run: () => Unit): (String, Double) = {
      settle()
      val t0 = System.nanoTime()
      try run()
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val prep = graft.operators.SharedCaches.entries.map { case (name, build) =>
      timed(name, () => build(spark, sfDir).write.format("noop").mode("overwrite").save())
    }
    val results = prep ++ SparkEntry.queries.toSeq.map { case (name, fn) =>
      timed(name, () => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", " ").replace("\r", " ").replace("\t", " ")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
