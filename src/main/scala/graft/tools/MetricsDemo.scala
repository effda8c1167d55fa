package graft.tools

import org.apache.spark.sql.SparkSession

/** Run the pgcdc stream over a WAL frame file with the FULL ops surface
  * attached — listener, Prometheus endpoint, snapshot gauges — then scrape
  * and print `/metrics`: the runnable face of the metrics parity work
  * (reference `internal/http/server.go` + `internal/metric/metric.go`).
  *
  * Usage: MetricsDemo <wal-file>
  */
object MetricsDemo {
  def main(args: Array[String]): Unit = {
    val walFile = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("pgcdc-metrics-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val listener = new graft.streaming.GraftMetricsListener
    spark.streams.addListener(listener)
    val tasks = new graft.streaming.GraftTaskMetricsListener
    spark.sparkContext.addSparkListener(tasks)
    val snapshot = new graft.snapshot.SnapshotProgress(spark.sparkContext)
    val server = new graft.streaming.GraftMetricsServer(
      listener, port = 0, snapshot = Some(snapshot), taskCounters = Some(tasks))
    println(s"-- serving /metrics on port ${server.boundPort}")

    // simulate a completed 1-table snapshot ahead of the stream, so the
    // graft_snapshot_* series carry real values in the scrape
    snapshot.begin(tables = 1)
    snapshot.addPlannedChunks(2)
    val (c, r) = (snapshot.completedChunks, snapshot.rowsRead)
    spark.sparkContext.parallelize(1 to 2, 2).foreach { _ => c.add(1); r.add(50) }
    snapshot.tableDone(); snapshot.end()

    val q = spark.readStream.format("pgcdc")
      .option("path", walFile)
      .load()
      .writeStream.format("memory").queryName("cdc_metrics").outputMode("append")
      .start()
    q.processAllAvailable()
    // listener events arrive asynchronously; give the bus a moment
    val deadline = System.currentTimeMillis() + 5000
    while (listener.batchCount < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    q.stop()

    val url = java.net.URI.create(s"http://localhost:${server.boundPort}/metrics").toURL
    val in = url.openStream()
    val body = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    body.linesIterator.filterNot(_.startsWith("#")).foreach(println)
    println(s"-- ${body.linesIterator.count(!_.startsWith("#"))} series scraped")
    server.close()
    spark.stop()
  }
}
