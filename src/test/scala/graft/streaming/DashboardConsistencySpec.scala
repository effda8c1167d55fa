package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.tools.{WalFile, WalGen}

/** The dashboard is a contract: every Prometheus series
  * `grafana/dashboard.json` plots must actually be served by
  * [[GraftMetricsServer]] with the full ops surface attached — otherwise
  * a rename on either side ships silently broken panels.
  */
class DashboardConsistencySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("every series the dashboard plots is served on /metrics") {
    // collect every graft_* series name from the dashboard's PromQL exprs
    val json = new String(
      Files.readAllBytes(java.nio.file.Paths.get("grafana/dashboard.json")), "UTF-8")
    val series = raw""""expr":\s*"([^"]+)"""".r.findAllMatchIn(json)
      .flatMap(m => raw"graft_[a-z0-9_]*[a-z0-9]".r.findAllIn(m.group(1)))
      .toSet
    assert(series.size >= 20, s"dashboard should plot a rich series set, found: $series")

    // a full ops stack: stream + listener + task counters + snapshot + slot
    val wal = Files.createTempFile("wal-dash", ".bin").toString
    WalFile.write(wal, WalGen.frames(3, 2))
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    val tasks = new GraftTaskMetricsListener
    spark.sparkContext.addSparkListener(tasks)
    val snapshot = new graft.snapshot.SnapshotProgress(spark.sparkContext)
    val slotInfo = graft.services.SlotManager.SlotInfo(
      "s", "logical", active = true, activePid = None,
      restartLsn = 0x10L, confirmedFlushLsn = 0x20L,
      walStatus = "reserved", currentLsn = 0x30L)
    val server = new GraftMetricsServer(listener, port = 0,
      slotInfo = Some(() => Some(slotInfo)),
      snapshot = Some(snapshot), taskCounters = Some(tasks))
    try {
      val q = spark.readStream.format("pgcdc").option("path", wal)
        .load().writeStream.format("memory").queryName("dash_sink")
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      val deadline = System.currentTimeMillis() + 10000
      def scrape(): String = {
        val in = java.net.URI.create(
          s"http://localhost:${server.boundPort}/metrics").toURL.openStream()
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      var served = Set.empty[String]
      while ({
        served = scrape().linesIterator.filterNot(_.startsWith("#"))
          .flatMap(l => l.split(" ").headOption).toSet
        !series.subsetOf(served) && System.currentTimeMillis() < deadline
      }) Thread.sleep(50)
      val missing = series -- served
      assert(missing.isEmpty,
        s"dashboard plots series the endpoint never serves: $missing\nserved: $served")
    } finally {
      server.close()
      spark.streams.removeListener(listener)
    }
  }
}
