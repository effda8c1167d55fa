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

    // a full ops stack: stream + listener + task counters + snapshot +
    // slot + a lake with one maintainer of each kind (view / splice
    // join / distinct / delta join / semantic dedup), refreshed once so
    // every MaintainerOps series carries a sample
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
    val lakeDir = Files.createTempDirectory("lake-dash").toString
    val sink = new graft.sinks.LakeSink(lakeDir)
    val T = new java.sql.Timestamp(1700000000000L)
    def lev(lsn: Long, table: String, m: Map[String, String]) =
      org.apache.spark.sql.Row(lsn, lsn, 7L, "insert", "public", table,
        T, T, Seq("id"), null, m)
    sink.appendBatch(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
          lev(1, "t", Map("id" -> "1", "grp" -> "a", "ref" -> "9",
            "emb" -> "1")),
          lev(2, "u", Map("id" -> "9", "name" -> "n")))).asJava),
      graft.cdc.ChangeEvent.schema), 0L)
    import org.apache.spark.sql.functions.element_at
    val mv = new graft.sinks.MaintainedView(sink,
      new graft.operators.IncrementalAgg(
        group = Seq("grp" -> (im => element_at(im, "grp"))), sums = Nil),
      "public", "t", "dashview")
    val mj = new graft.sinks.MaintainedJoin(sink,
      ("public", "u"), ("public", "t"),
      im => element_at(im, "id"), im => element_at(im, "ref"), "dashjoin")
    val mdd = new graft.sinks.MaintainedDistinct(sink,
      new graft.operators.IncrementalDistinct(
        group = Seq("grp" -> (im => element_at(im, "grp"))),
        name = "ref", value = im => element_at(im, "ref")),
      "public", "t", "dashdist")
    val mdj = new graft.sinks.MaintainedDeltaJoin(sink,
      ("public", "u"), ("public", "t"),
      im => element_at(im, "id"), im => element_at(im, "ref"), "dashdjoin")
    val msd = new graft.sinks.MaintainedSemDedup(sink, "public", "t",
      "dashsd", idKey = "id", embKey = "emb",
      centroids = Seq(Seq(0f), Seq(10f)), tau = 0.9)
    assert(mv.refresh(spark) == 1)
    assert(mj.refresh(spark) == 1)
    assert(mdd.refresh(spark) == 1)
    assert(mdj.refresh(spark, None) == 1)
    assert(msd.refresh(spark, None) == 1)
    val server = new GraftMetricsServer(listener, port = 0,
      slotInfo = Some(() => Some(slotInfo)),
      snapshot = Some(snapshot), taskCounters = Some(tasks),
      lakeGauges = Some(() => sink.gauges(spark) ++ mv.gauges(spark) ++
        mj.gauges(spark) ++ mdd.gauges(spark) ++ mdj.gauges(spark) ++
        msd.gauges(spark)))
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
        // a sample line may carry labels (view_refresh_ms{view="x"}) —
        // the dashboard matches on the bare series NAME
        served = scrape().linesIterator.filterNot(_.startsWith("#"))
          .flatMap(l => l.split(" ").headOption)
          .map(_.takeWhile(_ != '{')).toSet
        !series.subsetOf(served) && System.currentTimeMillis() < deadline
      }) Thread.sleep(50)
      val missing = series -- served
      assert(missing.isEmpty,
        s"dashboard plots series the endpoint never serves: $missing\nserved: $served")
    } finally {
      server.close()
      spark.streams.removeListener(listener)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(lakeDir))
    }
  }
}
