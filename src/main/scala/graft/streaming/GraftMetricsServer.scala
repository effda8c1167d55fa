package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Prometheus text-exposition endpoint over a [[GraftMetricsListener]] —
  * the analogue of the reference's metrics HTTP server
  * (`internal/http/server.go:35-62`: `GET /metrics` + `GET /status`),
  * built on the JDK's HttpServer (no dependencies).
  *
  * Exposed series (text format 0.0.4):
  *  - every pgcdc source gauge from the latest `StreamingQueryProgress`,
  *    renamed camelCase → snake_case under the `graft_pgcdc_` namespace
  *    (`backlogTxns` → `graft_pgcdc_backlog_txns`; the reference's
  *    equivalent set lives under `go_pq_cdc_*`, `internal/metric/
  *    metric.go:16-38`). LSN-valued gauges (`confirmedLsn`) are exposed as
  *    their numeric WAL position, like the reference's
  *    `slot_confirmed_flush_lsn` float gauge;
  *  - listener counters: `graft_pgcdc_input_rows_total`,
  *    `graft_pgcdc_batches_total`.
  *
  * Bind with port 0 for an ephemeral port (tests), or
  * `cfg.metricPort` in production. `close()` stops the server.
  */
final class GraftMetricsServer(listener: GraftMetricsListener, port: Int,
    /** `GET /slot` provider (reference `server.go:90-105`): wire
      * `() => slotManager.info()` here; None → 503 like the reference's
      * nil provider.
      */
    slotInfo: Option[() => Option[graft.services.SlotManager.SlotInfo]] = None,
    /** Snapshot-phase gauges ([[graft.snapshot.SnapshotProgress]]) — when
      * wired, `/metrics` also serves `graft_snapshot_*` series mirroring the
      * reference's `go_pq_cdc_snapshot_*` set (`internal/metric/metric.go:57-66`).
      */
    snapshot: Option[graft.snapshot.SnapshotProgress] = None,
    /** Executor task-counter totals ([[GraftTaskMetricsListener]]) — when
      * wired, `/metrics` also serves the reference dashboard's `*_total`
      * counters (`graft_pgcdc_insert_total` etc.).
      */
    taskCounters: Option[GraftTaskMetricsListener] = None,
    /** Lake-sink gauges (`graft.sinks.LakeSink.gauges`) — when wired,
      * `/metrics` serves `graft_lake_*` series (committed batches, last
      * batch id, compaction watermark). Provider-shaped like `slotInfo` so
      * a listing failure degrades to absent series, not a scrape error.
      */
    lakeGauges: Option[() => Seq[(String, Double)]] = None)
  extends AutoCloseable {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/metrics", (ex: HttpExchange) =>
    respond(ex, 200, render(), "text/plain; version=0.0.4; charset=utf-8"))
  server.createContext("/status", (ex: HttpExchange) =>
    respond(ex, 200, "OK", "text/plain; charset=utf-8"))
  server.createContext("/slot", (ex: HttpExchange) =>
    slotInfo.flatMap(f => try f() catch { case scala.util.control.NonFatal(_) => None }) match {
      case Some(info) => respond(ex, 200, slotJson(info), "application/json; charset=utf-8")
      case None => respond(ex, 503, "slot info not available", "text/plain; charset=utf-8")
    })
  server.setExecutor(null)
  server.start()

  private def slotJson(i: graft.services.SlotManager.SlotInfo): String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    s"""{"name":${q(i.name)},"slotType":${q(i.slotType)},"active":${i.active},""" +
      s""""activePid":${i.activePid.getOrElse(null)},""" +
      s""""restartLsn":${q(graft.pgproto.Lsn.format(i.restartLsn))},""" +
      s""""confirmedFlushLsn":${q(graft.pgproto.Lsn.format(i.confirmedFlushLsn))},""" +
      s""""walStatus":${q(i.walStatus)},""" +
      s""""currentLsn":${q(graft.pgproto.Lsn.format(i.currentLsn))},""" +
      s""""retainedWalSize":${i.retainedWalSize},"lag":${i.lag}}"""
  }

  /** The actually-bound port (differs from the requested one when 0). */
  def boundPort: Int = server.getAddress.getPort

  override def close(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: String, ctype: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    try {
      ex.getResponseHeaders.set("Content-Type", ctype)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    } finally ex.close()
  }

  /** One scrape: counters from the listener + the latest source gauges. */
  private[streaming] def render(): String = {
    val sb = new StringBuilder
    def series(name: String, mtype: String, help: String, value: String): Unit = {
      sb.append("# HELP ").append(name).append(' ').append(help).append('\n')
      sb.append("# TYPE ").append(name).append(' ').append(mtype).append('\n')
      sb.append(name).append(' ').append(value).append('\n')
    }
    series("graft_pgcdc_input_rows_total", "counter",
      "rows delivered across all micro-batches", listener.totalInputRows.toString)
    series("graft_pgcdc_batches_total", "counter",
      "micro-batches completed", listener.batchCount.toString)
    listener.sourceMetrics.toSeq.sortBy(_._1).foreach { case (k, v) =>
      numericValue(k, v).foreach { num =>
        series("graft_pgcdc_" + snakeCase(k), "gauge",
          s"pgcdc source gauge $k", num)
      }
    }
    // the reference's process_latency (`internal/metric/metric.go:48-49`):
    // wall time spent executing the last trigger
    listener.lastProgress
      .flatMap(p => Option(p.durationMs).flatMap(d => Option(d.get("triggerExecution"))))
      .foreach(ms => series("graft_pgcdc_process_latency_ms", "gauge",
        "last trigger execution wall time (ms)", ms.toString))
    snapshot.foreach(_.gauges.foreach { case (suffix, value) =>
      val mtype = if (suffix == "rows_total") "counter" else "gauge"
      series("graft_snapshot_" + suffix, mtype,
        s"snapshot $suffix", renderDouble(value))
    })
    // per-op + decode counters summed from executor task metrics — the
    // reference dashboard's `*_total` series (`grafana/dashboard.json`)
    taskCounters.foreach(_.counters.toSeq.sortBy(_._1).foreach { case (suffix, v) =>
      series("graft_pgcdc_" + suffix, "counter",
        s"executor counter $suffix", v.toString)
    })
    // slot gauges (reference `internal/metric/metric.go:50-54`): the same
    // facts `/slot` serves as JSON, scrapeable as numeric series
    slotInfo.flatMap(f => try f() catch { case scala.util.control.NonFatal(_) => None })
      .foreach { i =>
        Seq[(String, Double)](
          "slot_activity" -> (if (i.active) 1.0 else 0.0),
          "slot_confirmed_flush_lsn" -> i.confirmedFlushLsn.toDouble,
          "slot_current_lsn" -> i.currentLsn.toDouble,
          "slot_retained_wal_size" -> i.retainedWalSize.toDouble,
          "slot_lag" -> i.lag.toDouble
        ).foreach { case (name, v) =>
          series("graft_" + name, "gauge", s"replication $name", renderDouble(v))
        }
      }
    // lake + maintainer gauges. A suffix may carry Prometheus labels
    // (`view_refresh_ms{view="x"}` — MaintainerOps series): HELP/TYPE are
    // emitted once per BARE name (duplicate TYPE lines are invalid
    // exposition when several maintainers share a series), then every
    // labeled sample under it.
    lakeGauges.map(f => try f() catch { case scala.util.control.NonFatal(_) => Seq.empty })
      .foreach { gs =>
        gs.groupBy { case (suffix, _) => suffix.takeWhile(_ != '{') }
          .toSeq.sortBy(_._1).foreach { case (bare, samples) =>
            val mtype = if (bare.endsWith("_total")) "counter" else "gauge"
            sb.append("# HELP graft_lake_").append(bare)
              .append(" lake sink ").append(bare).append('\n')
            sb.append("# TYPE graft_lake_").append(bare)
              .append(' ').append(mtype).append('\n')
            samples.foreach { case (suffix, v) =>
              sb.append("graft_lake_").append(suffix).append(' ')
                .append(renderDouble(v)).append('\n')
            }
          }
      }
    sb.toString
  }

  /** Integral-valued gauges print without a trailing `.0`. */
  private def renderDouble(d: Double): String =
    if (d == math.rint(d) && !d.isInfinite) d.toLong.toString else d.toString

  /** Gauge values arrive as strings; LSNs render as their numeric WAL
    * position, non-numeric values are skipped rather than emitted invalid.
    */
  private def numericValue(key: String, v: String): Option[String] =
    if (v == null) None
    else if (key.toLowerCase.endsWith("lsn"))
      scala.util.Try(graft.pgproto.Lsn.parse(v).toString).toOption
        .orElse(scala.util.Try { v.toDouble; v }.toOption)
    else scala.util.Try { v.toDouble; v }.toOption

  private def snakeCase(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
}

object GraftMetricsServer {
  /** Production wiring: register a fresh listener on the session's streams
    * and serve it on `cfg.metricPort`.
    */
  def start(spark: org.apache.spark.sql.SparkSession,
      cfg: graft.GraftConfig): (GraftMetricsListener, GraftMetricsServer) = {
    val listener = new GraftMetricsListener
    spark.streams.addListener(listener)
    val tasks = new GraftTaskMetricsListener
    spark.sparkContext.addSparkListener(tasks)
    (listener, new GraftMetricsServer(listener, cfg.metricPort,
      taskCounters = Some(tasks)))
  }
}
