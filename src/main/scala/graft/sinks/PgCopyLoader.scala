package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import graft.services.Publication.quoteIdent

/** Bulk load a frame into a PostgreSQL table over `COPY … FROM STDIN` —
  * the fast path for delivering the initial snapshot into another pg
  * (pg→pg replication's bulk half; steady-state change apply stays on
  * [[PgApplySink]], which COPY cannot do — COPY has no ON CONFLICT).
  *
  * Spark shape: every partition opens its own wire connection
  * ([[graft.pgproto.PgConnection.copyIn]]) and streams its rows in ~64 KiB
  * CopyData chunks — one bulk channel per task, the exact parallelism of
  * the chunked snapshot read feeding it, nothing driver-side but the row
  * count. Values are rendered by Spark's own `cast(string)` (dates,
  * timestamps, decimals arrive in pg-accepted text forms); the server
  * casts to the column types like any COPY text load.
  */
object PgCopyLoader {

  /** Load `df` into `schema.table` (columns by name). Returns the total
    * row count the server confirmed across partitions.
    */
  def load(
      df: DataFrame, schema: String, table: String,
      host: String, port: Int, user: String, database: String,
      password: Option[String] = None,
      sslMode: String = "disable",
      sslRootCert: Option[String] = None,
      sslCert: Option[String] = None,
      sslKey: Option[String] = None,
      sslPassword: Option[String] = None): Long = {
    val cols = df.columns.toSeq
    val text = df.select(cols.map(c => col(c).cast("string").as(c)): _*)
    val sql = s"COPY ${quoteIdent(schema)}.${quoteIdent(table)} " +
      s"(${cols.map(quoteIdent).mkString(", ")}) FROM STDIN"
    val acc = df.sparkSession.sparkContext.longAccumulator("graft.copy.rows")
    val n = cols.size
    // capture only serializable strings/options in the task closure
    val (h, p, u, db, pw, sm, ca, cert, key, kpw) =
      (host, port, user, database, password, sslMode, sslRootCert, sslCert, sslKey, sslPassword)
    text.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = new graft.pgproto.PgConnection(
          h, p, u, db, pw, applicationName = "graft-copy",
          sslMode = sm, sslRootCert = ca, sslCert = cert, sslKey = key,
          sslPassword = kpw)
        try {
          // transaction bracket: a task that dies mid-stream rolls its
          // partial rows back server-side, so Spark's task RETRY starts
          // from zero instead of duplicating the prefix. (Speculative
          // execution must stay off for this stage — two SUCCESSFUL
          // attempts would both commit; retry-after-failure is the case
          // this makes safe.)
          conn.simpleQuery("BEGIN")
          acc.add(conn.copyIn(sql,
            it.map(r => (0 until n).map(i => Option(r.getString(i))))))
          conn.simpleQuery("COMMIT")
          ()
        } finally conn.close()
      }
    }
    acc.value
  }
}
