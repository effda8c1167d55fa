package graft.services

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.snapshot.CatalogReader.SqlExecutor

/** Publication configuration + DDL (P1/P2/P3/P7 control plane — reference
  * `pq/publication/config.go:40-61`, `operation.go`): which tables and DML
  * kinds the server publishes, optional column lists, and
  * `publish_via_partition_root` so partitioned tables' events arrive under
  * the ROOT table name (P7).
  */
object Publication {

  val ValidOperations = Seq("insert", "update", "delete", "truncate")

  final case class PubTable(
      schema: String,
      name: String,
      columns: Seq[String] = Nil,
      partitioned: Boolean = false)

  final case class Config(
      name: String,
      tables: Seq[PubTable],
      operations: Seq[String] = ValidOperations,
      createIfNotExists: Boolean = true) {
    require(name.nonEmpty, "publication name required")
    require(tables.nonEmpty, "publication needs at least one table")
    private val bad = operations.filterNot(ValidOperations.contains)
    require(bad.isEmpty, s"invalid publication operations: ${bad.mkString(",")} " +
      s"(valid: ${ValidOperations.mkString(",")})")
    require(operations.nonEmpty, "publication needs at least one operation")

    /** `CREATE PUBLICATION … FOR TABLE … WITH (publish, publish_via_partition_root)`
      * (`config.go:40-61`): the partition-root flag is set when ANY published
      * table is partitioned — the server then emits partition rows under the
      * root relation.
      */
    def createQuery: String = {
      val quoted = tables.map { t =>
        val base = s"${quoteIdent(t.schema)}.${quoteIdent(t.name)}"
        if (t.columns.nonEmpty)
          s"$base(${t.columns.map(quoteIdent).mkString(", ")})"
        else base
      }
      s"CREATE PUBLICATION ${quoteIdent(name)} FOR TABLE ${quoted.mkString(", ")}" +
        s" WITH (publish = '${operations.mkString(", ")}', " +
        s"publish_via_partition_root = ${tables.exists(_.partitioned)})"
    }

    def dropQuery: String = s"DROP PUBLICATION IF EXISTS ${quoteIdent(name)}"
  }

  def quoteIdent(s: String): String = graft.snapshot.CatalogReader.quoteIdent(s)

  /** Client-side table renaming — the consumer half of P7/S6: rewrite a
    * change-event frame's (schema, table) through a physical→logical mapping
    * (partition → root, or TimescaleDB chunk → hypertable). A literal-map
    * lookup with fallthrough, fully codegen'd; the mapping is small (one
    * entry per physical partition/chunk), so it rides in the plan.
    */
  def renameTables(df: DataFrame, mapping: Map[(String, String), (String, String)]): DataFrame = {
    if (mapping.isEmpty) return df
    // Both rewrites key on the ORIGINAL (schema, table) pair, so they must be
    // computed in one projection (sequential withColumn would key the table
    // lookup on the already-rewritten schema).
    val key = concat(col("schema"), lit("."), col("table"))
    def lookup(pick: ((String, String)) => String): Column =
      map(mapping.toSeq.flatMap { case (k, v) =>
        Seq(lit(k._1 + "." + k._2), lit(pick(v)))
      }: _*)(key)
    df.select(df.columns.map {
      case "schema" => coalesce(lookup(_._1), col("schema")).as("schema")
      case "table" => coalesce(lookup(_._2), col("table")).as("table")
      case c => col(c)
    }.toSeq: _*)
  }
}

/** S6 TimescaleDB hypertable map (`pq/timescaledb/hypertable.go:26-123`):
  * polls `timescaledb_information.chunks` to maintain the physical-chunk →
  * hypertable mapping, feeding [[Publication.renameTables]] so downstream
  * consumers see hypertable names instead of `_hyper_N_M_chunk`.
  */
final class HypertableMapper(exec: SqlExecutor) {
  import HypertableMapper._

  @volatile private var cache = Map.empty[(String, String), (String, String)]
  @volatile private var stopped = false

  def mapping: Map[(String, String), (String, String)] = cache

  /** One poll (`FindHyperTables`): merge results into the cache. A missing
    * `timescaledb_information` relation (SQLSTATE 42P01 — not a TimescaleDB)
    * permanently stops the sync loop, mirroring the ticker stop at
    * `hypertable.go:52-58`. Detection covers the JDBC path (SQLState on the
    * SQLException, NOT in its message) as well as message-carried forms.
    */
  def poll(): Map[(String, String), (String, String)] = {
    if (stopped) return cache
    def undefinedTable(e: Throwable): Boolean = e match {
      case sql: java.sql.SQLException if sql.getSQLState == "42P01" => true
      case _ =>
        val m = Option(e.getMessage).getOrElse("")
        m.contains("42P01") || m.matches("(?s).*relation .* does not exist.*")
    }
    val rows =
      try exec(FindHyperTablesSql)
      catch {
        case e: Exception if undefinedTable(e) =>
          stopped = true
          return cache
      }
    val found = rows.collect {
      case Seq(hSchema, hName, cSchema, cName) => (cSchema, cName) -> (hSchema, hName)
    }.toMap
    cache = cache ++ found
    cache
  }

  def isStopped: Boolean = stopped

  /** SyncHyperTables loop for `ticks` iterations with injectable sleep. */
  def sync(ticks: Int, sleep: () => Unit = () => Thread.sleep(1000)): Unit = {
    var i = 0
    while (i < ticks && !stopped) {
      try poll() catch { case _: Exception => () } // errors: log-and-continue
      i += 1
      if (i < ticks && !stopped) sleep()
    }
  }
}

object HypertableMapper {
  val FindHyperTablesSql: String =
    "SELECT h.hypertable_schema, h.hypertable_name, c.chunk_schema, c.chunk_name " +
      "FROM timescaledb_information.chunks c " +
      "JOIN timescaledb_information.hypertables h " +
      "ON c.hypertable_schema = h.hypertable_schema AND c.hypertable_name = h.hypertable_name"
}
