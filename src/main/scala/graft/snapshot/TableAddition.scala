package graft.snapshot

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftConfig
import graft.services.{Publication, SlotManager}
import graft.snapshot.CatalogReader.SqlExecutor

/** Add a table to a RUNNING pipeline — no stream restart, no resnapshot of
  * the existing tables. The reference cannot do this: its only path is
  * stop → `resnapshot: true` → full re-export of everything
  * (`connector.go:315-343`). Composition of existing pieces makes it safe
  * here:
  *
  *  1. `ALTER PUBLICATION … ADD TABLE` (the minimal arm of
  *     [[Publication.PublicationManager.alignFrom]]) — from this moment the
  *     walsender emits the table's changes into the EXISTING stream;
  *  2. a TEMPORARY replication slot pins a fresh (consistent point,
  *     exported snapshot) pair ([[SlotManager.createTemporary]]) — it
  *     vanishes with the connection, never retaining WAL behind the
  *     durable slot;
  *  3. a chunked read of the table under that exported snapshot
  *     ([[SnapshotReader.viaWire]]) — parallel, pinned, typed;
  *  4. the merge rule: every change event for the table with commit LSN at
  *     or below the consistent point is already INSIDE the snapshot image
  *     (drop it); every later event supersedes by LSN. [[mergeWithStream]]
  *     expresses the rule as envelope algebra, so
  *     [[graft.streaming.StatefulOps.latestState]] (or any LSN-max
  *     consumer) yields exactly-once current state across the seam.
  *
  * Ordering note: step 1 MUST precede step 2 — the publication addition is
  * visible to the walsender before the consistent point is pinned, so no
  * change can fall between "not yet published" and "not yet in the
  * snapshot" (the same create-slot-first argument as the boot handoff,
  * B7).
  */
object TableAddition {

  /** What [[addTable]] assembled: the pinned read and the merge inputs. */
  final case class Added(
      schema: String,
      table: String,
      consistentPoint: Long,
      keyNames: Seq[String],
      snapshot: DataFrame,
      publicationDdl: Seq[String])

  def addTable(
      spark: SparkSession,
      cfg: GraftConfig,
      exec: SqlExecutor,
      replExec: SqlExecutor,
      schema: String,
      table: String,
      /** Temporary slot name — caller-chosen so tests are deterministic;
        * defaults to `<slot>_add_<schema>_<table>`.
        */
      tempSlotName: String = null,
      warn: String => Unit = _ => ()): Added = {
    import Publication.quoteIdent

    // 1. publish the table (idempotent: skip when already present)
    val pubMgr = cfg.publicationManager(exec, warn)
    val live = pubMgr.info().getOrElse(throw new IllegalStateException(
      s"publication '${cfg.publication.name}' does not exist — boot the pipeline first"))
    val ddl =
      if (live.allTables || live.tables.contains((schema, table))) Nil
      else {
        val stmt = s"ALTER PUBLICATION ${quoteIdent(cfg.publication.name)} " +
          s"ADD TABLE ${quoteIdent(schema)}.${quoteIdent(table)}"
        exec(stmt)
        Seq(stmt)
      }

    // 2. pin a fresh consistent point on a temporary slot
    val slotName = Option(tempSlotName).getOrElse(
      s"${cfg.slotName}_add_${schema}_$table".replaceAll("[^A-Za-z0-9_]", "_"))
    val created = new SlotManager(replExec, slotName).createTemporary()

    // 3. chunked typed read under the exported snapshot
    val cat = new CatalogReader(exec)
    val stats = cat.tableStats(schema, table)
    val cols = cat.tableColumns(schema, table)
    val keyNames = cat.primaryKeyColumns(schema, table).map(_._1)
    val frame = SnapshotReader.viaWire(
      spark, cfg.host, cfg.port, cfg.username, cfg.database,
      Option(cfg.password).filter(_.nonEmpty),
      schema, table, cols, stats, cfg.snapshot,
      exportedSnapshotId = created.snapshotName,
      orderByPk = stats.intPkColumn,
      sslMode = cfg.sslMode, sslRootCert = cfg.sslRootCert,
      sslCert = cfg.sslCert, sslKey = cfg.sslKey, sslPassword = cfg.sslPassword)

    Added(schema, table, created.consistentPoint, keyNames, frame, ddl)
  }

  /** The snapshot image as envelope rows: op `insert`, both LSNs at the
    * consistent point (so any later stream event wins an LSN-max merge),
    * `after` as the text-form column map — the exact shape the stream
    * carries, ready to union.
    */
  def asEnvelope(s: SparkSession, added: Added): DataFrame = {
    val cols = added.snapshot.columns.toSeq
    val afterMap = map(cols.flatMap(c =>
      Seq(lit(c), col(c).cast("string"))): _*)
    added.snapshot.select(
      lit(added.consistentPoint).as("lsn"),
      lit(added.consistentPoint).as("commit_lsn"),
      lit(0L).as("xid"),
      lit("insert").as("op"),
      lit(added.schema).as("schema"),
      lit(added.table).as("table"),
      lit(new java.sql.Timestamp(0L)).as("message_time"),
      lit(new java.sql.Timestamp(0L)).as("commit_time"),
      typedLit(added.keyNames).as("key_names"),
      lit(null).cast("map<string,string>").as("before"),
      afterMap.as("after"))
  }

  /** The symmetric removal: unpublish the table so the walsender stops
    * emitting its changes. Returns the DDL issued (empty when it wasn't
    * published). Downstream state (materialized views, sink tables) is the
    * consumer's to retire — nothing here deletes data.
    */
  def removeTable(
      cfg: GraftConfig, exec: SqlExecutor,
      schema: String, table: String, warn: String => Unit = _ => ()): Seq[String] = {
    import Publication.quoteIdent
    val pubMgr = cfg.publicationManager(exec, warn)
    val live = pubMgr.info().getOrElse(return Nil)
    if (live.allTables || !live.tables.contains((schema, table))) Nil
    else {
      val stmt = s"ALTER PUBLICATION ${quoteIdent(cfg.publication.name)} " +
        s"DROP TABLE ${quoteIdent(schema)}.${quoteIdent(table)}"
      exec(stmt)
      Seq(stmt)
    }
  }

  /** Exactly-once merge across the addition seam: the table's stream
    * events at or below the consistent point are dropped (the snapshot
    * already contains their effect); everything else — other tables
    * untouched, later events for this table — passes through, unioned with
    * the snapshot image. Feed the result to any LSN-max consumer.
    */
  def mergeWithStream(s: SparkSession, added: Added, envelope: DataFrame): DataFrame = {
    val duplicate = col("schema") === added.schema &&
      col("table") === added.table &&
      col("commit_lsn") <= added.consistentPoint
    envelope.filter(!duplicate).unionByName(asEnvelope(s, added))
  }
}
