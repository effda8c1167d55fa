package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC → data-lake parquet sink: lands the pgcdc envelope as an
  * append-only parquet CHANGELOG with exactly-once batch commits, folds it
  * into per-key latest state on read, and compacts the log into a BASE
  * table so the fold only ever scans a bounded tail.
  *
  * The reference ships callback and pg-apply sinks (`example/postgresql/
  * main.go:43-51`); a training-data pipeline additionally needs the CDC
  * feed ON THE LAKE, where every downstream batch job (dedup, curation,
  * packing) can read it. This is that sink, built from Spark/Hadoop
  * primitives only — a deliberately small transaction log in the style
  * file formats like Delta/Iceberg standardized:
  *
  *  - `changelog/batch_id=<n>/` — each micro-batch lands in its OWN
  *    partition directory (one atomic unit per foreachBatch call).
  *  - `_graft_commits/<n>` — zero-byte marker, created only AFTER the
  *    batch's parquet is fully written. Readers resolve the log as
  *    "batch dirs ∩ markers", so a half-written batch (crash mid-append)
  *    is invisible until the foreachBatch RETRY overwrites the same dir
  *    and then drops the marker — Structured Streaming re-delivers the
  *    same epoch id, making replay idempotent (exactly-once commits over
  *    an at-least-once channel, same story as the reference's
  *    ack-after-apply listener).
  *  - `_graft_commits/_watermark` — highest batch id folded into BASE by
  *    [[compact]]; committed batches at-or-below it are BASE's content
  *    and may be [[vacuum]]ed.
  *  - `base/` — the folded latest-state table, partitioned by
  *    (schema, table): one image row per live key, stamped with the
  *    (commit_lsn, lsn) it was folded at so later events supersede it in
  *    the same window the tail fold uses.
  *
  * Single-writer per root: batch ids are the streaming query's epoch ids,
  * so one lake root belongs to one writing query (its checkpoint already
  * guarantees a single active instance). Readers and the compact/vacuum
  * maintenance job may run concurrently with the writer — the staged
  * base swap and the commit-log resolution keep every reader on a
  * consistent view.
  *
  * 100-TB shape: append is a straight executor-parallel parquet write (no
  * driver data movement; the only driver I/O is one marker create). The
  * latest-state fold shuffles once on the replica-identity key; with
  * periodic [[compact]] runs the fold input is BASE (pre-folded, one row
  * per key) plus the post-watermark tail — bounded by churn since the last
  * compaction, not by stream lifetime. Readers never list more than the
  * commit-log directory (one small file per batch, vacuumed with its
  * batch).
  */
final class LakeSink(root: String) extends Serializable {

  import LakeSink._

  private def fs(spark: SparkSession): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitDir = new Path(root, "_graft_commits")
  private def changelogDir = new Path(root, "changelog")
  private def baseDir = new Path(root, "base")
  private def watermarkFile = new Path(commitDir, "_watermark")

  /** `writeStream.foreachBatch(sink.appendBatch _)` target: land one
    * micro-batch of the envelope, exactly once. A replayed batch id whose
    * marker exists is a no-op; one whose marker is missing (crash between
    * write and mark) overwrites its own directory and commits.
    */
  def appendBatch(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val f = fs(spark)
    val marker = new Path(commitDir, batchId.toString)
    if (f.exists(marker)) return // committed by a previous attempt
    // A vacuumed batch's marker is gone but its content lives in BASE; a
    // replay from a stale checkpoint must not re-land it as new data.
    if (batchId <= watermark(spark)) return
    batch.write.mode("overwrite")
      .parquet(new Path(changelogDir, s"batch_id=$batchId").toString)
    f.mkdirs(commitDir)
    f.create(marker, true).close()
  }

  /** Batch ids with a commit marker (sorted). */
  def committedBatchIds(spark: SparkSession): Seq[Long] = {
    val f = fs(spark)
    if (!f.exists(commitDir)) Seq.empty
    else f.listStatus(commitDir).toSeq
      .flatMap(st => st.getPath.getName.toLongOption)
      .sorted
  }

  /** Highest batch id folded into BASE (Long.MinValue before the first
    * compaction — NOT -1, which is a legal snapshot batch id).
    */
  def watermark(spark: SparkSession): Long = {
    val f = fs(spark)
    if (!f.exists(watermarkFile)) Long.MinValue
    else {
      val in = f.open(watermarkFile)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** The committed changelog (optionally only batches AFTER `fromBatch`).
    * Uncommitted / half-written batch directories are filtered out by the
    * commit log, not by file inspection.
    */
  def changelog(spark: SparkSession, fromBatch: Long = Long.MinValue): DataFrame = {
    val ids = committedBatchIds(spark).filter(_ > fromBatch)
    if (ids.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.cdc.ChangeEvent.schema.add("batch_id", "long"))
    else
      spark.read
        .option("basePath", changelogDir.toString)
        .parquet(ids.map(i => new Path(changelogDir, s"batch_id=$i").toString): _*)
  }

  /** Latest state per replica-identity key for one table: BASE (if any)
    * unioned with the post-watermark tail, truncate-aware, folded to the
    * winning image per key. Returns the envelope image columns
    * (`key`, `after`, `commit_lsn`, `lsn`) — project through
    * [[graft.types.PgTypes.typedColumns]] for a typed frame.
    *
    * Keyless rows (REPLICA IDENTITY NOTHING relations ship `key_names`
    * null) get a synthetic per-row key from their WAL position, so an
    * append-only table folds to ALL its rows — its actual latest state —
    * instead of every row silently collapsing into one null-key group.
    */
  def latestState(spark: SparkSession, schemaName: String, table: String): DataFrame = {
    val f = fs(spark)
    val tail = changelog(spark, watermark(spark))
      .filter(col("schema") === schemaName && col("table") === table)
      .filter(col("op").isin("insert", "update", "delete", "truncate"))
      .withColumn("img",
        when(col("op") === "delete", col("before")).otherwise(col("after")))
      .select(col("op"), col("commit_lsn"), col("lsn"),
        coalesce(
          array_join(transform(col("key_names"),
            k => coalesce(element_at(col("img"), k), lit(""))), LakeSink.KeySep),
          concat(lit("wal" + LakeSink.KeySep), col("commit_lsn"), lit("/"), col("lsn"))).as("k"),
        col("after"))
    val tablePath = new Path(baseDir, s"schema=$schemaName/table=$table")
    val base =
      if (!f.exists(tablePath)) None
      else Some(spark.read.parquet(tablePath.toString)
        .select(lit("insert").as("op"), col("commit_lsn"), col("lsn"),
          col("k"), col("after")))
    val all = base.map(_.unionByName(tail)).getOrElse(tail)

    // A truncate supersedes everything at-or-before it in commit order
    // (one-row scalar aggregate, same bounded pull as PgApplySink).
    val trunc = all.filter(col("op") === "truncate")
      .agg(max(struct(col("commit_lsn"), col("lsn")))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else
        Some((r.getStruct(0).getLong(0), r.getStruct(0).getLong(1))))
    val live = trunc match {
      case Some((cl, l)) =>
        all.filter(struct(col("commit_lsn"), col("lsn")) >
          struct(lit(cl), lit(l)))
      case None => all
    }
    val w = Window.partitionBy("k")
      .orderBy(col("commit_lsn").desc, col("lsn").desc)
    live.filter(col("op") =!= "truncate")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .select(col("k"), col("after"), col("commit_lsn"), col("lsn"))
  }

  /** Land one table's initial-snapshot frame as envelope rows, so the lake
    * holds snapshot + CDC as ONE log (`GraftConnector.start(snapshotSink =
    * lake.appendSnapshot(_, _, keys, lsn, id))`). Rows become `insert`
    * events stamped at the snapshot's consistent-point LSN — the stream
    * starts at the handoff LSN at-or-after it, so later CDC events win the
    * fold per key. `batchId` must be NEGATIVE (the snapshot id space, below
    * every stream epoch); redelivery inside the snapshot-invalidation
    * retry reuses the id and is idempotent like any other batch.
    *
    * Typed values render to the text forms the CDC envelope carries
    * (booleans as t/f — key equality across snapshot and stream rows is
    * what the fold depends on).
    */
  def appendSnapshot(
      table: String, frame: DataFrame,
      keyNames: Seq[String], lsn: Long, batchId: Long): Unit = {
    require(batchId < 0, s"snapshot batch ids are negative, got $batchId")
    val Array(sch, tbl) = table.split("\\.", 2)
    val textCols = frame.schema.fields.map { f =>
      val c = col(f.name)
      val s = f.dataType match {
        case org.apache.spark.sql.types.BooleanType =>
          when(c, "t").otherwise("f")
        case _ => c.cast("string")
      }
      struct(lit(f.name), s)
    }
    val envelope = frame.select(
      lit(lsn).as("lsn"), lit(lsn).as("commit_lsn"), lit(0L).as("xid"),
      lit("insert").as("op"), lit(sch).as("schema"), lit(tbl).as("table"),
      timestamp_micros(lit(0L)).as("message_time"),
      timestamp_micros(lit(0L)).as("commit_time"),
      typedLit(keyNames).as("key_names"),
      lit(null).cast("map<string,string>").as("before"),
      map_from_entries(array(textCols: _*)).as("after"))
    appendBatch(envelope, batchId)
  }

  /** Drop every snapshot batch (negative ids) and its marker — the
    * snapshot-INVALIDATION path: when the orchestrator's export is
    * invalidated mid-delivery and retried, the NEW export must re-land
    * from scratch, and [[appendSnapshot]]'s idempotence would otherwise
    * skip tables the aborted export already committed (stale image rows
    * under the fresh export's LSN). Call at the start of each export
    * attempt. Refuses after compaction has folded snapshot batches into
    * BASE — at that point the old image is no longer separable and the
    * lake must be re-rooted (matching the orchestrator's clean re-export
    * semantics, which never compacts mid-snapshot).
    */
  def clearSnapshot(spark: SparkSession): Unit = {
    val f = fs(spark)
    val snapIds = committedBatchIds(spark).filter(_ < 0)
    if (watermark(spark) >= snapIds.headOption.getOrElse(Long.MaxValue))
      throw new IllegalStateException(
        "snapshot batches were already compacted into base — cannot clear a " +
          "delivered snapshot; use a fresh lake root for the re-export")
    snapIds.foreach { id =>
      f.delete(new Path(changelogDir, s"batch_id=$id"), true)
      f.delete(new Path(commitDir, id.toString), false)
    }
  }

  /** Retry-aware `snapshotSink` closure for
    * `GraftConnector.start(snapshotSink = lake.connectorSnapshotSink(...))`:
    * lands every table of each export attempt in the negative-id space;
    * seeing `firstTable` again means a FRESH export attempt (the
    * orchestrator's snapshot-invalidation retry restarts delivery from the
    * first configured table), so the previous attempt's batches clear
    * before the new image lands. Snapshot rows are stamped at LSN 0 —
    * strictly below every stream event, which is all the fold's ordering
    * needs (the stream starts at the handoff LSN, always > 0).
    */
  def connectorSnapshotSink(
      spark: SparkSession,
      firstTable: String,
      keyColsOf: String => Seq[String]): (String, DataFrame) => Unit = {
    var snapId = 0L
    (table, frame) => {
      if (table == firstTable) { clearSnapshot(spark); snapId = 0L }
      snapId -= 1
      appendSnapshot(table, frame, keyColsOf(table), 0L, snapId)
    }
  }

  /** Persist relation schemas next to the log (one row per column,
    * latest-wins overwrite — the same replacement semantics as the live
    * registry), so BATCH consumers can type the text-map images without a
    * running stream. Feed it from [[graft.streaming.PgCdcRelations]]'s
    * registry, or any decoded 'R' messages.
    */
  def writeRelations(spark: SparkSession, rels: Seq[graft.pgproto.Messages.Relation]): Unit = {
    import spark.implicits._
    rels.flatMap { r =>
      r.columns.toSeq.zipWithIndex.map { case (c, i) =>
        (r.namespace, r.name, r.oid, r.replicaIdentity.toInt,
          i, c.name, c.typeOid, c.typeModifier, c.flags)
      }
    }.toDF("namespace", "name", "oid", "replica_identity",
        "col_idx", "col_name", "type_oid", "type_modifier", "flags")
      .coalesce(1)
      .write.mode("overwrite").parquet(new Path(root, "_graft_schema").toString)
  }

  /** Read back one table's persisted relation schema, if recorded. */
  def readRelation(
      spark: SparkSession, namespace: String, name: String): Option[graft.pgproto.Messages.Relation] = {
    val f = fs(spark)
    val p = new Path(root, "_graft_schema")
    if (!f.exists(p)) return None
    val rows = spark.read.parquet(p.toString)
      .filter(col("namespace") === namespace && col("name") === name)
      .orderBy("col_idx").collect()
    if (rows.isEmpty) None
    else Some(graft.pgproto.Messages.Relation(
      0L, rows.head.getAs[Long]("oid"), namespace, name,
      rows.head.getAs[Int]("replica_identity").toByte,
      rows.map(r => graft.pgproto.Messages.RelationColumn(
        r.getAs[String]("col_name"), r.getAs[Long]("type_oid"),
        r.getAs[Int]("type_modifier"), r.getAs[Int]("flags"))).toArray))
  }

  /** [[latestState]] projected through the persisted relation schema:
    * typed columns (the same pure-Catalyst casts as the live typed views)
    * plus the (commit_lsn, lsn) version stamp. Throws if [[writeRelations]]
    * never recorded the table.
    */
  def latestStateTyped(spark: SparkSession, schemaName: String, table: String): DataFrame = {
    val rel = readRelation(spark, schemaName, table).getOrElse(
      throw new IllegalStateException(
        s"no persisted relation schema for $schemaName.$table — call writeRelations first"))
    latestState(spark, schemaName, table)
      .select(graft.types.PgTypes.typedColumns(rel, col("after")) :+
        col("commit_lsn") :+ col("lsn"): _*)
  }

  /** Fold every committed batch into BASE and advance the watermark. The
    * new BASE is written to a staging dir and swapped in with two renames,
    * so a concurrent reader sees either the old or the new BASE (plus a
    * tail that covers the difference — the fold is idempotent under that
    * overlap because newer (commit_lsn, lsn) always wins).
    */
  def compact(spark: SparkSession): Unit = {
    val ids = committedBatchIds(spark)
    if (ids.isEmpty) return
    val hi = ids.max
    val tables = changelog(spark)
      .select("schema", "table").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val staging = new Path(root, "_base_staging")
    val f = fs(spark)
    f.delete(staging, true)
    tables.foreach { case (sch, tbl) =>
      latestState(spark, sch, tbl)
        .write.mode("overwrite")
        .parquet(new Path(staging, s"schema=$sch/table=$tbl").toString)
    }
    val old = new Path(root, "_base_old")
    f.delete(old, true)
    if (f.exists(baseDir)) f.rename(baseDir, old)
    f.rename(staging, baseDir)
    f.delete(old, true)
    val out = f.create(watermarkFile, true)
    try out.write(hi.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Incremental changelog consumption with a durable named cursor — the
    * pull-based face of the log for downstream batch jobs (dedup-on-
    * arrival, curation, packing) that want "every committed batch exactly
    * once" without running a continuous stream. `poll` hands the consumer
    * everything committed past its cursor and advances the cursor only
    * AFTER the callback returns — a crash mid-callback re-delivers the
    * same span (at-least-once; pair with an idempotent consumer for
    * exactly-once, the same contract foreachBatch gives the sink side).
    *
    * Vacuum safety: a consumer whose cursor falls below the compaction
    * watermark has MISSED vacuumed batches — that is detected and thrown
    * (the consumer must re-bootstrap from [[latestState]]), never silently
    * skipped. Run [[vacuum]] on the producer side only after every
    * registered consumer's cursor has passed the watermark.
    */
  def cursor(spark: SparkSession, name: String): Long = {
    val f = fs(spark)
    val p = new Path(new Path(root, "_graft_cursors"), name)
    if (!f.exists(p)) Long.MinValue
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** Deliver all committed batches past `name`'s cursor to `fn`, then
    * advance the cursor. Returns the number of NEW batches delivered
    * (0 = up to date, `fn` not invoked).
    */
  def poll(spark: SparkSession, name: String)(fn: DataFrame => Unit): Int = {
    val from = cursor(spark, name)
    val wm = watermark(spark)
    if (from < wm && committedBatchIds(spark).headOption.forall(_ > from))
      throw new IllegalStateException(
        s"lake consumer '$name' cursor $from is below the compaction watermark $wm " +
          "and the batches in between were vacuumed — re-bootstrap from latestState")
    val ids = committedBatchIds(spark).filter(_ > from)
    if (ids.isEmpty) return 0
    fn(changelog(spark, from))
    val f = fs(spark)
    f.mkdirs(new Path(root, "_graft_cursors"))
    val out = f.create(new Path(new Path(root, "_graft_cursors"), name), true)
    try out.write(ids.max.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    ids.size
  }

  /** Scrapeable gauges for [[graft.streaming.GraftMetricsServer]]'s
    * `graft_lake_*` family: wire `lakeGauges = Some(() =>
    * lake.gauges(spark))`. One commit-log listing per scrape — driver-side
    * metadata only.
    */
  def gauges(spark: SparkSession): Seq[(String, Double)] = {
    val ids = committedBatchIds(spark)
    val wm = watermark(spark)
    Seq(
      "batches_total" -> ids.size.toDouble,
      "snapshot_batches" -> ids.count(_ < 0).toDouble,
      "last_batch_id" -> ids.filter(_ >= 0).lastOption.getOrElse(-1L).toDouble,
      "watermark" -> (if (wm == Long.MinValue) -1.0 else wm.toDouble))
  }

  /** Drop changelog batches already folded into BASE (id ≤ watermark),
    * markers included. Safe any time after [[compact]]: readers resolve
    * state as BASE + post-watermark tail and never look below it.
    */
  def vacuum(spark: SparkSession): Unit = {
    val wm = watermark(spark)
    val f = fs(spark)
    committedBatchIds(spark).filter(_ <= wm).foreach { id =>
      f.delete(new Path(changelogDir, s"batch_id=$id"), true)
      f.delete(new Path(commitDir, id.toString), false)
    }
  }
}

object LakeSink {
  /** Key columns are joined with NUL (never appears in pg identifiers or
    * text-format values of key types) into one shuffle-friendly string.
    */
  private[sinks] val KeySep = "\u0000"
}
