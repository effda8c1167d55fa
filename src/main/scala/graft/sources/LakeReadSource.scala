package graft.sources

import scala.util.matching.Regex

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink => SinkV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider, TableScan}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StructType}

import graft.sinks.LakeSink

/** `format("graft-lake")` — the Spark-native READ face of [[LakeSink]]'s
  * lake root, so downstream jobs consume the landed CDC log through
  * `spark.read` / `spark.readStream` instead of calling sink methods.
  * The reference's consumption surface is a push callback
  * (`pq/replication/stream.go:33-38`); on the lake the same feed becomes
  * a first-class Spark source with Spark-managed progress:
  *
  * Batch (`spark.read.format("graft-lake").option("path", root)`):
  *  - `.option("table", "public.users")` — latest folded state per
  *    replica-identity key ([[LakeSink.latestState]]); add
  *    `.option("typed", "true")` for the relation-schema projection
  *    ([[LakeSink.latestStateTyped]]), `.option("asOfBatch", n)` for
  *    time travel ([[LakeSink.stateAsOf]]).
  *  - no `table` — the committed changelog (all tables, envelope rows +
  *    `batch_id`); `.option("fromBatch", n)` reads only batches after n.
  *
  * Streaming (`spark.readStream.format("graft-lake").option("path", root)`):
  * tails the committed changelog exactly once, offsets checkpointed by
  * Structured Streaming itself (no named cursors — [[LakeSink.poll]] is
  * the pull-based alternative). Options: `tables` (comma-separated
  * `schema.table` filter, pushed to the parquet scan),
  * `maxBatchesPerTrigger` (admission cap per micro-batch), and
  * `table` + `typed=true` for a TYPED change feed of one table — the
  * same projection as the live registry's typed views, schema resolved
  * from the persisted relation ([[LakeSink.writeRelations]]) at query
  * (re)start.
  *
  * Offsets are the two ends of the CONTIGUOUS id interval delivered so
  * far: stream epochs count up from 0 while snapshot batches count down
  * from -1 ([[LakeSink.appendSnapshot]]), so `[neg, pos]` covers both
  * growth directions and a mid-stream table addition's late snapshot
  * batch still gets delivered. Vacuum safety matches [[LakeSink.poll]]:
  * a restart whose next undelivered batch was vacuumed throws rather
  * than silently skipping (re-bootstrap from `latestState`).
  *
  * 100-TB shape: planning I/O is one commit-log listing per trigger
  * (one small file per batch); data moves only executor-side, straight
  * from the batch parquet dirs, partition-pruned to exactly the new ids.
  */
final class LakeReadSourceProvider
    extends RelationProvider with StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def opt(parameters: Map[String, String], key: String): Option[String] = {
    val lower = key.toLowerCase(java.util.Locale.ROOT)
    parameters.collectFirst {
      case (k, v) if k.toLowerCase(java.util.Locale.ROOT) == lower => v
    }
  }

  private def rootOf(parameters: Map[String, String]): String =
    opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "graft-lake requires .option(\"path\", <lake root>)"))

  /** A typo'd option silently falling back to a default is worse than an
    * error — reject anything outside the path's known set (plus the
    * engine-routed write options that ride along in `parameters`).
    */
  private val StreamOptions = Set("tables", "table", "typed", "maxbatchespertrigger")
  private val BatchOptions = Set("table", "typed", "asofbatch", "frombatch")
  private val SinkOptions = Set("basebuckets")

  private def checkOptions(
      parameters: Map[String, String], allowed: Set[String], path: String): Unit = {
    val engine = Set("checkpointlocation", "queryname", "path")
    val unknown = parameters.keySet
      .map(_.toLowerCase(java.util.Locale.ROOT)) -- allowed -- engine
    require(unknown.isEmpty,
      s"unknown graft-lake $path option(s): ${unknown.mkString(", ")} — " +
        s"supported: ${allowed.toSeq.sorted.mkString(", ")}")
  }

  // ---- batch ---------------------------------------------------------------

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    checkOptions(parameters, BatchOptions, "batch read")
    val spark = sqlContext.sparkSession
    val sink = new LakeSink(rootOf(parameters))
    def frame(): DataFrame = opt(parameters, "table") match {
      case Some(qualified) =>
        val Array(sch, tbl) = qualified.split("\\.", 2)
        val asOf = opt(parameters, "asofbatch").map(_.toLong)
        val typed = opt(parameters, "typed").exists(_.toBoolean)
        (asOf, typed) match {
          case (Some(b), false) => sink.stateAsOf(spark, sch, tbl, b)
          case (None, true) => sink.latestStateTyped(spark, sch, tbl)
          case (None, false) => sink.latestState(spark, sch, tbl)
          case (Some(_), true) => throw new IllegalArgumentException(
            "asOfBatch and typed cannot be combined (relation schemas are " +
              "recorded latest-only, so a typed historical view could lie)")
        }
      case None =>
        val from = opt(parameters, "frombatch").map(_.toLong).getOrElse(Long.MinValue)
        sink.changelog(spark, from)
    }
    val planned = frame()
    val outer = sqlContext
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = outer
      override val schema: StructType = planned.schema
      // InternalRow pass-through: with needConversion=false Spark consumes
      // the physical rows directly — `.rdd` would deserialize every row to
      // an external Row only for Spark to convert it straight back.
      override def needConversion: Boolean = false
      // Re-plan per scan so repeated queries over one relation object see
      // the current manifest/commit log, like re-reading a file path does.
      override def buildScan(): RDD[Row] =
        StreamBridge.toRdd(frame()).asInstanceOf[RDD[Row]]
    }
  }

  // ---- streaming -----------------------------------------------------------

  /** Typed streaming (`table` + `typed=true`): the persisted relation
    * schema, resolved latest-wins at query (re)start.
    */
  private def typedRelOf(
      spark: SparkSession, parameters: Map[String, String]): Option[graft.pgproto.Messages.Relation] =
    if (!opt(parameters, "typed").exists(_.toBoolean)) None
    else {
      val qualified = opt(parameters, "table").getOrElse(
        throw new IllegalArgumentException(
          "typed streaming requires .option(\"table\", \"schema.table\")"))
      val Array(sch, tbl) = qualified.split("\\.", 2)
      Some(new LakeSink(rootOf(parameters)).readRelation(spark, sch, tbl).getOrElse(
        throw new IllegalStateException(
          s"no persisted relation schema for $qualified — call writeRelations first")))
    }

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-lake defines its own schema (the CDC envelope)")
    // fail fast at load() on a missing path or a typo'd option —
    // createSource only runs at query start
    checkOptions(parameters, StreamOptions, "stream")
    rootOf(parameters)
    val out = typedRelOf(sqlContext.sparkSession, parameters) match {
      case Some(rel) => LakeReadSource.typedSchema(sqlContext.sparkSession, rel)
      case None => LakeReadSource.changelogSchema
    }
    (shortName(), out)
  }

  // ---- streaming sink --------------------------------------------------

  /** `envelope.writeStream.format("graft-lake")` — the sink face of the
    * same root: each micro-batch lands through [[LakeSink.appendBatch]]'s
    * marker protocol (epoch ids = batch ids, replay idempotent), replacing
    * the `foreachBatch(lake.appendBatch _)` wiring with a plain format
    * string. Append-only: the changelog is an event log, update/complete
    * modes have no meaning over it.
    */
  override def createSink(
      sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): SinkV1 = {
    require(outputMode == OutputMode.Append(),
      s"graft-lake sink is append-only (the changelog is an event log), got $outputMode")
    require(partitionColumns.isEmpty,
      "graft-lake lays out the changelog itself; partitionBy is not supported")
    checkOptions(parameters, SinkOptions, "sink")
    val root = rootOf(parameters)
    val sink = new LakeSink(root,
      opt(parameters, "basebuckets").map(_.toInt).getOrElse(16))
    new SinkV1 {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        // validate names AND types (case-insensitively, like resolution):
        // one mistyped landed batch would poison every subsequent
        // fixed-schema read of the whole lake
        val have = data.schema.fields
          .map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType).toMap
        val problems = LakeReadSource.changelogSchema.fields
          .filterNot(_.name == "batch_id").flatMap { f =>
            have.get(f.name) match {
              case None => Some(s"missing column ${f.name}")
              // catalogString ignores nullability flags, which legitimately
              // vary with how the frame was constructed
              case Some(dt) if dt.catalogString != f.dataType.catalogString =>
                Some(s"${f.name} is ${dt.simpleString}, expected ${f.dataType.simpleString}")
              case _ => None
            }
          }
        require(problems.isEmpty,
          s"graft-lake sink expects the CDC envelope; ${problems.mkString("; ")}")
        // the engine hands a streaming-flagged frame; re-wrap its rows as
        // a batch frame so appendBatch's ordinary write is permitted
        val batch = StreamBridge.batchDataFrame(
          data.sparkSession, StreamBridge.toRdd(data), data.schema)
        sink.appendBatch(batch, batchId)
      }
      override def name(): String = s"graft-lake[$root]"
      override def toString: String = name()
    }
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    checkOptions(parameters, StreamOptions, "stream")
    val tables = (opt(parameters, "tables").toSeq ++ opt(parameters, "table").toSeq)
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val maxBatches = opt(parameters, "maxbatchespertrigger").map(_.toInt)
    new LakeReadSource(
      sqlContext.sparkSession, rootOf(parameters), tables, maxBatches,
      typedRelOf(sqlContext.sparkSession, parameters))
  }
}

/** Contiguous delivered-id interval `[neg, pos]` over the lake's two-sided
  * batch-id space (snapshots ≤ -1, stream epochs ≥ 0). `LakeOffset(0, -1)`
  * is the empty interval. `vl` rides along as the vacuum low-water mark
  * this consumer has ACKNOWLEDGED as innocent (deleted-but-delivered or
  * pre-birth) — checkpointing it is what lets a restart tell a gap that
  * opened while the query was down from history vacuumed before it ever
  * existed. Long.MaxValue = nothing acknowledged yet.
  */
final case class LakeOffset(neg: Long, pos: Long, vl: Long = Long.MaxValue)
    extends OffsetV1 {
  override def json: String =
    if (vl == Long.MaxValue) s"""{"neg":$neg,"pos":$pos}"""
    else s"""{"neg":$neg,"pos":$pos,"vl":$vl}"""
}

object LakeOffset {
  val empty: LakeOffset = LakeOffset(0L, -1L)
  private val Pattern: Regex =
    """\{"neg":(-?\d+),"pos":(-?\d+)(?:,"vl":(-?\d+))?\}""".r

  def fromJson(s: String): LakeOffset = s match {
    case Pattern(n, p, v) =>
      LakeOffset(n.toLong, p.toLong,
        Option(v).map(_.toLong).getOrElse(Long.MaxValue))
    case other => throw new IllegalArgumentException(s"not a LakeOffset: $other")
  }

  /** v1 sources receive checkpoint-restored offsets as [[SerializedOffset]]. */
  def of(o: OffsetV1): LakeOffset = o match {
    case l: LakeOffset => l
    case SerializedOffset(json) => fromJson(json)
    case other => fromJson(other.json)
  }
}

final class LakeReadSource(
    spark: SparkSession, root: String,
    tables: Seq[String], maxBatchesPerTrigger: Option[Int],
    typedRel: Option[graft.pgproto.Messages.Relation] = None)
    extends Source with SupportsTriggerAvailableNow {

  private val sink = new LakeSink(root)
  // Ids already admitted but possibly not yet committed downstream —
  // admission must be monotone across triggers.
  @volatile private var planned: LakeOffset = LakeOffset.empty
  // Vacuum low-water mark acknowledged as innocent (see LakeOffset.vl);
  // MaxValue until first contact (fresh query or a pre-vl checkpoint,
  // both amnestied at the next admission).
  @volatile private var ackedVl: Long = Long.MaxValue
  // Trigger.AvailableNow ceiling: ids committed after prepare() wait for
  // the next run.
  @volatile private var availableNowTarget: Option[LakeOffset] = None

  // cached: deriving the typed schema analyzes the full projection plan,
  // and schema is consulted on the per-trigger hot path
  private lazy val schema0: StructType = typedRel match {
    case Some(rel) => LakeReadSource.typedSchema(spark, rel)
    case None => LakeReadSource.changelogSchema
  }
  override def schema: StructType = schema0

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def prepareForTriggerAvailableNow(): Unit = {
    val ids = sink.committedBatchIds(spark)
    availableNowTarget = Some(
      if (ids.isEmpty) planned
      else LakeOffset(
        math.min(planned.neg, math.min(ids.min, 0L)),
        math.max(planned.pos, ids.max)))
  }

  /** Admission-control path (the engine prefers it over [[getOffset]]):
    * `start` is the checkpointed offset, so a capped plan can never land
    * behind what a previous instance delivered.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    if (start != null) merge(LakeOffset.fromJson(start.json))
    advance(capped = true).orNull
  }

  /** DSv1 fallback path. No `start` is provided here, so a COLD instance
    * admits everything uncapped: a capped first offset could land BEHIND a
    * checkpoint this instance doesn't know about, and committing a
    * regressive offset would re-deliver the difference next trigger.
    */
  override def getOffset: Option[OffsetV1] =
    advance(capped = planned != LakeOffset.empty)

  private def advance(capped: Boolean): Option[LakeOffset] = synchronized {
    val all = sink.committedBatchIds(spark)
    val committed = availableNowTarget match {
      case Some(t) => all.filter(id => id >= t.neg && id <= t.pos)
      case None => all
    }
    // Vacuum safety, enforced at ADMISSION (not in getBatch — the engine
    // legitimately replays the last committed span through getBatch on
    // every restart, and that replay may cross already-vacuumed history).
    // By now `planned` holds the truly-delivered interval (seeded from the
    // checkpoint via that replay / commit()), so a vacuum high-water mark
    // beyond it means UNDELIVERED batches were deleted — unrecoverable.
    // A consumer with no history yet (planned empty) is exempt: nothing
    // was promised to it, it may legally start from the surviving tail.
    val vh = sink.vacuumHighWater(spark)
    if (planned != LakeOffset.empty && vh > planned.pos)
      throw new IllegalStateException(
        s"graft-lake stream is at ${planned.json} but vacuum has deleted " +
          s"batches through $vh — the gap is unrecoverable; re-bootstrap " +
          "the consumer from latestState and a fresh checkpoint")
    // Negative side: vacuum reaching BELOW both the delivered floor and
    // the acknowledged mark means a late snapshot batch was deleted
    // before this consumer ever saw it. History vacuumed before first
    // contact is amnestied (nothing was promised yet).
    val curVl = sink.vacuumLowWater(spark)
    // Amnesty is keyed on EMPTY delivery history, not on ackedVl being
    // unset: a running consumer that saw no vacuum at first contact
    // (ackedVl still MaxValue) must still treat the first vacuum that
    // reaches below its floor as a gap, not as pre-birth history.
    if (planned == LakeOffset.empty) ackedVl = curVl
    else if (curVl < ackedVl) {
      if (curVl < planned.neg)
        throw new IllegalStateException(
          s"graft-lake stream floor is ${planned.neg} but vacuum has " +
            s"deleted snapshot batches down to $curVl — an undelivered " +
            "snapshot batch is gone; re-bootstrap the consumer from " +
            "latestState and a fresh checkpoint")
      ackedVl = curVl
    }
    if (committed.isEmpty && planned == LakeOffset.empty) return None
    val fresh = committed.filter(id => id < planned.neg || id > planned.pos)
    if (fresh.isEmpty) {
      if (planned == LakeOffset.empty) None
      else Some(planned.copy(vl = ackedVl))
    } else {
      // Downward growth admits newest-first, upward oldest-first, so the
      // admitted set stays a contiguous interval under any per-trigger cap.
      val ordered = fresh.filter(_ < planned.neg).sorted.reverse ++
        fresh.filter(_ > planned.pos).sorted
      val admitted =
        if (capped) maxBatchesPerTrigger.fold(ordered)(ordered.take) else ordered
      planned = LakeOffset(
        math.min(planned.neg, admitted.min), math.max(planned.pos, admitted.max))
      Some(planned.copy(vl = ackedVl))
    }
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val s = start.map(LakeOffset.of).getOrElse(LakeOffset.empty)
    val e = LakeOffset.of(end)
    // Restart path: the checkpoint may be ahead of this fresh instance —
    // the engine replays the last committed span through here before the
    // first admission, which also seeds `planned` with the true delivered
    // interval. Missing (vacuumed) ids in a replayed span contribute no
    // rows; gap DETECTION lives in the admission path, where delivered
    // and deleted can be told apart.
    merge(e)
    val ids = sink.committedBatchIds(spark)
      .filter(id => id >= e.neg && id <= e.pos)
      .filter(id => id < s.neg || id > s.pos)
    val batch =
      if (ids.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], LakeReadSource.changelogSchema)
      else {
        val dirs = ids.map(i =>
          new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(root, "changelog"), s"batch_id=$i").toString)
        spark.read
          .option("basePath", new org.apache.hadoop.fs.Path(root, "changelog").toString)
          .schema(LakeReadSource.changelogSchema)
          .parquet(dirs: _*)
      }
    val filtered =
      if (tables.isEmpty) batch
      else batch.filter(
        org.apache.spark.sql.functions.concat_ws(".", col("schema"), col("table"))
          .isin(tables: _*))
    val aligned = typedRel match {
      case Some(rel) => LakeReadSource.typedProject(filtered, rel)
      case None =>
        filtered.select(LakeReadSource.changelogSchema.fieldNames.map(col).toSeq: _*)
    }
    StreamBridge.streamingDataFrame(spark, StreamBridge.toRdd(aligned), schema)
  }

  // commit() seeds `planned` on restart (the engine replays the last
  // committed offset into the source), so the admission cap never plans
  // behind the checkpoint.
  override def commit(offset: OffsetV1): Unit = merge(LakeOffset.of(offset))
  override def commit(offset: OffsetV2): Unit = merge(LakeOffset.fromJson(offset.json))

  private def merge(o: LakeOffset): Unit = synchronized {
    planned = LakeOffset(math.min(planned.neg, o.neg), math.max(planned.pos, o.pos))
    ackedVl = math.min(ackedVl, o.vl)
  }
  override def initialOffset(): OffsetV2 = LakeOffset.empty
  override def deserializeOffset(json: String): OffsetV2 = LakeOffset.fromJson(json)
  override def stop(): Unit = ()
}

object LakeReadSource {
  /** Envelope + the lake's `batch_id` partition column, all-nullable (the
    * parquet round trip erases the envelope's tighter nullability).
    */
  val changelogSchema: StructType = StructType(
    graft.cdc.ChangeEvent.schema.fields.map(_.copy(nullable = true)) :+
      org.apache.spark.sql.types.StructField("batch_id", LongType, nullable = true))

  /** Typed change feed: the same projection as the live registry's typed
    * views ([[graft.cdc.ChangeEvent.typedView]] — delete rows carry their
    * `before` image, everything else `after`), plus `batch_id`.
    */
  def typedProject(envelope: DataFrame, rel: graft.pgproto.Messages.Relation): DataFrame = {
    val image = org.apache.spark.sql.functions
      .when(col("op") === "delete", col("before")).otherwise(col("after"))
    envelope
      .filter(col("schema") === rel.namespace && col("table") === rel.name)
      .select(Seq(col("lsn"), col("commit_lsn"), col("xid"), col("op"),
        col("commit_time")) ++
        graft.types.PgTypes.typedColumns(rel, image) :+ col("batch_id"): _*)
  }

  /** The typed feed's schema, derived from the projection itself so it can
    * never drift from what [[typedProject]] produces.
    */
  def typedSchema(spark: SparkSession, rel: graft.pgproto.Messages.Relation): StructType =
    typedProject(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], changelogSchema), rel).schema
}
