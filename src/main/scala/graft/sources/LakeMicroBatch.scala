package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeSeq, BindReferences, Expression, GenericInternalRow, Projection, SafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReportsSourceMetrics, SupportsTriggerAvailableNow}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.LakeSink

/** DataSource V2 micro-batch stream over the lake changelog — the engine
  * face of [[LakeSink]]'s commit log (see [[LakeReadSourceProvider]] for
  * the option surface). Replaces the former DSv1 `Source`: offsets are
  * plain [[LakeOffset]]s end to end (no `SerializedOffset` games), and
  * `planInputPartitions` prunes to exactly the new batch ids' parquet
  * files — one [[InputPartition]] per data file, read executor-side by a
  * self-contained parquet Group reader (no driver data movement, no
  * `private[sql]` streaming-frame constructor).
  *
  * Admission (`latestOffset(start, limit)`) is the same two-sided
  * interval logic the DSv1 source carried: epochs admit oldest-first
  * above the interval, late snapshot batches newest-first below it, so
  * the admitted set stays contiguous under any per-trigger cap; vacuum
  * safety is enforced at admission where "delivered" and "deleted" can
  * be told apart (the engine legitimately replays the last committed
  * span through `planInputPartitions` on restart — missing ids there
  * contribute no rows).
  */
final class LakeMicroBatchStream(
    root: String, tables: Seq[String], maxBatchesPerTrigger: Option[Int],
    typedRel: Option[graft.pgproto.Messages.Relation])
    extends MicroBatchStream with SupportsTriggerAvailableNow
    with ReportsSourceMetrics {

  private val spark = SparkSession.active
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

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def prepareForTriggerAvailableNow(): Unit = {
    val ids = sink.committedBatchIds(spark)
    availableNowTarget = Some(
      if (ids.isEmpty) planned
      else LakeOffset(
        math.min(planned.neg, math.min(ids.min, 0L)),
        math.max(planned.pos, ids.max)))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-lake implements SupportsAdmissionControl")

  /** `start` is the checkpointed offset, so a capped plan can never land
    * behind what a previous instance delivered.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    if (start != null) merge(LakeOffset.fromJson(start.json))
    advance().orNull
  }

  private def advance(): Option[LakeOffset] = synchronized {
    val all = sink.committedBatchIds(spark)
    val committed = availableNowTarget match {
      case Some(t) => all.filter(id => id >= t.neg && id <= t.pos)
      case None => all
    }
    // Vacuum safety, enforced at ADMISSION (not while planning partitions —
    // the engine legitimately replays the last committed span on every
    // restart, and that replay may cross already-vacuumed history). By now
    // `planned` holds the truly-delivered interval (seeded from the
    // checkpoint via latestOffset's start / planInputPartitions / commit),
    // so a vacuum high-water mark beyond it means UNDELIVERED batches were
    // deleted — unrecoverable. A consumer with no history yet (planned
    // empty) is exempt: nothing was promised to it, it may legally start
    // from the surviving tail.
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
      val admitted = maxBatchesPerTrigger.fold(ordered)(ordered.take)
      planned = LakeOffset(
        math.min(planned.neg, admitted.min), math.max(planned.pos, admitted.max))
      Some(planned.copy(vl = ackedVl))
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = if (start == null) LakeOffset.empty else LakeOffset.fromJson(start.json)
    val e = LakeOffset.fromJson(end.json)
    // Restart path: the checkpoint may be ahead of this fresh instance —
    // the engine replays the last committed span through here before the
    // first admission, which also seeds `planned` with the true delivered
    // interval. Missing (vacuumed) ids in a replayed span contribute no
    // files; gap DETECTION lives in the admission path.
    merge(e)
    val ids = sink.committedBatchIds(spark)
      .filter(id => id >= e.neg && id <= e.pos)
      .filter(id => id < s.neg || id > s.pos)
    if (ids.isEmpty) return Array.empty
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    ids.flatMap { id =>
      val dir = new Path(new Path(root, "changelog"), s"batch_id=$id")
      if (!f.exists(dir)) Seq.empty
      else f.listStatus(dir).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => LakeInputPartition(st.getPath.toString, id))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // The typed projection is ANALYZED once on the driver (same column
    // set as LakeReadSource.typedProject, resolved + timezone-bound) and
    // shipped to executors as bound catalyst expressions — the reader
    // evaluates them per row, so the stream's rows leave the executor
    // already typed with zero driver involvement.
    val typedExprs: Option[Seq[Expression]] = typedRel.map { rel =>
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        LakeReadSource.changelogSchema)
      val plan = PlanBridge.analyzed(
        empty.select(LakeReadSource.typedColumnsFor(rel): _*))
      val p = plan.collectFirst { case pr: Project => pr }.getOrElse(
        throw new IllegalStateException("typed projection did not analyze to a Project"))
      val input: AttributeSeq = p.child.output
      // widen to Expression before binding: a bound AttributeReference
      // becomes a BoundReference, which is not a NamedExpression
      p.projectList.map(e =>
        BindReferences.bindReference(e: Expression, input, allowFailures = false))
    }
    // With a typed feed the table filter is implied by the relation.
    val tableFilter = typedRel match {
      case Some(rel) => Seq(s"${rel.namespace}.${rel.name}")
      case None => tables
    }
    new LakeReaderFactory(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration),
      tableFilter, typedExprs)
  }

  override def commit(end: Offset): Unit = merge(LakeOffset.fromJson(end.json))

  private def merge(o: LakeOffset): Unit = synchronized {
    planned = LakeOffset(math.min(planned.neg, o.neg), math.max(planned.pos, o.pos))
    ackedVl = math.min(ackedVl, o.vl)
  }

  override def initialOffset(): Offset = LakeOffset.empty
  override def deserializeOffset(json: String): Offset = LakeOffset.fromJson(json)
  override def stop(): Unit = ()

  /** StreamingQueryProgress `sources[i].metrics` gauges, mirroring the
    * pgcdc source's family: the delivered interval plus the commit-log
    * backlog outside it. One commit-log listing per progress event —
    * driver-side metadata only, same cost class as [[LakeSink.gauges]].
    */
  override def metrics(
      latestConsumedOffset: java.util.Optional[Offset]): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    val p = planned
    m.put("deliveredFloor", p.neg.toString)
    m.put("deliveredCeiling", p.pos.toString)
    m.put("backlogBatches",
      sink.committedBatchIds(spark)
        .count(id => id < p.neg || id > p.pos).toString)
    m
  }
}

/** One changelog parquet data file (its batch id rides along — the lake
  * stores it in the directory name, not the file).
  */
final case class LakeInputPartition(file: String, batchId: Long) extends InputPartition

/** Minimal writable-serialization wrapper for the Hadoop conf the
  * executor-side parquet readers need (Configuration itself is not
  * Java-serializable).
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

final class LakeReaderFactory(
    conf: SerializableHadoopConf,
    tables: Seq[String],
    typedExprs: Option[Seq[Expression]]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LakeInputPartition]
    new LakePartitionReader(p, conf.value, tables.toSet, typedExprs)
  }
}

/** Executor-side reader of one changelog parquet file: decodes the FIXED
  * envelope schema (the lake writes it, so the physical shape is known —
  * int64 scalars, binary strings, int96-or-int64 timestamps, 3-level
  * string list, string→string maps) into [[InternalRow]]s via the public
  * parquet-mr Group API, appends the partition's `batch_id`, applies the
  * table filter row-local, and — for a typed feed — evaluates the bound
  * typed projection.
  */
final class LakePartitionReader(
    p: LakeInputPartition, conf: Configuration,
    tables: Set[String], typedExprs: Option[Seq[Expression]])
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(p.file))
      .withConf(conf).build()
  private val projection: Option[Projection] =
    // SafeProjection (codegen with interpreted fallback): the output rows
    // may carry maps/arrays the engine reads generically
    typedExprs.map(SafeProjection.create)
  private var cur: InternalRow = _

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null) {
      val row = toRow(g)
      val qualified = s"${str(row, 4)}.${str(row, 5)}"
      if (tables.isEmpty || tables.contains(qualified)) {
        cur = projection.fold(row: InternalRow)(_ (row))
        return true
      }
      g = reader.read()
    }
    false
  }

  override def get(): InternalRow = cur
  override def close(): Unit = reader.close()

  private def str(r: InternalRow, i: Int): String = {
    val v = r.getUTF8String(i)
    if (v == null) null else v.toString
  }

  // field order = LakeReadSource.changelogSchema: lsn, commit_lsn, xid,
  // op, schema, table, message_time, commit_time, key_names, before,
  // after, batch_id
  private def toRow(g: Group): GenericInternalRow = {
    val r = new GenericInternalRow(12)
    setLong(g, "lsn", r, 0)
    setLong(g, "commit_lsn", r, 1)
    setLong(g, "xid", r, 2)
    setString(g, "op", r, 3)
    setString(g, "schema", r, 4)
    setString(g, "table", r, 5)
    setTimestamp(g, "message_time", r, 6)
    setTimestamp(g, "commit_time", r, 7)
    r.update(8, readList(g, "key_names"))
    r.update(9, readMap(g, "before"))
    r.update(10, readMap(g, "after"))
    r.setLong(11, p.batchId)
    r
  }

  private def present(g: Group, field: String): Boolean =
    g.getType.containsField(field) && g.getFieldRepetitionCount(field) > 0

  private def setLong(g: Group, field: String, r: GenericInternalRow, i: Int): Unit =
    if (present(g, field)) r.setLong(i, g.getLong(field, 0)) else r.setNullAt(i)

  private def setString(g: Group, field: String, r: GenericInternalRow, i: Int): Unit =
    if (present(g, field))
      r.update(i, UTF8String.fromBytes(g.getBinary(field, 0).getBytes))
    else r.setNullAt(i)

  /** TimestampType micros since epoch, from either encoding Spark writes:
    * INT96 (legacy default: little-endian nanos-of-day + julian day) or
    * INT64 micros.
    */
  private def setTimestamp(g: Group, field: String, r: GenericInternalRow, i: Int): Unit = {
    if (!present(g, field)) { r.setNullAt(i); return }
    val prim = g.getType.getType(field).asPrimitiveType().getPrimitiveTypeName
    val micros = prim match {
      case PrimitiveTypeName.INT96 =>
        val bytes = g.getInt96(field, 0).getBytes // 12 bytes little-endian
        val buf = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanosOfDay = buf.getLong
        val julianDay = buf.getInt
        (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
      case PrimitiveTypeName.INT64 =>
        // honor the logical-type UNIT: Spark legally writes INT64
        // timestamps as millis (outputTimestampType=TIMESTAMP_MILLIS)
        // or micros — treating raw millis as micros would shift every
        // event 1000x toward 1970
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val v = g.getLong(field, 0)
        g.getType.getType(field).getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => v * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => v
              case LogicalTypeAnnotation.TimeUnit.NANOS => v / 1000L
            }
          case _ => v // no annotation: Spark's default is micros
        }
      case other => throw new IllegalStateException(
        s"unexpected parquet type $other for timestamp column $field in ${p.file}")
    }
    r.setLong(i, micros)
  }

  /** Standard 3-level list encoding: group { repeated group list
    * { optional binary element } }.
    */
  private def readList(g: Group, field: String): GenericArrayData = {
    if (!present(g, field)) return null
    val lg = g.getGroup(field, 0)
    val n = lg.getFieldRepetitionCount(0)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val el = lg.getGroup(0, i)
      out(i) =
        if (el.getFieldRepetitionCount(0) == 0) null
        else UTF8String.fromBytes(el.getBinary(0, 0).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Standard map encoding: group (MAP) { repeated group key_value
    * { required binary key; optional binary value } }.
    */
  private def readMap(g: Group, field: String): ArrayBasedMapData = {
    if (!present(g, field)) return null
    val mg = g.getGroup(field, 0)
    val n = mg.getFieldRepetitionCount(0)
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      val kv = mg.getGroup(0, i)
      keys(i) = UTF8String.fromBytes(kv.getBinary(0, 0).getBytes)
      vals(i) =
        if (kv.getFieldRepetitionCount(1) == 0) null
        else UTF8String.fromBytes(kv.getBinary(1, 0).getBytes)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
