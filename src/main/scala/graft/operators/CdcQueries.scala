package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.TransactionAssembler
import graft.pgproto.{Messages, MessageEncoder}
import graft.streaming.ResumeFilter

/** CDC operator semantics expressed as verifiable queries over the `events`
  * table (events-as-change-feed: `user_id` plays the PK, `ts` the commit
  * time, `event_id` the LSN). Each maps to a SURVEY §2 operator and has a
  * DuckDB-equivalent oracle in [[graft.SparkEntry.oracleSql]].
  */
object CdcQueries {

  /** P1 operation filter (`publication/operation.go:10-17`): keep only
    * chosen DML kinds.
    */
  def opFilter(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

  /** P2 table filter (`publication/config.go:40-61`): restrict to a table
    * allow-list (here: document sources).
    */
  def tableFilter(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("source").isin("src1", "src2", "src3"))
      .groupBy("source").agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"))

  /** P3 column projection (`publication/config.go:52-56`): column pruning
    * reaches the scan (ReadSchema shows only the selected columns).
    */
  def columnProjection(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select("doc_id", "lang", "source")

  /** P5 heartbeat suppression (`stream.go:543-561`): drop a designated event
    * kind while the rest flow.
    */
  def heartbeatSuppression(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") =!= "error")
      .groupBy("event_type").agg(count(lit(1)).as("n"))

  /** P6 TOAST restoration as a dataflow: a column is "unchanged" (null) on
    * some rows and must be back-filled from the previous image of the same
    * key (`format/update.go:100-108`). last(ignoreNulls) over the key's
    * history == coalesce-with-old-image.
    */
  def toastCoalesce(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("v", when(col("value") < 5.0, lit(null)).otherwise(col("value")))
      .withColumn("restored", last("v", ignoreNulls = true).over(w))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        count("v").as("n_present"),
        count("restored").as("n_restored"),
        round(sum("restored"), 2).as("sum_restored"))
  }

  /** T1/latest-state materialization: current row per key = event with max
    * (ts, event_id) — the downstream "apply changes" view (SURVEY §1.4).
    */
  def latestState(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_event_type"),
        col("event_id").as("last_event_id"), round(col("value"), 2).as("last_value"))
  }

  /** T2 sessionization: group a key's events into transaction-like sessions
    * split on >30min gaps (stateful-operator analogue of the streamed-txn
    * buffer). Returns the session-size distribution.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          .or(col("ts").cast("long") - col("prev_ts").cast("long") > 1800L), 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id").agg(count(lit(1)).as("session_len"))
      .groupBy("session_len").agg(count(lit(1)).as("n_sessions"))
  }

  /** T3 monotonic-progress guard: per key, count events arriving with an id
    * below the running max (out-of-order analogue of `stream.go:605-633`).
    */
  def monotonicGuard(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("prior_max", max("event_id").over(w))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("event_id") < col("prior_max"), 1L).otherwise(0L)).as("regressions"))
  }

  /** Event-time tumbling windows (SURVEY §2.6 last row, batch form — the
    * streaming form with `withWatermark` is exercised by
    * `StreamingWindowSpec`): hourly windows per event type via `window()`,
    * the windowed-aggregation primitive watermarked streams use. One scan +
    * one partial-aggregated shuffle.
    */
  def eventTimeWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").cast("long").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** SCD type-2 history materialization — the other standard downstream of
    * a change feed besides [[latestState]]: every change event opens a
    * version row valid from its own time until the key's NEXT change
    * (`lead` over the key's history), the key's last event staying open.
    * Output is the per-event-type audit of the version table: version
    * counts, open (current) versions, and the total + mean closed-version
    * lifetime.
    *
    * 100-TB shape: one window function partitioned by key (the same
    * shuffle-by-key any per-key history pass costs) + one
    * partial-aggregated groupBy; no self-join — `lead` replaces the
    * naive "join each version to its successor".
    */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("valid_to", lead("ts", 1).over(byKey))
      .withColumn("life_s",
        col("valid_to").cast("long") - col("ts").cast("long"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_versions"),
        sum(when(col("valid_to").isNull, 1L).otherwise(0L)).as("n_current"),
        sum("life_s").as("sum_life_s"),
        round(avg("life_s"), 2).as("avg_life_s"))
  }

  /** T2 streamed (in-progress) transactions, proto v2, proven end-to-end
    * with an oracle: each partition re-encodes its events as STREAMED
    * transactions (STREAM START/segment/STOP chunks, one txn per 500 rows,
    * with the v2 per-message XID prefix), ABORTS every 3rd transaction, and
    * commits the rest via STREAM COMMIT. The assembler must buffer segments
    * per XID, discard aborted buffers wholesale, and emit committed ones in
    * commit order — consumers never observe a rolled-back streamed txn.
    * Events route to transactions BY CONTENT (`event_id % 6` picks one of 6
    * interleaved XIDs) and abort is decided by XID, so the surviving row set
    * is partition-invariant and the DuckDB oracle is a plain filter.
    *
    * Scale shape: same as cdcRoundtrip — per-partition CPU, one final agg.
    */
  def streamedTxnRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    // measured A/B (r21): ~0.5 s of serial codec CPU here — the fan-out
    // exchange cost more than it saved; see typedViewOrders for the
    // >1 s-serial-CPU cases where it pays
    val events = Tables.events(s, dir).select("event_id", "user_id", "value")
    val decoded = events.mapPartitions { it =>
      val assembler = new TransactionAssembler()
      val rel = MessageEncoder.xlogData(1, 1, 0L,
        MessageEncoder.relation(RelOid, "public", "events", RelCols))
      assembler.onCopyData(rel)
      var lsn = 10L
      // 6 interleaved streamed txns per partition window; xids 900..905.
      it.grouped(3000).flatMap { window =>
        val frames = Seq.newBuilder[Array[Byte]]
        val byTxn = window.groupBy(r => 900L + (r.getLong(0) % 6))
        // segments interleave: one STREAM START/STOP chunk per txn per window
        byTxn.toSeq.sortBy(_._1).foreach { case (xid, rows) =>
          frames += MessageEncoder.xlogData(lsn, lsn, 0L,
            MessageEncoder.streamStart(xid, firstSegment = true))
          lsn += 1
          rows.foreach { r =>
            frames += MessageEncoder.xlogData(lsn, lsn, 0L,
              MessageEncoder.insert(RelOid,
                Seq(Some(r.getLong(0).toString), Some(r.getLong(1).toString),
                  Some("s"), Some(r.getDouble(2).toString)),
                streamedXid = xid))
            lsn += 1
          }
          frames += MessageEncoder.xlogData(lsn, lsn, 0L, MessageEncoder.streamStop())
          lsn += 1
        }
        // abort xids where (xid - 900) % 3 == 0 (i.e. event_id%6 ∈ {0, 3});
        // commit the rest
        byTxn.keys.toSeq.sorted.foreach { xid =>
          val msg =
            if ((xid - 900) % 3 == 0) MessageEncoder.streamAbort(xid, xid)
            else MessageEncoder.streamCommit(xid, lsn, lsn + 1, 0L)
          frames += MessageEncoder.xlogData(lsn, lsn, 0L, msg)
          lsn += 2
        }
        frames.result().flatMap(assembler.onCopyData).iterator.map { e =>
          Row(e.after("event_id").toLong, e.after("user_id").toLong,
            e.after("value").toDouble)
        }
      }
    }(org.apache.spark.sql.Encoders.row(out))
    decoded.agg(
      count(lit(1)).as("n"),
      sum("event_id").as("sum_id"),
      count_distinct(col("user_id")).as("n_users"),
      round(sum("value"), 2).as("sum_value"))
  }

  /** B7 snapshot→CDC handoff, proven end-to-end (reference
    * `pq/replication/stream.go:635-711` OpenFromSnapshotLSN +
    * `integration_test/snapshot_consistency_test.go:25`): a snapshot taken at
    * consistent-point LSN S plus the stream resumed **from S** must equal the
    * full table — no duplicates, no loss.
    *
    * Construction over `orders` (key = o_orderkey):
    *  - snapshot = rows with key % 3 != 0, as of LSN S;
    *  - the WAL contains, one single-event txn per row:
    *      * dup bait: snapshot rows with key % 7 == 1 as INSERTs committing
    *        BELOW S — a broken seam replays them and double-counts;
    *      * the missing rows (key % 3 == 0) as INSERTs committing above S;
    *      * updates (key % 3 != 0 && key % 5 == 2) above S setting
    *        o_orderstatus = 'X' — must override the snapshot image.
    *  - the stream side runs the real machinery per partition:
    *    [[graft.streaming.ResumeFilter]](frames, S) → [[TransactionAssembler]].
    *  - final state = per key, the image with the highest LSN (snapshot rows
    *    carry LSN 0) — then a status-level digest the DuckDB oracle recomputes
    *    directly from `orders`.
    *
    * Scale shape: encode→filter→decode is per-partition CPU (no shuffle); the
    * take-latest is one hash aggregation on the key, the digest a second
    * small one — the same two-exchange plan a real snapshot ∪ stream
    * materialization needs at any scale.
    */
  def snapshotHandoff(s: SparkSession, dir: String): DataFrame = {
    val S = 1000000000000L // snapshot consistent-point LSN
    val out = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("status", StringType),
      StructField("price", DoubleType), StructField("lsn", LongType)))
    val orders = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice")

    val decoded = orders.mapPartitions { it =>
      val assembler = new TransactionAssembler()
      val rel = MessageEncoder.xlogData(1, 1, 0L,
        MessageEncoder.relation(HandoffRelOid, "public", "orders", HandoffRelCols))
      def txn(endLsn: Long, msg: Array[Byte]): Seq[Array[Byte]] = Seq(
        MessageEncoder.xlogData(endLsn - 3, endLsn - 3, 0L, MessageEncoder.begin(endLsn, 0L, 1L)),
        MessageEncoder.xlogData(endLsn - 2, endLsn - 2, 0L, msg),
        MessageEncoder.xlogData(endLsn - 1, endLsn - 1, 0L, MessageEncoder.commit(endLsn - 1, endLsn, 0L)))
      val frames = Iterator(rel) ++ it.flatMap { r =>
        val key = r.getLong(0)
        val vals = Seq(Some(key.toString), Some(r.getString(1)), Some(r.getDouble(2).toString))
        val inSnapshot = key % 3 != 0
        val dupBait =
          if (inSnapshot && key % 7 == 1)
            txn(key * 10 + 10, MessageEncoder.insert(HandoffRelOid, vals)) // below S: must be filtered
          else Nil
        val insert =
          if (!inSnapshot) txn(S + key * 10 + 10, MessageEncoder.insert(HandoffRelOid, vals))
          else Nil
        val update =
          if (inSnapshot && key % 5 == 2)
            txn(S + key * 10 + 15, MessageEncoder.update(HandoffRelOid,
              Seq(Some(key.toString), Some("X"), Some(r.getDouble(2).toString))))
          else Nil
        dupBait ++ insert ++ update
      }
      ResumeFilter(frames, S).flatMap(assembler.onCopyData).map { e =>
        Row(e.after("o_orderkey").toLong, e.after("o_orderstatus"),
          e.after("o_totalprice").toDouble, e.lsn)
      }
    }(org.apache.spark.sql.Encoders.row(out))

    val snapshot = orders
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"), lit(0L).as("lsn"))

    snapshot.unionByName(decoded)
      .groupBy("o_orderkey")
      .agg(max(struct(col("lsn"), col("status"), col("price"))).as("latest"))
      .select(col("o_orderkey"), col("latest.status").as("final_status"), col("latest.price").as("price"))
      .groupBy("final_status")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("sum_key"),
        round(sum("price"), 2).as("sum_price"))
  }

  private val HandoffRelOid = 50001L
  private val HandoffRelCols = Seq(
    Messages.RelationColumn("o_orderkey", 20L, -1, 1),
    Messages.RelationColumn("o_orderstatus", 25L, -1, 0),
    Messages.RelationColumn("o_totalprice", 701L, -1, 0))

  private val RelOid = 50000L
  private val RelCols = Seq(
    Messages.RelationColumn("event_id", 20L, -1, 1), // int8, key
    Messages.RelationColumn("user_id", 20L, -1, 0),
    Messages.RelationColumn("event_type", 25L, -1, 0),
    Messages.RelationColumn("value", 701L, -1, 0)) // float8

  // Relation for the typed-view query: every cast family PgTypes bridges —
  // int8 key, nullable int4, text, NUMERIC(12,2) via typmod, DATE,
  // TIMESTAMPTZ, BOOL, and a deliberately unknown OID that must fall back
  // to string like the reference's pgtype map.
  private val TypedRelOid = 50002L
  private val TypedRelCols = Seq(
    Messages.RelationColumn("o_orderkey", 20L, -1, 1),
    Messages.RelationColumn("o_custkey", 23L, -1, 0),
    Messages.RelationColumn("o_orderstatus", 25L, -1, 0),
    Messages.RelationColumn("o_totalprice", 1700L, ((12 << 16) | 2) + 4, 0),
    Messages.RelationColumn("o_orderdate", 1082L, -1, 0),
    Messages.RelationColumn("o_ordertime", 1114L, -1, 0), // timestamp → TimestampNTZ
    Messages.RelationColumn("o_bulk", 16L, -1, 0),
    Messages.RelationColumn("o_priority", 99999L, -1, 0))
  private val TypedRel = Messages.Relation(0L, TypedRelOid, "public", "orders_typed",
    'd', TypedRelCols.toArray)

  /** SURVEY §1.2 (b), the typed per-table view: orders rows are encoded
    * into pgoutput text-format inserts, decoded back into the generic
    * envelope, and [[graft.cdc.ChangeEvent.typedView]] projects the
    * envelope through the relation's OIDs into a typed frame (bigint /
    * nullable int / decimal(12,2) / date / timestamp / boolean / unknown-OID
    * string). The aggregate runs ON the typed columns, so the DuckDB
    * oracle — which computes the same from the source table with plain SQL
    * casts — hash-verifies every cast family end-to-end.
    */
  def typedViewOrders(s: SparkSession, dir: String): DataFrame = {
    // Pin o_orderdate to TIMESTAMP_NTZ before the row accessor below: the
    // testdata generator has already flipped one temporal column's physical
    // type between rounds (events.ts, see Tables.events), and the
    // getAs[LocalDateTime] in the encoder would throw on a DATE or
    // LTZ-timestamp generation. The cast is a no-op on the current files.
    val orders = Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"),
      col("o_orderdate").cast(org.apache.spark.sql.types.TimestampNTZType)
        .as("o_orderdate"),
      col("o_orderpriority"))
    // costFactor: the kernel frames every row through the full pgoutput
    // encode+decode round trip — r22 A/B: the plain byte-derived width
    // regressed this family while widths ≥ ~20 matched r21's numbers
    val envelope = Tables.fanOut(orders, costFactor = 4).mapPartitions { it =>
      val tsFmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      val assembler = new TransactionAssembler()
      val rel = MessageEncoder.xlogData(1, 1, 0L,
        MessageEncoder.relation(TypedRelOid, "public", "orders_typed", TypedRelCols))
      assembler.onCopyData(rel)
      var lsn = 10L
      def toInstant(micros: Long): java.time.Instant =
        java.time.Instant.ofEpochSecond(micros / 1000000L, (micros % 1000000L) * 1000L)
      it.grouped(500).flatMap { txn =>
        val frames = Seq.newBuilder[Array[Byte]]
        val beginLsn = lsn
        val endLsn = beginLsn + txn.size + 2L
        val commitMicros = 1700000000000000L + beginLsn
        frames += MessageEncoder.xlogData(beginLsn, beginLsn, 0L,
          MessageEncoder.begin(endLsn, commitMicros, 1L))
        txn.zipWithIndex.foreach { case (r, i) =>
          val key = r.getLong(0)
          // parquet timestamp[ms] (no tz) surfaces as TimestampNTZ → LocalDateTime
          val ldt = r.getAs[java.time.LocalDateTime](4)
          val vals = Seq(
            Some(key.toString),
            if (key % 7 == 0) None else Some(r.getLong(1).toString),
            Some(r.getString(2)),
            Some(r.getDouble(3).toString),
            Some(ldt.toLocalDate.toString),
            Some(tsFmt.format(ldt)),
            Some(if (key % 2 == 0) "t" else "f"),
            Some(r.getString(5)))
          frames += MessageEncoder.xlogData(beginLsn + 1 + i, beginLsn + 1 + i, 0L,
            MessageEncoder.insert(TypedRelOid, vals))
        }
        frames += MessageEncoder.xlogData(endLsn - 1, endLsn - 1, 0L,
          MessageEncoder.commit(endLsn - 1, endLsn, commitMicros))
        lsn = endLsn
        frames.result().iterator.flatMap(assembler.onCopyData).map { e =>
          Row(e.lsn, e.commitLsn, e.xid, e.op, e.schema, e.table,
            toInstant(e.messageTimeMicros), toInstant(e.commitTimeMicros),
            e.keyNames, e.before, e.after)
        }
      }
    }(org.apache.spark.sql.Encoders.row(graft.cdc.ChangeEvent.schema))

    graft.cdc.ChangeEvent.typedView(envelope, TypedRel)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        sum("o_orderkey").as("sum_key"),
        sum("o_custkey").as("sum_cust"),
        max("o_totalprice").as("max_price"),
        max("o_orderdate").as("max_date"),
        max("o_ordertime").as("max_ts"),
        sum(when(col("o_bulk"), 1L).otherwise(0L)).as("n_bulk"),
        min("o_priority").as("min_priority"))
  }

  /** The flagship: full wire round-trip, distributed. Each partition of
    * `events` is encoded into pgoutput frames (insert/update/delete per
    * event_type, one transaction per 500 rows), pushed through
    * [[TransactionAssembler]], and the decoded change events are aggregated.
    * The DuckDB oracle computes the same aggregate straight from the table —
    * any decoder/assembler drift breaks the hash match.
    *
    * Scale shape: encode+decode is per-partition CPU work with no shuffle
    * until the final aggregate; throughput scales linearly with cores (this
    * is also the ingest benchmark, cf. BASELINE.md CDC throughput).
    */
  def cdcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("op", StringType), StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    // measured A/B (r21): fan-out cost more than it saved (see above)
    val events = Tables.events(s, dir).select("event_id", "user_id", "event_type", "value")
    val decoded = events.mapPartitions { it =>
      val assembler = new TransactionAssembler()
      val rel = MessageEncoder.xlogData(1, 1, 0L,
        MessageEncoder.relation(RelOid, "public", "events", RelCols))
      val relEvents = assembler.onCopyData(rel)
      assert(relEvents.isEmpty)
      var lsn = 10L
      it.grouped(500).flatMap { txn =>
        val frames = Seq.newBuilder[Array[Byte]]
        val beginLsn = lsn
        val endLsn = beginLsn + txn.size + 2L
        frames += MessageEncoder.xlogData(beginLsn, beginLsn, 0L,
          MessageEncoder.begin(endLsn, 0L, 1L))
        txn.zipWithIndex.foreach { case (r, i) =>
          val vals = Seq(
            Some(r.getLong(0).toString), Some(r.getLong(1).toString),
            Some(r.getString(2)), Some(r.getDouble(3).toString))
          val msg = r.getString(2) match {
            case "signup" | "purchase" => MessageEncoder.insert(RelOid, vals)
            case "click" | "view" =>
              MessageEncoder.update(RelOid, vals, vals, 'O')
            case _ => // delete: key-only old tuple, like REPLICA IDENTITY DEFAULT
              MessageEncoder.delete(RelOid,
                Seq(Some(r.getLong(0).toString), None, None, None), 'K')
          }
          frames += MessageEncoder.xlogData(beginLsn + 1 + i, beginLsn + 1 + i, 0L, msg)
        }
        frames += MessageEncoder.xlogData(endLsn - 1, endLsn - 1, 0L,
          MessageEncoder.commit(endLsn - 1, endLsn, 0L))
        lsn = endLsn
        val evs = frames.result().flatMap(assembler.onCopyData)
        evs.iterator.map { e =>
          val img = if (e.op == "delete") e.before else e.after
          Row(e.op,
            img("event_id").toLong,
            if (e.op == "delete") null else img("user_id").toLong,
            if (e.op == "delete") null else img("value").toDouble)
        }
      }
    }(org.apache.spark.sql.Encoders.row(out))
    decoded.groupBy("op").agg(
      count(lit(1)).as("n"),
      sum("event_id").as("sum_id"),
      count_distinct(col("user_id")).as("n_users"),
      round(sum("value"), 2).as("sum_value"))
  }

  /** Binary-format publication roundtrip (`binary: true`) — BEYOND the
    * reference, which length-parses but never decodes 'b' columns
    * (`pq/message/tuple/data.go:63-71`): each partition re-encodes its
    * events as INSERTs whose int8/float8/timestamptz columns are
    * BINARY-format wire bytes (network order, µs-since-2000 timestamps)
    * next to a text column, decodes them through the full assembler path
    * ([[graft.types.PgBinary]] renders 'b' to canonical text inside
    * `tupleToMap`), projects through the SAME [[PgTypes.fromText]] casts a
    * typed view uses, and aggregates. The oracle recomputes the aggregate
    * straight from `events` — any drift in byte order, epoch, or text
    * rendering hash-mismatches.
    *
    * Scale shape: per-partition encode+decode CPU, zero shuffle until the
    * final tiny aggregation.
    */
  def binaryRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import MessageEncoder.Col.{Bin, Text}
    val relOid = 50100L
    val relCols = Seq(
      Messages.RelationColumn("event_id", 20L, -1, 1), // int8, key
      Messages.RelationColumn("user_id", 20L, -1, 0), // int8
      Messages.RelationColumn("event_type", 25L, -1, 0), // text
      Messages.RelationColumn("value", 701L, -1, 0), // float8
      Messages.RelationColumn("ts", 1184L, -1, 0), // timestamptz
      Messages.RelationColumn("pair_ids", 1016L, -1, 0)) // int8[]
    val textOut = StructType(relCols.map(c => StructField(c.name, StringType)))
    def be8(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(v).array()
    // array_send bytes for int8[] {a,b,NULL}: exercises the binary array
    // header, element framing, and NULL-element decode end-to-end
    def be8arr(a: Long, bv: Long): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(48)
      buf.putInt(1).putInt(1).putInt(20) // ndim, has-null, int8 element oid
      buf.putInt(3).putInt(1) // one dim: 3 elements, lower bound 1
      buf.putInt(8).putLong(a)
      buf.putInt(8).putLong(bv)
      buf.putInt(-1) // trailing NULL element
      buf.array()
    }
    val events = Tables.fanOut(Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us")))
    val decoded = events.mapPartitions { it =>
      val assembler = new TransactionAssembler()
      assembler.onCopyData(MessageEncoder.xlogData(1, 1, 0L,
        MessageEncoder.relation(relOid, "public", "events_bin", relCols)))
      var lsn = 10L
      it.grouped(500).flatMap { txn =>
        val frames = Seq.newBuilder[Array[Byte]]
        val beginLsn = lsn
        val endLsn = beginLsn + txn.size + 2L
        frames += MessageEncoder.xlogData(beginLsn, beginLsn, 0L,
          MessageEncoder.begin(endLsn, 0L, 1L))
        txn.zipWithIndex.foreach { case (r, i) =>
          frames += MessageEncoder.xlogData(beginLsn + 1 + i, beginLsn + 1 + i, 0L,
            MessageEncoder.insertTagged(relOid, Seq(
              Bin(be8(r.getLong(0))),
              Bin(be8(r.getLong(1))),
              Text(r.getString(2)),
              Bin(be8(java.lang.Double.doubleToLongBits(r.getDouble(3)))),
              Bin(be8(graft.pgproto.PgEpoch.fromUnixMicros(r.getLong(4)))),
              Bin(be8arr(r.getLong(0), r.getLong(1))))))
        }
        frames += MessageEncoder.xlogData(endLsn - 1, endLsn - 1, 0L,
          MessageEncoder.commit(endLsn - 1, endLsn, 0L))
        lsn = endLsn
        frames.result().flatMap(assembler.onCopyData).iterator.map { e =>
          Row(relCols.map(c => e.after(c.name)): _*)
        }
      }
    }(org.apache.spark.sql.Encoders.row(textOut))
    decoded
      .select(relCols.map(c =>
        graft.types.PgTypes.fromText(col(c.name), c.typeOid).as(c.name)): _*)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("event_id").as("sum_id"),
        round(sum("value"), 2).as("sum_value"),
        max(unix_micros(col("ts"))).as("max_ts_us"),
        sum(element_at(col("pair_ids"), 1) + element_at(col("pair_ids"), 2))
          .as("sum_pair"),
        // size()==3 is load-bearing: element_at past the end is ALSO null
        // (ANSI off), so without it a renderer that silently DROPS the
        // trailing NULL element would still count 3 and stay green
        sum(when(size(col("pair_ids")) === 3 &&
          element_at(col("pair_ids"), 3).isNull, 1L).otherwise(0L))
          .as("n_null3"))
  }

  /** Logical decoding messages ('M', `pg_logical_emit_message`) end-to-end —
    * BEYOND the reference, which raises on the tag: the outbox pattern.
    * Each partition re-encodes its events as transactions that interleave
    * DML-free payloads: transactional JSON outbox messages (purchase/
    * signup), a NON-transactional audit message per click (delivered
    * immediately, mid-transaction), and a transactional binary blob per
    * error (invalid UTF-8 — exercises the lossless `content_hex` surface).
    * The assembler must deliver all of them with the right payloads; the
    * aggregate is partition-count-independent so the DuckDB oracle can
    * recompute it straight from `events`.
    *
    * Scale shape: same as cdcRoundtrip — per-partition encode+decode CPU
    * with zero shuffle until the final tiny aggregation.
    */
  def logicalMessages(s: SparkSession, dir: String): DataFrame = {
    val out = StructType(Seq(
      StructField("prefix", StringType), StructField("is_text", BooleanType),
      StructField("content_len", LongType)))
    // costFactor: same pgoutput encode+decode class as cdcTypedView —
    // the byte-derived width (5) regressed this query 0.9 → 1.2-1.7 s in
    // the r22 interleaved A/B; the kernel cost scales with rows, not the
    // narrow projected bytes
    val events = Tables.fanOut(
      Tables.events(s, dir).select("event_id", "user_id", "event_type"),
      costFactor = 4)
    val decoded = events.mapPartitions { it =>
      val assembler = new TransactionAssembler()
      var lsn = 10L
      it.grouped(400).flatMap { txn =>
        val frames = Seq.newBuilder[Array[Byte]]
        val beginLsn = lsn
        val endLsn = beginLsn + txn.size + 2L
        frames += MessageEncoder.xlogData(beginLsn, beginLsn, 0L,
          MessageEncoder.begin(endLsn, 0L, 7L))
        txn.zipWithIndex.foreach { case (r, i) =>
          val id = r.getLong(0)
          val uid = r.getLong(1)
          val at = beginLsn + 1 + i
          val msg = r.getString(2) match {
            case t @ ("purchase" | "signup") =>
              val json = s"""{"event_id":$id,"user_id":$uid}"""
              Some(MessageEncoder.logicalMessage(
                s"outbox.$t", json.getBytes("UTF-8"), transactional = true, lsn = at))
            case "click" =>
              Some(MessageEncoder.logicalMessage(
                "audit", s"click:$id".getBytes("UTF-8"), transactional = false, lsn = at))
            case "error" =>
              // 0xC3 0x28 is an invalid UTF-8 sequence by construction.
              Some(MessageEncoder.logicalMessage(
                "blob", Array(0xc3.toByte, 0x28.toByte, (id & 0xff).toByte),
                transactional = true, lsn = at))
            case _ => None // view: no message
          }
          msg.foreach(m => frames += MessageEncoder.xlogData(at, at, 0L, m))
        }
        frames += MessageEncoder.xlogData(endLsn - 1, endLsn - 1, 0L,
          MessageEncoder.commit(endLsn - 1, endLsn, 0L))
        lsn = endLsn
        frames.result().flatMap(assembler.onCopyData).iterator.collect {
          case e if e.op == "message" =>
            val hex = e.after("content_hex")
            Row(e.after("prefix"), e.after("content_text") != null, (hex.length - 2L) / 2L)
        }
      }
    }(org.apache.spark.sql.Encoders.row(out))
    decoded.groupBy("prefix").agg(
      count(lit(1)).as("n_messages"),
      sum(when(col("is_text"), 1L).otherwise(0L)).as("n_text"),
      sum("content_len").as("sum_bytes"))
  }

  /** Incremental view maintenance over a deterministic 3-batch changelog
    * derived from `orders`: (0) insert every order, (1) bump
    * `o_totalprice` ~10% (in integer cents) where `o_orderkey % 7 = 0` —
    * retract+insert,
    * with dirty-group min/max recompute when an update touches a group
    * extreme — (2) delete where `o_orderkey % 13 = 0`. The maintained
    * count/sum/min/max per `o_orderstatus` must equal the oracle's direct
    * aggregate over the final table — any drift in the delta arithmetic,
    * the retraction handling, or the dirty-group recompute breaks the
    * hash. See [[IncrementalAgg]] for the maintenance semantics.
    */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    // measured A/B (r21): fanOut+localCheckpoint here was ~0.4 s SLOWER
    // than the bare scan — the per-step deltas are map-light and the
    // extra exchange/materialization jobs outweigh the parallelism
    val orders = Tables.orders(s, dir)
    val mapT = "map<string,string>"
    // integer-cents money discipline (see [[LakeQueries.cents]]): the
    // envelope carries BIGINT cents and the maintained sum/min/max stay
    // long — exact under any retraction order, no rendering or rounding
    // agreement needed between the engines (the r12-r13 double `* 1.1` /
    // `round(sum(double), 2)` construction was engine-pair-sensitive and
    // went driver-red twice)
    def img(priceCents: Column): Column = map(
      lit("o_orderstatus"), col("o_orderstatus"),
      lit("o_orderkey"), col("o_orderkey").cast("string"),
      lit("o_custkey"), col("o_custkey").cast("string"),
      lit("o_totalprice_cents"), priceCents.cast("string"))
    val cents0 = LakeQueries.cents(col("o_totalprice"))
    val newCents = LakeQueries.bump(cents0)
    val curCents =
      when(col("o_orderkey") % 7 === 0, newCents).otherwise(cents0)
    val b0 = orders.select(lit("insert").as("op"),
      lit(null).cast(mapT).as("before"), img(cents0).as("after"))
    val b1 = orders.filter(col("o_orderkey") % 7 === 0)
      .select(lit("update").as("op"), img(cents0).as("before"),
        img(newCents).as("after"))
    val b2 = orders.filter(col("o_orderkey") % 13 === 0)
      .select(lit("delete").as("op"), img(curCents).as("before"),
        lit(null).cast(mapT).as("after"))
    val cur0 = orders.select(img(cents0).as("after"))
    val cur1 = orders.select(img(curCents).as("after"))
    val cur2 = orders.filter(col("o_orderkey") % 13 =!= 0)
      .select(img(curCents).as("after"))
    val price = (im: Column) => element_at(im, "o_totalprice_cents").cast("long")
    // decimal measure kept alongside the cents: sums must stay
    // DECIMAL-EXACT through retraction arithmetic over the whole horizon —
    // this pins IncrementalAgg's type-preserving decimal accumulator
    val keyDec = (im: Column) => element_at(im, "o_orderkey").cast("decimal(18,2)")
    val agg = new IncrementalAgg(
      group = Seq("o_orderstatus" -> (im => element_at(im, "o_orderstatus"))),
      sums = Seq("price_cents" -> price, "key_dec" -> keyDec),
      mins = Seq("price_cents" -> price),
      maxs = Seq("price_cents" -> price))
    // r22: the three per-batch deltas are computed in ONE checkpointed
    // job (a step-tagged union) instead of one delta job per step, and
    // the fold rides the maintainer seam (stepMerge) because the
    // synthesized batches are statically truncate-free — this removes the
    // three per-step truncate probes (each a scan of the batch) and two
    // of the three delta-scan jobs. Result-identical: delta's measures
    // here are BIGINT cents / DECIMAL / longs (exact under any partial-
    // aggregation order), the union+filter recovers exactly delta(b_i)'s
    // rows, and stepMerge is step() minus the truncate branch these
    // batches never took. The per-step merge checkpoints stay (the dirty
    // probe and the next step read group-cardinality state, not re-run
    // deltas).
    val allD = Seq(b0, b1, b2).map(agg.delta).zipWithIndex
      .map { case (d, i) => d.withColumn("_step", lit(i)) }
      .reduce(_.unionByName(_))
      // LAZY: step 0's dirty probe scans every partition (its batch is
      // insert-only, nothing is dirty) and materializes the checkpoint
      .localCheckpoint(eager = false)
    val st = Seq((0, cur0), (1, cur1), (2, cur2))
      .foldLeft(agg.init(s)) { case (state, (i, cur)) =>
        agg.stepMerge(state,
          allD.filter(col("_step") === i).drop("_step"), cur)
      }
    // maintained count(DISTINCT o_custkey) rides the same churn through
    // the refcount state — updates keep the custkey (net-zero refcount
    // delta), deletes decrement it, and the final count must equal the
    // oracle's direct DISTINCT over the surviving table
    val dist = new IncrementalDistinct(
      group = Seq("o_orderstatus" -> (im => element_at(im, "o_orderstatus"))),
      name = "cust",
      value = im => element_at(im, "o_custkey").cast("long"))
    // the synthesized batches are statically truncate-free, so the fold
    // rides the maintainer seam (precomputed delta, lazy merge): three
    // chained merges plan as ONE job instead of per-step probe +
    // checkpoint jobs (r15 verdict: those actions alone cost q_ivm
    // 2.2 s); the truncate/step path is property-gated in
    // IncrementalDistinctPropertySpec
    val dst = Seq(b0, b1, b2)
      .foldLeft(dist.init(s)) { (state, batch) =>
        dist.stepMerge(state, dist.delta(batch))
      }
    // the decimal accumulator runs the whole maintenance horizon in
    // DECIMAL(18,2) (pinned by LakeQueriesSpec and
    // IncrementalAggPropertySpec); only the RENDERED cell is scaled to
    // BIGINT here — a DECIMAL-sum output column proved gate-portable
    // nowhere while every all-BIGINT cents gate went green immediately
    agg.view(st)
      .join(dist.view(dst), Seq("o_orderstatus"), "left_outer")
      .select(col("o_orderstatus"), col("n"),
        coalesce(col("nd_cust"), lit(0L)).as("n_cust"),
        col("sum_price_cents").cast("long").as("sum_price_cents"),
        col("sum_key_dec").multiply(100).cast("long").as("sum_key_c"),
        col("min_price_cents").cast("long").as("min_price_cents"),
        col("max_price_cents").cast("long").as("max_price_cents"))
  }
}
