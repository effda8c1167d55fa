package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pgproto.Lsn
import graft.services.SlotManager
import graft.snapshot.{SnapshotConfig, SnapshotJobStore, SnapshotOrchestrator}
import graft.streaming.StatefulOps

/** End-to-end snapshot→CDC handoff walkthrough — the full B2/B6/B7/B8
  * choreography on synthetic data, runnable without PostgreSQL:
  *
  *  1. prepare: "create" the slot (fixture executor stands in for the
  *     server), record the snapshot job at the consistent-point LSN;
  *  2. snapshot: materialize table state as of that LSN by replaying the WAL
  *     prefix (what a real deployment reads via the exported snapshot), with
  *     B6 BEGIN/DATA/END lifecycle markers;
  *  3. complete the job; fetch the stream start LSN;
  *  4. stream: `readStream.format("pgcdc").option("startLsn", …)` resumes
  *     exactly after the snapshot, and [[StatefulOps.latestState]]
  *     materializes the union — final state must equal a full replay.
  *
  * Usage: HandoffDemo [nTxns rowsPerTxn snapshotTxns]
  */
object HandoffDemo {
  def main(args: Array[String]): Unit = {
    val nTxns = if (args.length > 0) args(0).toInt else 8
    val rows = if (args.length > 1) args(1).toInt else 3
    val snapTxns = if (args.length > 2) args(2).toInt else 4
    require(snapTxns <= nTxns, "snapshotTxns must be <= nTxns")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ui.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wal = java.nio.file.Files.createTempFile("handoff-wal", ".bin").toString
    WalFile.write(wal, WalGen.frames(nTxns, rows))
    // WalGen txn t spans [100 + t*(rows+2), 100 + (t+1)*(rows+2))
    val snapshotLsn = 100L + snapTxns.toLong * (rows + 2)

    // 1. prepare: the CREATE_REPLICATION_SLOT fixture returns the
    // consistent point + exported snapshot name; job recorded at that LSN.
    val store = new SnapshotJobStore.InMemory
    var slotCreated = false
    val slots = new SlotManager({ sql =>
      if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
        slotCreated = true
        Seq(Seq("graft_slot", Lsn.format(snapshotLsn), "demo-exported-snap", "pgoutput"))
      } else if (slotCreated) Seq(Seq(
        "graft_slot", "logical", "f", null, Lsn.format(snapshotLsn),
        Lsn.format(snapshotLsn), "reserved", Lsn.format(snapshotLsn)))
      else Seq.empty
    }, "graft_slot")
    println(s"shouldTakeSnapshot(initial) = ${SnapshotOrchestrator.shouldTakeSnapshot(
      SnapshotConfig(), store, "graft_slot")}")
    val job = SnapshotOrchestrator.prepare(slots, store, "graft_slot")
    val lsn = job.snapshotLsn
    println(s"prepared: consistent point ${Lsn.format(lsn)}, " +
      s"exported snapshot '${job.snapshotId}'")

    // 2. snapshot = table state as of the consistent point (replay prefix).
    val snapRows = {
      val assembler = new graft.cdc.TransactionAssembler()
      WalFile.read(wal).flatMap(assembler.onCopyData)
        .filter(e => Lsn.compare(e.lsn, lsn) <= 0)
        .map(e => (e.after("id").toLong, e.after("name")))
        .toSeq
    }
    val snapshotDf = snapRows.toDF("id", "name")
    val withMarkers = SnapshotOrchestrator.withLifecycle(
      spark, snapshotDf, "users", lsn, snapRows.size.toLong)
    println(s"snapshot rows: ${snapRows.size}; lifecycle events:")
    withMarkers.groupBy("snapshot_event").count().orderBy("snapshot_event").show()

    // 3. complete; the stream may now start.
    SnapshotOrchestrator.complete(store, "graft_slot")
    val startLsn = SnapshotOrchestrator.streamStartLsn(store, "graft_slot")

    // 4. stream from the handoff point; materialize latest state.
    val stream = spark.readStream.format("pgcdc")
      .option("path", wal).option("startLsn", startLsn.toString).load()
    val q = StatefulOps.latestState(spark, stream)
      .writeStream.format("memory").queryName("handoff_state")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    // `key` is the length-prefixed composite encoding ("2:17"); the row id
    // comes from the image map (null only for delete tombstones — none here).
    val streamed = spark.table("handoff_state")
      .select(element_at(col("image"), "id").cast("long"),
        element_at(col("image"), "name"))
      .as[(Long, String)].collect().toMap

    val finalState = (snapRows.toMap ++ streamed).toSeq.sortBy(_._1)
    val expected = (1L to nTxns.toLong * rows).map(i => i -> s"Oyleli$i")
    val ok = finalState == expected
    println(s"streamed ${streamed.size} rows after ${Lsn.format(startLsn)}; " +
      s"final state ${finalState.size} rows; exactly-once = $ok")
    require(ok, "snapshot ∪ stream must equal full table state")
    spark.stop()
  }
}
