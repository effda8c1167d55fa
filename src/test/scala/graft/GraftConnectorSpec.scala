package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.services.Publication
import graft.services.Publication.{Config, PubTable, ReplicaIdentity}
import graft.snapshot.SnapshotJobStore
import graft.streaming.FakeWalsender
import graft.tools.WalGen

/** The one-call boot (`GraftConnector.start`) against a single fake server:
  * publication created, replica identity ALTERed on drift, slot created
  * with its exported snapshot, every table snapshot delivered typed through
  * the sink under the pin, and the CDC stream handed back at the handoff
  * LSN — the reference's `NewConnector(cfg).Start()` sequence end-to-end
  * with no real PostgreSQL.
  */
class GraftConnectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val ChunkRange = """id >= (-?\d+) AND id (<=|<) (-?\d+)""".r.unanchored

  private def serve(sql: String): Option[(Seq[String], Seq[Seq[Option[String]]])] = {
    def ok = Some((Seq("ok"), Seq.empty[Seq[Option[String]]]))
    if (sql.contains("pg_publication_tables")) Some((Seq("pubname"), Nil)) // missing
    else if (sql.startsWith("CREATE PUBLICATION")) ok
    else if (sql.startsWith("ALTER TABLE")) ok
    else if (sql.contains("relreplident"))
      Some((Seq("relname", "nspname", "ident", "idx"),
        Seq(Seq(Some("users"), Some("public"), Some("d"), None))))
    else if (sql.contains("format_type")) // primary-key columns
      Some((Seq("attname", "type"), Seq(Seq(Some("id"), Some("integer")))))
    else if (sql.contains("atttypid")) // full column list
      Some((Seq("attname", "oid", "typmod", "key"), Seq(
        Seq(Some("id"), Some("23"), Some("-1"), Some("1")),
        Seq(Some("name"), Some("25"), Some("-1"), Some("0")))))
    else if (sql.startsWith("SELECT MIN"))
      Some((Seq("mn", "mx"), Seq(Seq(Some("1"), Some("6")))))
    else if (sql.startsWith("SELECT COUNT(*)"))
      Some((Seq("n"), Seq(Seq(Some("6")))))
    else if (sql.contains("pg_relation_size"))
      Some((Seq("pages"), Seq(Seq(Some("1")))))
    else if (sql.contains("reltuples"))
      Some((Seq("t"), Seq(Seq(Some("6")))))
    else if (sql.startsWith("SELECT slot_name")) Some((Seq("s"), Nil)) // absent
    else if (sql.startsWith("CREATE_REPLICATION_SLOT"))
      Some((Seq("slot_name", "consistent_point", "snapshot_name", "output_plugin"),
        Seq(Seq(Some("graft_slot"), Some("0/10"), Some("boot-snap-1"), Some("pgoutput")))))
    else if (sql.startsWith("BEGIN ISOLATION LEVEL REPEATABLE READ")) ok
    else if (sql == "COMMIT") ok
    else sql match {
      case ChunkRange(lo, op, hi) =>
        val last = if (op == "<=") hi.toLong else hi.toLong - 1
        val rows = (lo.toLong to last).filter(i => i >= 1 && i <= 6)
          .map(i => Seq(Some(i.toString), Some(s"u$i")))
        Some((Seq("id", "name"), rows))
      case _ => None
    }
  }

  test("one-call boot: publication -> identities -> pinned snapshot -> stream at handoff LSN") {
    // WAL served to the stream AFTER the snapshot: two 2-row txns, all
    // committing past the slot's consistent point 0/10.
    val server = new FakeWalsender(WalGen.frames(2, 2).toSeq, sqlResults = serve)
    try {
      val cfg = GraftConfig(
        host = "127.0.0.1", port = server.port, username = "u", database = "db",
        publication = Config("e2e_pub", Seq(
          PubTable("public", "users", replicaIdentity = ReplicaIdentity.Full))),
        slotName = "graft_slot",
        snapshot = graft.snapshot.SnapshotConfig(chunkSize = 3L))

      val exec = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None).executor
      val replExec = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None, replication = true).executor

      val delivered = scala.collection.mutable.Map.empty[String, Seq[(Int, String)]]
      val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
      val progress = new graft.snapshot.SnapshotProgress(spark.sparkContext)
      val boot = GraftConnector.start(
        spark, cfg, new SnapshotJobStore.InMemory, exec, replExec,
        snapshotSink = (table, df) =>
          // materialize INSIDE the retry window, like a real overwrite sink
          delivered(table) = df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq,
        warn = warnings += _,
        progress = Some(progress))

      assert(boot.publication.name == "e2e_pub")
      assert(warnings.isEmpty, "publication was missing: created, not warned")
      assert(boot.replicaIdentityDdl ==
        Seq("""ALTER TABLE "public"."users" REPLICA IDENTITY FULL"""),
        "identity drift d->FULL ALTERed during boot")
      assert(delivered("public.users").sortBy(_._1) ==
        (1 to 6).map(i => (i, s"u$i")), "snapshot delivered typed, all chunks")
      assert(boot.startLsn.contains(graft.pgproto.Lsn.parse("0/10")),
        "stream starts at the slot's consistent point")

      // Snapshot-phase gauges tracked the real bulk load (6 rows / chunk 3
      // -> 2 chunks): chunk+row counts came back from executor tasks.
      val g = progress.gauges.toMap
      assert(g("in_progress") == 0.0 && g("total_tables") == 1.0 &&
        g("completed_tables") == 1.0 && g("total_chunks") == 2.0 &&
        g("completed_chunks") == 2.0 && g("rows_total") == 6.0,
        s"snapshot gauges after boot: $g")

      // Snapshot reads ran under the exported-snapshot pin.
      val qs = server.queries.synchronized(server.queries.toVector)
      val pins = qs.filter(_.startsWith("BEGIN ISOLATION LEVEL REPEATABLE READ"))
      assert(pins.nonEmpty && pins.forall(_.contains("SET TRANSACTION SNAPSHOT 'boot-snap-1'")))

      // The handed-back stream decodes the post-snapshot WAL.
      val q = boot.stream.get.writeStream.format("memory")
        .queryName("boot_stream").outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      assert(spark.table("boot_stream").count() == 4L,
        "2 txns x 2 rows arrive through the stream")
      val qsAfter = server.queries.synchronized(server.queries.toVector)
      assert(qsAfter.exists(_.startsWith("START_REPLICATION SLOT graft_slot LOGICAL 0/10")),
        "START_REPLICATION issued at the handoff LSN")
    } finally server.close()
  }

  test("invalidation mid-snapshot during boot: fresh export, sink re-invoked, no stale rows") {
    // First chunk SELECT of the FIRST attempt dies with the
    // invalidated-snapshot family; the retry re-creates the slot (fresh
    // export) and the sink runs again against the new pin.
    val invalidations = new java.util.concurrent.atomic.AtomicInteger(1)
    val slotGen = new java.util.concurrent.atomic.AtomicInteger(0)
    val slotUp = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = new FakeWalsender(Seq.empty,
      sqlResults = { sql =>
        if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
          require(slotUp.compareAndSet(false, true), "CREATE on an existing slot")
          Some((Seq("s", "cp", "snap", "plugin"), Seq(Seq(
            Some("graft_slot"), Some("0/10"),
            Some(s"boot-snap-${slotGen.incrementAndGet()}"), Some("pgoutput")))))
        } else if (sql.startsWith("DROP_REPLICATION_SLOT")) {
          slotUp.set(false); Some((Seq("ok"), Nil))
        } else if (sql.startsWith("SELECT slot_name")) {
          if (slotUp.get())
            Some((Seq("c"), Seq(Seq(Some("graft_slot"), Some("logical"), Some("f"),
              None, Some("0/8"), Some("0/10"), Some("reserved"), Some("0/100")))))
          else Some((Seq("c"), Nil))
        } else serve(sql)
      },
      sqlErrors = { sql =>
        if (sql.startsWith("SELECT \"id\"") && invalidations.getAndDecrement() > 0)
          Some(("22023", "invalid snapshot identifier: \"boot-snap-1\""))
        else None
      })
    try {
      val cfg = GraftConfig(
        host = "127.0.0.1", port = server.port, username = "u", database = "db",
        publication = Config("e2e_pub", Seq(PubTable("public", "users"))),
        slotName = "graft_slot",
        // snapshot.id pins the snapshot-only job/slot key to the fake's name
        snapshot = graft.snapshot.SnapshotConfig(
          mode = "snapshot_only", chunkSize = 3L, id = Some("graft_slot")))
      val exec = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None).executor
      val store = new SnapshotJobStore.InMemory

      var sinkInvocations = 0
      var delivered = Seq.empty[Int]
      val progress = new graft.snapshot.SnapshotProgress(spark.sparkContext)
      val boot = GraftConnector.start(spark, cfg, store, exec, exec,
        snapshotSink = (_, df) => {
          sinkInvocations += 1 // the failed attempt counts: it was invoked
          delivered = df.collect().map(_.getInt(0)).sorted.toSeq
        },
        retrySleep = _ => (),
        progress = Some(progress))

      assert(sinkInvocations == 2, "sink re-invoked for the retry attempt")
      // gauges restart with each attempt: the failed first attempt's partial
      // counts must not inflate the winning attempt's numbers
      val g = progress.gauges.toMap
      assert(g("rows_total") == 6.0 && g("completed_chunks") == 2.0 &&
        g("in_progress") == 0.0,
        s"gauges must reflect the WINNING attempt only: $g")
      assert(delivered == (1 to 6), "the WINNING attempt delivers every row")
      assert(slotGen.get() == 2, "retry dropped the dead slot and re-exported")
      assert(store.load("graft_slot").exists(j =>
        j.snapshotId == "boot-snap-2" && j.completed),
        "job row pins the fresh export")
      assert(boot.stream.isEmpty)
      val qs = server.queries.synchronized(server.queries.toVector)
      assert(qs.exists(_.startsWith("DROP_REPLICATION_SLOT graft_slot")),
        "the invalidated attempt's slot was dropped before re-export")
      assert(qs.exists(_.contains("SET TRANSACTION SNAPSHOT 'boot-snap-2'")),
        "retry chunks read under the NEW exported snapshot")
    } finally server.close()
  }

  test("boot against a drifted pre-existing publication warns the operator") {
    // The publication EXISTS but publishes the wrong shape: a stale table
    // set ({public.legacy} vs the configured public.users) and no truncate.
    // create() must tolerate-and-reuse (reference semantics: never ALTER a
    // publication), and start() must surface the drift through `warn`.
    val server = new FakeWalsender(Seq.empty, sqlResults = { sql =>
      if (sql.startsWith("ALTER PUBLICATION")) Some((Seq.empty, Seq.empty))
      else if (sql.contains("pg_publication_tables"))
        Some((Seq("pubname", "alltables", "ins", "upd", "del", "trunc", "tables"),
          Seq(Seq(Some("e2e_pub"), Some("f"), Some("t"), Some("t"), Some("t"),
            Some("f"), Some("{public.legacy}")))))
      else if (sql.startsWith("SELECT slot_name")) // slot exists, inactive
        Some((Seq("c"), Seq(Seq(Some("graft_slot"), Some("logical"), Some("f"),
          None, Some("0/8"), Some("0/10"), Some("reserved"), Some("0/100")))))
      else serve(sql)
    })
    try {
      val cfg = GraftConfig(
        host = "127.0.0.1", port = server.port, username = "u", database = "db",
        publication = Config("e2e_pub", Seq(PubTable("public", "users"))),
        slotName = "graft_slot",
        snapshot = graft.snapshot.SnapshotConfig(mode = "never"))
      val exec = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None).executor
      val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
      GraftConnector.start(spark, cfg, new SnapshotJobStore.InMemory,
        exec, exec, warn = warnings += _)
      val drift = warnings.filter(_.startsWith("publication drift"))
      assert(drift.nonEmpty, s"drift warning expected; got: $warnings")
      assert(drift.head.contains("tables missing from publication: public.users"))
      assert(drift.head.contains("unexpected tables in publication: public.legacy"))
      assert(drift.head.contains("operations missing: truncate"))
      assert(!warnings.exists(_.startsWith("publication aligned")),
        "report-only by default: no remediation without the opt-in")

      // Opt-in remediation: the same drifted boot with alignPublication=true
      // ALTERs the publication to the configured shape and says so.
      val w2 = scala.collection.mutable.ArrayBuffer.empty[String]
      GraftConnector.start(spark, cfg, new SnapshotJobStore.InMemory,
        exec, exec, warn = w2 += _, alignPublication = true)
      assert(w2.exists(_.startsWith("publication aligned")), s"got: $w2")
      val qs = server.queries.synchronized(server.queries.toVector)
      assert(qs.contains("""ALTER PUBLICATION "e2e_pub" ADD TABLE "public"."users""""))
      assert(qs.contains("""ALTER PUBLICATION "e2e_pub" DROP TABLE "public"."legacy""""))
      assert(qs.contains(
        """ALTER PUBLICATION "e2e_pub" SET (publish = 'insert, update, delete, truncate')"""))
    } finally server.close()
  }

  test("completed job resumes without re-snapshotting; snapshot_only returns no stream") {
    val server = new FakeWalsender(Seq.empty, sqlResults = { sql =>
      // resuming: slot EXISTS and is inactive
      if (sql.startsWith("SELECT slot_name"))
        Some((Seq("c"), Seq(Seq(Some("graft_slot"), Some("logical"), Some("f"), None,
          Some("0/8"), Some("0/10"), Some("reserved"), Some("0/100")))))
      else serve(sql)
    })
    try {
      val cfg = GraftConfig(
        host = "127.0.0.1", port = server.port, username = "u", database = "db",
        publication = Config("e2e_pub", Seq(PubTable("public", "users"))),
        slotName = "graft_slot")
      val exec = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None).executor
      val store = new SnapshotJobStore.InMemory
      store.save(graft.snapshot.SnapshotJob("graft_slot", "old-snap", 77L, completed = true))

      var sinkCalls = 0
      val boot = GraftConnector.start(spark, cfg, store, exec, exec,
        snapshotSink = (_, _) => sinkCalls += 1)
      assert(sinkCalls == 0, "completed job: no re-snapshot")
      assert(boot.startLsn.contains(77L), "stream resumes from the recorded job LSN")
      assert(boot.stream.isDefined)

      // snapshot_only coordinates on the dedicated snapshot-only key
      // (snapshot.id here), snapshots when no completed job exists, and
      // RESUMES (skips) on a restart with the same store.
      val snapOnly = cfg.copy(snapshot = graft.snapshot.SnapshotConfig(
        mode = "snapshot_only", chunkSize = 3L, id = Some("snap_only_slot")))
      assert(snapOnly.snapshotSlotName == "snap_only_slot",
        "snapshot.id names the snapshot-only job key")
      assert(cfg.copy(snapshot = graft.snapshot.SnapshotConfig(mode = "snapshot_only"))
        .snapshotSlotName == "snapshot_only_db",
        "without snapshot.id the key derives from the database name")
      val snapOnlyStore = new SnapshotJobStore.InMemory
      val snapOnlyExec: graft.snapshot.CatalogReader.SqlExecutor = { sql =>
        if (sql.startsWith("SELECT slot_name")) Nil // fresh slot
        else if (sql.startsWith("CREATE_REPLICATION_SLOT"))
          Seq(Seq("snap_only_slot", "0/20", "snap-2", "pgoutput"))
        else exec(sql)
      }
      val boot2 = GraftConnector.start(spark, snapOnly, snapOnlyStore,
        exec, snapOnlyExec, snapshotSink = (_, _) => sinkCalls += 1)
      assert(sinkCalls == 1)
      assert(boot2.stream.isEmpty, "snapshot_only runs no stream afterwards")
      // restart with the same store: completed job → resume, no rework
      GraftConnector.start(spark, snapOnly, snapOnlyStore,
        exec, snapOnlyExec, snapshotSink = (_, _) => sinkCalls += 1)
      assert(sinkCalls == 1, "restarted snapshot_only must not re-deliver")
      // resnapshot forces a fresh pass
      GraftConnector.start(spark,
        snapOnly.copy(snapshot = snapOnly.snapshot.copy(resnapshot = true)),
        snapOnlyStore, exec, snapOnlyExec,
        snapshotSink = (_, _) => sinkCalls += 1)
      assert(sinkCalls == 2, "resnapshot re-takes the snapshot-only pass")
    } finally server.close()
  }

  test("boot delivers an invalidated-then-retried snapshot into the lake without stale rows") {
    // Same invalidation shape as the sink-re-invocation test, but delivery
    // goes through LakeSink.connectorSnapshotSink: the winning export's
    // image must be the ONLY thing on the lake — the aborted attempt's
    // batches clear when the retry re-lands from the first table.
    val invalidations = new java.util.concurrent.atomic.AtomicInteger(1)
    val slotGen = new java.util.concurrent.atomic.AtomicInteger(0)
    val slotUp = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = new FakeWalsender(Seq.empty,
      sqlResults = { sql =>
        if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
          require(slotUp.compareAndSet(false, true), "CREATE on an existing slot")
          Some((Seq("s", "cp", "snap", "plugin"), Seq(Seq(
            Some("graft_slot"), Some("0/10"),
            Some(s"lake-snap-${slotGen.incrementAndGet()}"), Some("pgoutput")))))
        } else if (sql.startsWith("DROP_REPLICATION_SLOT")) {
          slotUp.set(false); Some((Seq("ok"), Nil))
        } else if (sql.startsWith("SELECT slot_name")) {
          if (slotUp.get())
            Some((Seq("c"), Seq(Seq(Some("graft_slot"), Some("logical"), Some("f"),
              None, Some("0/8"), Some("0/10"), Some("reserved"), Some("0/100")))))
          else Some((Seq("c"), Nil))
        } else serve(sql)
      },
      sqlErrors = { sql =>
        if (sql.startsWith("SELECT \"id\"") && invalidations.getAndDecrement() > 0)
          Some(("22023", "invalid snapshot identifier: \"lake-snap-1\""))
        else None
      })
    val lakeDir = java.nio.file.Files.createTempDirectory("lake-boot").toString
    try {
      val cfg = GraftConfig(
        host = "127.0.0.1", port = server.port, username = "u", database = "db",
        publication = Config("e2e_pub", Seq(PubTable("public", "users"))),
        slotName = "graft_slot",
        snapshot = graft.snapshot.SnapshotConfig(
          mode = "snapshot_only", chunkSize = 3L, id = Some("graft_slot")))
      val exec = new graft.pgproto.PgConnection(
        "127.0.0.1", server.port, "u", "db", None).executor
      val store = new SnapshotJobStore.InMemory
      val lake = new graft.sinks.LakeSink(lakeDir)

      GraftConnector.start(spark, cfg, store, exec, exec,
        snapshotSink = lake.connectorSnapshotSink(spark, "public.users", _ => Seq("id")),
        retrySleep = _ => ())

      // exactly one snapshot batch set on the lake: the winning export's
      val ids = lake.committedBatchIds(spark)
      assert(ids.nonEmpty && ids.forall(_ < 0), s"only snapshot batches expected: $ids")
      val state = lake.latestState(spark, "public", "users")
      import org.apache.spark.sql.functions.{col, element_at}
      val byId = state
        .select(element_at(col("after"), "id").cast("long"),
          element_at(col("after"), "name"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(byId == (1 to 6).map(i => i.toLong -> s"u$i").toMap,
        s"winning export's 6 rows, no stale attempt-1 rows: $byId")
    } finally {
      server.close()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(lakeDir))
    }
  }
}
