package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pgproto.{Messages, MessageEncoder}
import graft.streaming.{InMemoryWalSource, PgCdcRelations, PgCdcTestHook}
import java.nio.file.Files

/** Capstone: the full library surface composed as a user would — a CDC
  * stream decoded to a typed table view through the live relation registry,
  * gated by the quality rules, and exported as a partitioned corpus that
  * reads back pruned. Every seam crossed here is public API.
  */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val DocsOid = 16700L
  private val Cols = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),     // int4
    Messages.RelationColumn("lang", 25L, -1, 0),   // text
    Messages.RelationColumn("body", 25L, -1, 0))   // text

  private def insertTxn(lsnBase: Long, t: Long, id: Long, lang: String,
      body: String): Seq[Array[Byte]] = Seq(
    MessageEncoder.xlogData(lsnBase, lsnBase, t,
      MessageEncoder.begin(lsnBase + 3, t, 800L + lsnBase)),
    MessageEncoder.xlogData(lsnBase + 1, lsnBase + 1, t,
      MessageEncoder.insert(DocsOid, Seq(Some(id.toString), Some(lang), Some(body)))),
    MessageEncoder.xlogData(lsnBase + 2, lsnBase + 2, t,
      MessageEncoder.commit(lsnBase + 2, lsnBase + 3, t)))

  test("startup control plane: publication create -> replica identities -> snapshot prepare, one config") {
    // The reference connector's boot sequence (connector.go: CreatePublication
    // → SetReplicaIdentities → prepareSnapshotAndSlot) driven end-to-end from
    // ONE GraftConfig over one scripted server — every call is public API.
    import graft.services.Publication._
    val issued = scala.collection.mutable.ArrayBuffer.empty[String]
    var slotExists = false
    val server: graft.snapshot.CatalogReader.SqlExecutor = { sql =>
      issued += sql
      if (sql.contains("pg_publication_tables")) Nil // publication missing
      else if (sql.contains("relreplident"))
        Seq(Seq("docs", "public", "d", null))
      else if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
        slotExists = true
        Seq(Seq("e2e_slot", "0/500", "00000003-A-1", "pgoutput"))
      } else if (sql.startsWith("SELECT slot_name") && slotExists)
        Seq(Seq("e2e_slot", "logical", "f", null, "0/80", "0/500", "reserved", "0/F00"))
      else Nil
    }
    val cfg = GraftConfig(
      host = "db", username = "u", password = "p", database = "d",
      publication = Config("e2e_pub", Seq(
        PubTable("public", "docs", replicaIdentity = ReplicaIdentity.Full))),
      slotName = "e2e_slot")

    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    val mgr = cfg.publicationManager(server, warnings += _)
    val live = mgr.create()
    assert(live.name == "e2e_pub" && warnings.isEmpty)
    assert(issued.exists(_.startsWith("CREATE PUBLICATION")))
    assert(mgr.setReplicaIdentities() ==
      Seq("""ALTER TABLE "public"."docs" REPLICA IDENTITY FULL"""))

    val store = new graft.snapshot.SnapshotJobStore.InMemory
    val slots = new graft.services.SlotManager(server, cfg.slotName)
    val rows = graft.snapshot.SnapshotOrchestrator.executeWithRetry(
      slots, store, cfg.slotName, sleep = _ => ()) { job =>
      assert(job.snapshotId == "00000003-A-1")
      Seq("snapshot-row")
    }
    assert(rows == Seq("snapshot-row"))
    graft.snapshot.SnapshotOrchestrator.complete(store, cfg.slotName)
    assert(graft.snapshot.SnapshotOrchestrator.streamStartLsn(store, cfg.slotName) ==
      graft.pgproto.Lsn.parse("0/500"),
      "the stream resumes from the winning export's consistent point")
  }

  test("CDC stream -> typed view -> quality gate -> partitioned corpus") {
    val t0 = 1700000000000000L
    val good = "the quick brown fox jumps over a lazy dog near the quiet river bank today"
    val short = "too short"
    val docs = Seq(
      (1L, "en", good), (2L, "en", short), (3L, "de", good + " again and again"),
      (4L, "en", good + " once more"), (5L, "de", short))
    val frames =
      MessageEncoder.xlogData(1, 1, t0,
        MessageEncoder.relation(DocsOid, "public", "docs", Cols)) +:
        docs.zipWithIndex.flatMap { case ((id, lang, body), i) =>
          insertTxn(6000L + i * 10L, t0 + i, id, lang, body) }

    PgCdcTestHook.register("e2e", new InMemoryWalSource(frames))
    PgCdcRelations.clear("e2e")
    val envelope = spark.readStream.format("pgcdc")
      .option("testSourceKey", "e2e")
      .option("relationRegistryKey", "e2e")
      .load()
    val q = envelope.writeStream.format("memory").queryName("e2e_env")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    // typed view through the live relation registry — no hand-built schema
    val views = PgCdcRelations.typedViews("e2e", spark.table("e2e_env"))
    assert(views.keySet == Set("public.docs"))
    val typed = views("public.docs").filter($"op" === "insert")
    assert(typed.schema("id").dataType.typeName == "integer")

    // quality gate: the word-count rule (>= 10 tokens here)
    val gated = typed
      .withColumn("n_toks", size(split($"body", "\\s+")))
      .filter($"n_toks" >= 10)
      .select($"id", $"lang", $"body")

    // deterministic split assignment rides the same projection a training
    // export would partitionBy on — seeded md5 nibble, no RNG state
    val nibble = conv(substring(md5(concat(lit("split-"), $"id".cast("string"))), 1, 15), 16, 10)
      .cast("long") % 16
    val withSplit = gated.withColumn("split",
      when(nibble >= 14, "test").when(nibble >= 12, "val").otherwise("train"))

    val out = Files.createTempDirectory("graft-e2e").toFile
    graft.operators.ScaleOps.writeCorpus(withSplit, out.getAbsolutePath,
      partitionCols = Seq("lang"), sortCols = Seq("id"), maxRecordsPerFile = 10)

    val back = spark.read.parquet(out.getAbsolutePath)
    assert(back.count() == 3) // docs 1, 3, 4 survive the gate
    assert(out.listFiles().map(_.getName).count(_.startsWith("lang=")) == 2)
    val en = spark.read.parquet(out.getAbsolutePath).filter($"lang" === "en")
      .select("id").as[Int].collect().sorted.toSeq
    assert(en == Seq(1, 4))
    // split column survives the round-trip and stays deterministic
    val splits = back.select("id", "split").as[(Int, String)].collect().toMap
    assert(splits.keySet == Set(1, 3, 4))
    assert(splits.values.forall(Set("train", "val", "test")),
      s"unexpected split values: $splits")
    val again = spark.read.parquet(out.getAbsolutePath)
      .select("id", "split").as[(Int, String)].collect().toMap
    assert(again == splits, "split membership must be re-run-stable")

    // curation over the pipeline's OWN output: the three surviving docs
    // share their first 15 tokens (the `good` sentence), so the first
    // 10-token span of each is a verbatim corpus-wide duplicate — the
    // passage-level signal doc hashing can't see, computed straight off
    // the exported corpus through the frame-based library entry.
    val spans = graft.operators.DedupQueries.spanDedupFrame(
        back.select($"id".cast("long").as("doc_id"),
          $"lang".as("source"), $"body".as("text")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(spans == Map("en" -> ((2L, 2L)), "de" -> ((1L, 1L))),
      s"duplicate-passage stats over the exported corpus: $spans")

    // final leg: bulk-deliver the curated corpus to a downstream pg over
    // COPY FROM STDIN — partition-parallel, server-confirmed counts
    val server = new graft.streaming.FakeWalsender(Seq.empty, sqlResults = { sql =>
      if (sql == "BEGIN" || sql == "COMMIT")
        Some((Seq("ok"), Seq.empty[Seq[Option[String]]]))
      else None
    })
    try {
      val n = graft.sinks.PgCopyLoader.load(
        back.select($"id", $"lang", $"split"), "public", "corpus",
        "127.0.0.1", server.port, "u", "db", None)
      assert(n == 3L, "every gated doc delivered")
      val ids = server.copiedRows.synchronized(
        server.copiedRows.map(_._2.head.get.toLong).sorted.toSeq)
      assert(ids == Seq(1L, 3L, 4L), s"delivered rows: $ids")
    } finally server.close()
  }
}
