package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable face of the lake sink: snapshot + CDC landed as one parquet
  * changelog, folded, compacted, vacuumed, and read back typed.
  *
  * Usage: LakeDemo <wal-file> [lakeDir]
  *
  * Drives the full lifecycle against a WalGen frame file: a synthetic
  * 3-row `public.users` snapshot at the consistent point, the WAL's
  * inserts as stream batches via foreachBatch, then latestState before
  * and after compact+vacuum (must agree), and the typed read through the
  * persisted relation schema.
  */
object LakeDemo {
  def main(args: Array[String]): Unit = {
    val walFile = args(0)
    val lakeDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("lake-demo").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("lake-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val lake = new graft.sinks.LakeSink(lakeDir)

    // Initial snapshot: ids -3..-1 so the WAL's 1..N inserts are disjoint.
    val snap = Seq((-3L, "snap3"), (-2L, "snap2"), (-1L, "snap1")).toDF("id", "name")
    lake.appendSnapshot("public.users", snap, Seq("id"), 100L, -1L)
    lake.writeRelations(spark, Seq(graft.pgproto.Messages.Relation(
      0L, WalGen.UsersRelOid, "public", "users", 'd', WalGen.UsersColumns.toArray)))

    // format-to-format pipeline: pgcdc source straight into the lake sink
    // (the foreachBatch(lake.appendBatch _) wiring works identically)
    val ckptDir = java.nio.file.Files.createTempDirectory("lake-demo-ckpt")
    val q = spark.readStream.format("pgcdc")
      .option("path", walFile)
      .load()
      .writeStream
      .format("graft-lake").option("path", lakeDir)
      .option("checkpointLocation", ckptDir.toString)
      .start()
    q.processAllAvailable()
    q.stop()
    org.apache.commons.io.FileUtils.deleteDirectory(ckptDir.toFile)

    // the graft-lake read format fronts the same log: stream the committed
    // changelog back out with Spark-managed offsets, then batch-read state
    var streamed = 0L
    val rq = spark.readStream.format("graft-lake")
      .option("path", lakeDir).option("tables", "public.users").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          _: Long) => streamed += df.count() }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    rq.awaitTermination(60000)
    val viaFormat = spark.read.format("graft-lake")
      .option("path", lakeDir).option("table", "public.users").load().count()
    println(s"-- graft-lake format: streamed $streamed events, " +
      s"batch state read $viaFormat rows")

    // maintained view: count + max(id) per table, refreshed from the
    // changelog through a durable cursor BEFORE compaction reshapes the log
    val idEx = (im: org.apache.spark.sql.Column) =>
      element_at(im, "id").cast("long")
    val mv = new graft.sinks.MaintainedView(
      lake,
      new graft.operators.IncrementalAgg(
        group = Seq("tbl" -> (_ => lit("users"))),
        sums = Seq("id" -> idEx), maxs = Seq("id" -> idEx)),
      "public", "users", "users_stats")
    val applied = mv.refresh(spark)
    val mvRow = mv.read(spark).collect().head
    println(s"-- maintained view: $applied batches applied, " +
      s"n=${mvRow.getLong(1)} max_id=${mvRow.getLong(3)}")

    // maintainer ops on /metrics: refresh duration, span batches/rows,
    // dirty groups, buckets rewritten vs carried — the graft_lake_* series
    // grafana/dashboard.json's maintainer panels plot
    val mListener = new graft.streaming.GraftMetricsListener
    val mServer = new graft.streaming.GraftMetricsServer(mListener, port = 0,
      lakeGauges = Some(() => lake.gauges(spark) ++ mv.gauges(spark)))
    val scraped = {
      val in = java.net.URI.create(
        s"http://localhost:${mServer.boundPort}/metrics").toURL.openStream()
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    mServer.close()
    val opsLines = scraped.linesIterator
      .filter(l => l.startsWith("graft_lake_view_") && !l.contains("users_stats_"))
      .toSeq
    println(s"-- maintainer ops series (${opsLines.size}):")
    opsLines.foreach(l => println(s"   $l"))

    // CDC-maintained LSH near-dup index: land a documents batch, index
    // it, point-probe it, then watch an edit retract its signatures
    val dT = new java.sql.Timestamp(0L)
    def docEv(lsn: Long, op: String, before: Map[String, String],
        after: Map[String, String]) =
      org.apache.spark.sql.Row(lsn, lsn, 7L, op, "public", "docs", dT, dT,
        Seq("id"), before, after)
    def d(id: String, text: String, emb: String = null) = {
      val base = Map("id" -> id, "text" -> text)
      if (emb == null) base else base + ("emb" -> emb)
    }
    val textA = "the quick brown fox jumps over the lazy dog tonight"
    lake.appendBatch(spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
        docEv(900, "insert", null, d("doc-1", textA, "0.5,0.5")),
        docEv(901, "insert", null, d("doc-2", textA, "9.8,10.1")),
        docEv(902, "insert", null,
          d("doc-3", "completely different words about winter mountain trails",
            "10.2,9.9")))).asJava),
      graft.cdc.ChangeEvent.schema), 100L)
    val lsh = new graft.sinks.MaintainedLshIndex(
      lake, "public", "docs", "demo_lsh", idKey = "id", textKey = "text")
    lsh.refresh(spark)
    val pairs0 = lsh.candidatePairs(spark).collect()
      .map(r => s"${r.getString(0)}~${r.getString(1)}").sorted.mkString(",")
    val probe = lsh.candidatesFor(spark, textA).collect()
      .map(r => s"${r.getString(0)}(${r.getInt(1)} bands)").sorted.mkString(",")
    // candidates FINISHED: exact Jaccard over the candidates' texts,
    // fetched via the key-restricted fold (verification read)
    val verified = lsh.verifiedPairs(spark, 0.9).collect()
      .map(r => f"${r.getString(0)}~${r.getString(1)}@${r.getDouble(2)}%.2f")
      .sorted.mkString(",")
    lake.appendBatch(spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
        docEv(903, "update", d("doc-2", textA, "9.8,10.1"),
          d("doc-2", "seven orange submarines quietly measure distant galactic harmonics",
            "9.8,10.1")))).asJava),
      graft.cdc.ChangeEvent.schema), 101L)
    lsh.refresh(spark)
    val pairs1 = lsh.candidatePairs(spark).count()
    println(s"-- maintained LSH index: pairs=[$pairs0] probe(textA)=[$probe] " +
      s"verified(0.9)=[$verified] after-edit pairs=$pairs1")
    // CDC-maintained IVF posting index over the same docs' embeddings:
    // nprobe-pruned candidate read + exact-distance top-k re-rank
    val ivf = new graft.sinks.MaintainedIvfIndex(
      lake, "public", "docs", "demo_ivf", idKey = "id", embKey = "emb",
      centroids = Seq(Seq(0f, 0f), Seq(10f, 10f)))
    ivf.refresh(spark)
    val cellsStr = ivf.cells(spark).collect()
      .map(r => s"${r.getInt(0)}:${r.getLong(1)}").sorted.mkString(",")
    val topk = ivf.searchTopK(spark, Seq(10f, 10f), nprobe = 1, k = 2)
      .collect().map(r => f"${r.getString(0)}@${r.getDouble(1)}%.2f")
      .mkString(",")
    println(s"-- maintained IVF index: cells=[$cellsStr] " +
      s"topk(10,10)=[$topk]")
    // the composed operating loop: drift gauge -> retrain from the
    // lake's current state -> crash-safe rebuild under the new
    // fingerprint; the OLD instance refuses from the marker on
    val qe0 = ivf.quantizationError(spark)
    val ivf2 = ivf.retrainAndRebuild(spark, kCells = 2)
    val qe1 = ivf2.quantizationError(spark)
    val oldRefuses =
      try { ivf.cells(spark); false }
      catch { case _: IllegalStateException => true }
    println(f"-- IVF retrain loop: qerr $qe0%.3f -> $qe1%.3f " +
      s"(old instance refuses=$oldRefuses)")
    // PQ mode: postings carry {id, code}; ADC ranks candidates from the
    // posting rows alone, and only the shortlist pays the exact fetch
    val pq = new graft.sinks.MaintainedIvfIndex(
      lake, "public", "docs", "demo_ivfpq", idKey = "id", embKey = "emb",
      centroids = Seq(Seq(0f, 0f), Seq(10f, 10f)),
      pqBooks = Some(Seq(Seq(Seq(0f), Seq(10f)), Seq(Seq(0f), Seq(10f)))))
    pq.refresh(spark)
    val adc = pq.searchTopKAdc(spark, Seq(10f, 10f), nprobe = 1, k = 2,
        shortlist = 2).collect()
      .map(r => f"${r.getString(0)}@${r.getDouble(1)}%.2f").mkString(",")
    println(f"-- IVF-PQ: recon=${pq.pqReconstructionError(spark)}%.3f " +
      s"adc-topk(10,10)=[$adc]")
    // CDC-maintained BM25 index over the same docs' texts: bucket-pruned
    // lexical retrieval (tf postings ARE the refcount state)
    // defaultDfCap is the production posture (MIGRATION.md: cap at ~N/2
    // so the NO-ARGUMENT search path is bounded); N here is 3 docs, so
    // cap 3 keeps every demo answer identical while routing the reads
    // through the df gate
    val bm = new graft.sinks.MaintainedBm25Index(
      lake, "public", "docs", "demo_bm25", idKey = "id", textKey = "text",
      defaultDfCap = Some(3L))
    bm.refresh(spark)
    val hits = bm.search(spark, "quick brown fox", 2).collect()
      .map(r => f"${r.getString(0)}@${r.getDouble(1)}%.3f").mkString(",")
    val (nd, avgdl) = bm.corpusStats(spark)
    println(f"-- maintained BM25 index: n=$nd avgdl=$avgdl%.1f " +
      s"search(quick brown fox)=[$hits]")
    // set-oriented probes: N queries against the maintained indexes in
    // ONE job apiece (the nightly-pipeline read)
    val qdf = spark.createDataFrame(Seq(
      ("q1", "quick brown fox"), ("q2", "galactic harmonics"))).toDF("pid", "q")
    val setHits = bm.searchAll(spark, qdf, "pid", "q", 1).collect()
      .map(r => s"${r.getString(0)}->${r.getString(1)}").sorted.mkString(",")
    val tdf = spark.createDataFrame(Seq(("pa", textA))).toDF("pid", "t")
    val setCands = lsh.candidatesForAll(spark, tdf, "pid", "t").collect()
      .map(r => s"${r.getString(0)}->${r.getString(1)}").sorted.mkString(",")
    println(s"-- set probes: bm25[$setHits] lsh[$setCands]")
    // hybrid retrieval: RRF fusion of the lexical (BM25) and vector
    // (IVF-PQ/ADC) set reads — rank-only fusion, no score calibration.
    // The coherence barrier first: both indexes driven to ONE pinned
    // bound, so the fused sides are batch-identical by construction
    val bound = graft.sinks.Maintainer.refreshCoherent(spark, lake, bm, pq)
    println(s"-- coherent refresh: bm25+ivfpq pinned to [${bound._1},${bound._2}]")
    val hdf = spark.createDataFrame(Seq(
      ("h1", "galactic harmonics", "9.9,10.0"))).toDF("pid", "q", "e")
    val hyb = graft.sinks.HybridRetrieval.searchAll(spark, bm, pq, hdf,
        "pid", "q", "e", k = 2, kLex = 3, kVec = 3, nprobe = 2,
        shortlist = 3).collect()
      .map(r => f"${r.getString(0)}->${r.getString(1)}@${r.getDouble(2)}%.4f")
      .sorted.mkString(",")
    println(s"-- hybrid RRF: [$hyb]")
    println(s"-- stateAsOf(snapshot batch) pre-vacuum: " +
      s"${lake.stateAsOf(spark, "public", "users", -1L).count()} rows")

    val before = lake.latestState(spark, "public", "users")
      .orderBy("k").collect().map(r => r.getString(0)).toSeq
    println(s"-- changelog: ${lake.changelog(spark).count()} events in " +
      s"batches ${lake.committedBatchIds(spark).mkString(",")}")
    lake.compact(spark)
    lake.vacuum(spark)
    val after = lake.latestState(spark, "public", "users")
      .orderBy("k").collect().map(r => r.getString(0)).toSeq
    println(s"-- latest state: ${before.size} live keys; " +
      s"compact+vacuum preserved=${before == after} " +
      s"(watermark ${lake.watermark(spark)})")
    val typed = lake.latestStateTyped(spark, "public", "users")
    typed.orderBy("id").show(8, truncate = false)
    println(s"-- typed read: ${typed.count()} rows, " +
      s"id is ${typed.schema("id").dataType.simpleString}")
    // time travel: the snapshot-only state (batch -1) is just the 3
    // synthetic rows, readable as long as vacuum hasn't passed it
    val asOfSnap =
      try lake.stateAsOf(spark, "public", "users", -1L).count().toString
      catch { case e: IllegalStateException => s"gone (${e.getMessage.take(40)}…)" }
    println(s"-- stateAsOf(snapshot batch): $asOfSnap")

    // signed-delta LEFT OUTER join over the post-vacuum lake (the seed
    // folds docs through BASE): docs ⟕ tags, with the match-count
    // companion flipping docs between matched and null-extended as tags
    // come and go — the delta-proportional outer maintenance
    def tagEv(lsn: Long, op: String, before: Map[String, String],
        after: Map[String, String]) =
      org.apache.spark.sql.Row(lsn, lsn, 7L, op, "public", "tags", dT, dT,
        Seq("doc"), before, after)
    def tag(doc: String, t: String) = Map("doc" -> doc, "tag" -> t)
    // … and EMIT the join's output delta as a changelog of its own, with
    // a downstream maintained aggregate consuming it — the composed
    // join → aggregate pipeline, churn-proportional end to end
    val djOut = new graft.sinks.LakeSink(
      java.nio.file.Files.createTempDirectory("lake-demo-djout").toString)
    val dj = new graft.sinks.MaintainedDeltaJoin(lake,
      ("public", "docs"), ("public", "tags"),
      im => org.apache.spark.sql.functions.element_at(im, "id"),
      im => org.apache.spark.sql.functions.element_at(im, "doc"),
      "demo_dj", joinType = "left_outer", stateBuckets = 4,
      emitTo = Some(djOut))
    val djAgg = new graft.sinks.MaintainedView(djOut,
      new graft.operators.IncrementalAgg(
        group = Seq("tag" -> (i => org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.element_at(i, "r.tag"),
          org.apache.spark.sql.functions.lit("∅")))),
        sums = Seq()),
      dj.emitTable._1, dj.emitTable._2, "demo_dj_agg", stateBuckets = 4)
    // a consumer born AFTER the vacuum re-bootstraps: seed its cursor at
    // the watermark (BEFORE new batches land — seeding absorbs anything
    // already committed) so the first refresh folds history through BASE
    lake.seedCursor(spark, "djoin_demo_dj")
    lake.appendBatch(spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
        tagEv(950, "insert", null, tag("doc-1", "fox")),
        tagEv(951, "insert", null, tag("doc-3", "winter")))).asJava),
      graft.cdc.ChangeEvent.schema), 200L)
    def djCounts(): (Long, Long) = {
      val rows = dj.read(spark).collect()
      (rows.count(!_.isNullAt(2)).toLong, rows.count(_.isNullAt(2)).toLong)
    }
    dj.refresh(spark)
    val (m1, u1) = djCounts()
    // delete doc-1's only tag: its match count flips >0 -> 0 and the doc
    // moves to the null-extended side
    lake.appendBatch(spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
        tagEv(960, "delete", tag("doc-1", "fox"), null))).asJava),
      graft.cdc.ChangeEvent.schema), 201L)
    dj.refresh(spark)
    val (m2, u2) = djCounts()
    println(s"-- delta join left_outer: matched=$m1 unmatched=$u1 -> " +
      s"after tag delete matched=$m2 unmatched=$u2")
    // the downstream aggregate caught up purely from the EMITTED deltas
    // (never re-reading the join state): doc-1's flip arrived as a pair
    // delete + a null-extension insert, moving it fox → ∅
    djAgg.refresh(spark)
    val composed = djAgg.read(spark).collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.mkString(",")
    println(s"-- composed join→aggregate over the emitted changelog " +
      s"(${djOut.committedBatchIds(spark).size} output batches): [$composed]")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(djOut.root))
    spark.stop()
  }
}
