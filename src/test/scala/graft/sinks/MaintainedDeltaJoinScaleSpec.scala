package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** The OUTER delta join's 10k-row scale pin: one dimension-row delete
  * (a >0→0 match-count flip over a ~20-fact key) against 10,000 facts
  * over 550 join keys (50 of them unmatched — ~900 null-extended facts
  * resident) must rewrite DIRTY SLICES ONLY across every participating
  * log: the pair retraction, the one-key count decrement, and the
  * flip's null-extension land in a handful of slices while everything
  * else — including the ~900 PRE-EXISTING unmatched rows — carries by
  * manifest reference. Without the companion design, a preserved-side
  * null-extension recompute would be table-proportional (the exact
  * left-outer hot-key story the r18 verdict named).
  */
class MaintainedDeltaJoinScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(lsn: Long, op: String, table: String, keys: Seq[String],
      before: Map[String, String], after: Map[String, String]): Row =
    Row(lsn, lsn, 7L, op, "public", table, T, T, keys, before, after)

  private def fact(i: Int, jk: Int): Map[String, String] =
    Map("oid" -> s"o$i", "uid" -> s"u$jk", "amt" -> (i % 97).toString)
  private def dim(jk: Int): Map[String, String] =
    Map("id" -> s"u$jk", "name" -> s"n$jk")

  test("10k-fact left_outer: one dim-delete flip rewrites dirty slices, never the unmatched population") {
    val FACTS = 10000
    val KEYS = 550   // 0..499 have a dim row; 500..549 are unmatched
    val DIMS = 500
    val BUCKETS = 64
    val SUBS = 4
    val dir = Files.createTempDirectory("lake-djscale").toString
    try {
      val sink = new LakeSink(dir)
      val dj = new MaintainedDeltaJoin(sink,
        ("public", "o"), ("public", "u"),
        im => element_at(im, "uid"), im => element_at(im, "id"),
        "dj_scale", joinType = "left_outer",
        stateBuckets = BUCKETS, subBuckets = SUBS,
        rightKeyIsRowKey = true)
      sink.appendBatch(envelope(
        (0 until DIMS).map(j => ev(j.toLong, "insert", "u", Seq("id"),
          null, dim(j))) ++
          (0 until FACTS).map(i => ev(10000L + i, "insert", "o", Seq("oid"),
            null, fact(i, i % KEYS)))), 0L)
      assert(dj.refresh(spark, None) == 1)
      val unmatchedBefore = dj.read(spark).filter(col("right_after").isNull)
        .count()
      assert(unmatchedBefore > 800,
        s"fixture needs a large resident unmatched population, got $unmatchedBefore")

      // churn: ONE dim delete (key u7 flips >0→0 — its ~18 facts move
      // matched → null-extended) and one fact update under another key
      val moved = (0 until FACTS).count(_ % KEYS == 7)
      sink.appendBatch(envelope(Seq(
        ev(50000L, "delete", "u", Seq("id"), dim(7), null),
        ev(50001L, "update", "o", Seq("oid"), fact(9, 9), {
          val f = fact(9, 9); f + ("amt" -> "999")
        }))), 1L)
      assert(dj.refresh(spark, None) == 1)

      // correctness at scale: served == direct left join over latestState
      val o = sink.latestState(spark, "public", "o")
        .select(element_at(col("after"), "uid").as("jk"),
          element_at(col("after"), "oid").as("oid"))
      val u = sink.latestState(spark, "public", "u")
        .select(element_at(col("after"), "id").as("jk"))
      val wantRows = o.count()
      val wantUnmatched = o.join(u, Seq("jk"), "left_anti").count()
      val served = dj.read(spark)
      assert(served.count() == wantRows)
      assert(served.filter(col("right_after").isNull).count() == wantUnmatched)
      assert(wantUnmatched == unmatchedBefore + moved)

      // the write pin, per log: rows REWRITTEN by the churn version vs
      // rows carried by reference. The flip is ~18 rows; each dirty
      // slice drags along ~1/(BUCKETS×SUBS) of its log's population.
      val key = dj.latestKey(spark).get
      val vName = s"v${IntervalKeys.name(key)}"
      def written(sub: String, schema: org.apache.spark.sql.types.StructType)
          : (Long, Int, Int) = {
        val logDir = new org.apache.hadoop.fs.Path(dir,
          if (sub.isEmpty) "_graft_djoins/dj_scale"
          else s"_graft_djoins/dj_scale/$sub")
        val log = sub match {
          case "" => dj.stateLog
          case "_lnull" => dj.unmatchedLeftLog.get
          case _ => new BucketedStateLog(logDir, BUCKETS, Seq("jk"))
        }
        val f = log.fs(spark)
        val (w, c) = log.entries(f, key).partition(_._2.startsWith(vName))
        val rows =
          if (w.isEmpty) 0L
          else spark.read.schema(schema)
            .parquet(w.values.toSeq.map(r =>
              new org.apache.hadoop.fs.Path(logDir, r).toString): _*).count()
        (rows, w.size, c.size)
      }
      import org.apache.spark.sql.types._
      val mapT = MapType(StringType, StringType)
      val pairSchema = dj.stateSchema
      val lnullSchema = StructType(Seq(StructField("jk", StringType),
        StructField("lk", StringType), StructField("lh", StringType),
        StructField("left_after", mapT),
        StructField("n", LongType)))
      val countSchema = StructType(Seq(StructField("jk", StringType),
        StructField("n", LongType)))
      val (pw, pws, pcs) = written("", pairSchema)
      val (lw, lws, lcs) = written("_lnull", lnullSchema)
      val (cw, cws, ccs) = written("_rcounts", countSchema)
      info(s"written rows pairs=$pw($pws slices, $pcs carried) " +
        s"lnull=$lw($lws slices, $lcs carried) rcounts=$cw($cws, $ccs)")
      // pairs: the flip retracts ~18 pairs + 1 updated pair — dirty
      // slices only, never the 10k-pair state
      assert(pcs > 0 && pw > 0 && pw <= FACTS / 10,
        s"pair rewrite must be dirty-slice-bounded, wrote $pw of ~$FACTS")
      // unmatched: the ~18 flipped rows land beside slice-mates — NOT
      // the ~900-strong resident unmatched population
      assert(lcs > 0 && lw > 0 && lw <= unmatchedBefore / 4,
        s"null-extension rewrite must be flip-bounded, wrote $lw " +
          s"of $unmatchedBefore resident unmatched rows")
      // counts: one key decremented — one bucket of a ~500-row state
      assert(ccs > 0 && cw <= 2L * DIMS / BUCKETS + 2,
        s"count companion rewrite must be one-bucket-bounded, wrote $cw of ~$DIMS")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("10k-fact emission: a one-flip span's emitted batch is delta-sized; only the seed batch is state-sized") {
    val FACTS = 10000
    val KEYS = 500
    val dir = Files.createTempDirectory("lake-djescale").toString
    val outDir = Files.createTempDirectory("lake-djescale-out").toString
    try {
      val sink = new LakeSink(dir)
      val out = new LakeSink(outDir)
      val dj = new MaintainedDeltaJoin(sink,
        ("public", "o"), ("public", "u"),
        im => element_at(im, "uid"), im => element_at(im, "id"),
        "dj_escale", joinType = "left_outer",
        stateBuckets = 64, subBuckets = 4,
        rightKeyIsRowKey = true, emitTo = Some(out))
      sink.appendBatch(envelope(
        (0 until KEYS).map(j => ev(j.toLong, "insert", "u", Seq("id"),
          null, dim(j))) ++
          (0 until FACTS).map(i => ev(10000L + i, "insert", "o", Seq("oid"),
            null, fact(i, i % KEYS)))), 0L)
      assert(dj.refresh(spark, None) == 1)
      // the seed batch IS state-sized (truncate + the full output) —
      // that is the downstream's bootstrap, paid once
      val seedRows = out.changelog(spark)
        .filter(col("batch_id") === 0L).count()
      assert(seedRows >= FACTS,
        s"seed emission must carry the whole output, got $seedRows")

      // churn: ONE dim delete flips its ~20 facts, one fact updates
      val moved = (0 until FACTS).count(_ % KEYS == 7)
      sink.appendBatch(envelope(Seq(
        ev(50000L, "delete", "u", Seq("id"), dim(7), null),
        ev(50001L, "update", "o", Seq("oid"), fact(9, 9), {
          val f = fact(9, 9); f + ("amt" -> "999")
        }))), 1L)
      assert(dj.refresh(spark, None) == 1)
      // the churn span's batch carries ONLY the transitions: ~20 pair
      // deletes + ~20 null-extension inserts + the update's −old/+new —
      // never the 10k-row output (the whole point of composing through
      // the emitted changelog instead of re-reading the join state)
      val deltaRows = out.changelog(spark)
        .filter(col("batch_id") === 1L).count()
      info(s"emitted: seed=$seedRows delta=$deltaRows (flip moved $moved)")
      assert(deltaRows >= 2L * moved && deltaRows <= 2L * moved + 8,
        s"the emitted churn batch must be delta-sized (~${2 * moved}), " +
          s"got $deltaRows of a $FACTS-row output")
      // and a downstream aggregate maintained from those batches equals
      // a direct aggregate of the join's own served output
      val (es, et) = dj.emitTable
      val view = new MaintainedView(out,
        new graft.operators.IncrementalAgg(
          group = Seq("who" -> (i =>
            coalesce(element_at(i, "r.name"), lit("∅")))),
          sums = Seq("amt" -> (i => element_at(i, "l.amt").cast("long")))),
        es, et, "dj_escale_agg", stateBuckets = 16)
      assert(view.refresh(spark) > 0)
      val got = view.read(spark).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = dj.read(spark)
        .select(coalesce(element_at(col("right_after"), "name"), lit("∅"))
          .as("who"),
          element_at(col("left_after"), "amt").cast("long").as("amt"))
        .groupBy("who")
        .agg(count(lit(1)).as("n"), sum(col("amt")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, "downstream aggregate diverged at scale")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    }
  }
}
