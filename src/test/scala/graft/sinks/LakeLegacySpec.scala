package graft.sinks

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** On-disk state written by OLDER lake code must degrade CONSERVATIVELY,
  * never silently: a single-mark vacuum (no `_vacuumed_low`) reads as an
  * unknown low extent and refuses time travel into it; a one-sided legacy
  * manifest upgrades to a real fold floor at the next compaction; and
  * uncommitted legacy state-version debris can never shadow a committed
  * two-sided version.
  */
class LakeLegacySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val T = new java.sql.Timestamp(1700000000000L)

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private def ev(lsn: Long, op: String, key: String, v: String): Row =
    Row(lsn, lsn, 7L, op, "public", "t", T, T, Seq("id"),
      if (op == "delete") Map("id" -> key, "v" -> null) else null,
      if (op == "delete") null else Map("id" -> key, "v" -> v))

  private def withLake(body: (LakeSink, String) => Unit): Unit = {
    val dir = Files.createTempDirectory("lake-legacy").toString
    try body(new LakeSink(dir, baseBuckets = 4), dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("single-mark vacuum (no _vacuumed_low): unknown extent refuses, never folds holes") {
    withLake { (sink, dir) =>
      sink.appendBatch(envelope(Seq(ev(1, "insert", "1", "a"))), 0L)
      sink.appendBatch(envelope(Seq(ev(2, "insert", "2", "b"))), 1L)
      sink.compact(spark)
      sink.vacuum(spark)
      // simulate the PRE-LOW-MARK vacuum: high mark present, low mark gone
      val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.delete(new Path(dir, "_graft_commits/_vacuumed_low"), false)
      assert(sink.vacuumLowWater(spark) == Long.MinValue,
        "absent low mark next to a present high mark reads as unknown (MinValue)")
      // latest state still serves (BASE covers the vacuumed history)
      assert(sink.latestState(spark, "public", "t").count() == 2)
      sink.appendBatch(envelope(Seq(ev(3, "insert", "3", "c"))), 2L)
      sink.compact(spark) // manifests: v1 (wm=1) retained + v2 (wm=2)
      // time travel to the OLD anchor needs the negative-side check over an
      // unbounded unknown extent from the default floor — must REFUSE,
      // not silently return a fold with potential holes
      val e = intercept[IllegalStateException] {
        sink.stateAsOf(spark, "public", "t", asOf = 1L).collect()
      }
      assert(e.getMessage.contains("no longer retained"), e.getMessage)
      // a caught-up consumer whose floor sits above the unknown extent is
      // told to re-bootstrap rather than silently skipping a potentially
      // vacuumed snapshot batch beneath it
      java.nio.file.Files.createDirectories(
        new java.io.File(s"$dir/_graft_cursors").toPath)
      java.nio.file.Files.write(
        new java.io.File(s"$dir/_graft_cursors/legacyc").toPath, "0:5".getBytes)
      val e2 = intercept[IllegalStateException] {
        sink.poll(spark, "legacyc") { _ => () }
      }
      assert(e2.getMessage.contains("re-bootstrap") &&
        e2.getMessage.contains("low-water"), e2.getMessage)
      // the packaged re-bootstrap ESCAPES the refusal: seedCursor
      // acknowledges the unknown extent (it must NOT pin the floor at
      // MinValue — that would absorb every future snapshot batch), and a
      // snapshot batch landing after the seed still delivers
      val (negSeed, _) = sink.seedCursor(spark, "legacyc")
      assert(negSeed != Long.MinValue, "seed floor must stay finite")
      assert(sink.poll(spark, "legacyc") { _ => () } == 0, "caught up after seed")
      sink.appendBatch(envelope(Seq(ev(9, "insert", "s9", "snap"))), -1L)
      var sawSnap = false
      assert(sink.poll(spark, "legacyc") { df =>
        sawSnap = df.filter(col("batch_id") === -1L).count() == 1
      } == 1)
      assert(sawSnap, "a post-seed late snapshot batch must be delivered, not absorbed")
    }
  }

  test("a fresh bottom-era schema write supersedes stale pre-versioning root files") {
    import graft.pgproto.Messages.{Relation, RelationColumn}
    withLake { (sink, dir) =>
      import spark.implicits._
      // stale pre-versioning layout: rows directly under _graft_schema/
      Seq(("public", "t", 16384L, 100, 0, "id", 20L, -1, 1),
          ("public", "t", 16384L, 100, 1, "v", 25L, -1, 0))
        .toDF("namespace", "name", "oid", "replica_identity",
          "col_idx", "col_name", "type_oid", "type_modifier", "flags")
        .coalesce(1).write.parquet(s"$dir/_graft_schema")
      assert(sink.readRelation(spark, "public", "t").get
        .columns.map(_.name).toSeq == Seq("id", "v"))
      // a corrected write with the DEFAULT era must WIN the bottom-era
      // tie against the stale files, not be shadowed by them
      sink.writeRelations(spark, Seq(Relation(0L, 16384L, "public", "t", 'd',
        Array(RelationColumn("id", 20L, -1, 1),
          RelationColumn("v", 20L, -1, 0))))) // v re-typed int8
      val rel = sink.readRelation(spark, "public", "t").get
      assert(rel.columns.find(_.name == "v").get.typeOid == 20L,
        "fresh bottom-era write supersedes the legacy files")
    }
  }

  test("legacy one-sided manifest upgrades to a real fold floor at the next compact") {
    withLake { (sink, dir) =>
      sink.appendBatch(envelope(Seq(ev(1, "insert", "1", "a"))), 0L)
      sink.compact(spark)
      // rewrite the manifest header to the PRE-TWO-SIDED shape (no
      // minFolded field) — the reader treats it as minFolded = MinValue
      val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mp = new Path(dir, "_graft_commits/_base_manifest.1")
      val in = f.open(mp)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val lines = text.split("\n")
      val head = lines.head.split("\t") // wm \t buckets \t minFolded
      val legacy = (Seq(head(0) + "\t" + head(1)) ++ lines.tail).mkString("\n") + "\n"
      f.delete(mp, false)
      val out = f.create(mp, true)
      try out.write(legacy.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      assert(sink.foldedLow(spark) == Long.MinValue, "legacy manifest reads one-sided")
      // legacy semantics: everything <= wm reads as folded, so stateAsOf at
      // the watermark still serves with an EMPTY below-base requirement
      assert(sink.stateAsOf(spark, "public", "t", asOf = 0L).count() == 1)
      // the next compaction must upgrade the floor to the REAL minimum,
      // not propagate MinValue forever
      sink.appendBatch(envelope(Seq(ev(2, "insert", "2", "b"))), 1L)
      sink.compact(spark)
      assert(sink.foldedLow(spark) == 0L,
        s"compact upgrades the legacy floor, got ${sink.foldedLow(spark)}")
      assert(sink.latestState(spark, "public", "t").count() == 2)
      // and the upgraded manifest supports a LATE snapshot landing below it
      sink.appendBatch(envelope(Seq(ev(3, "insert", "s1", "snap"))), -1L)
      assert(sink.latestState(spark, "public", "t").count() == 3,
        "late snapshot below the upgraded floor lands and folds")
    }
  }

  test("uncommitted legacy state debris cannot shadow a committed two-sided version") {
    withLake { (_, dir) =>
      import spark.implicits._
      val log = new StateLog(new Path(dir, "_graft_views/v"))
      val f = log.fs(spark)
      // legacy crash debris: parquet landed under the old single-ended
      // name, NO marker
      Seq(("stale", 1L)).toDF("g", "n")
        .write.parquet(s"$dir/_graft_views/v/asof=5")
      // a committed TWO-SIDED version at the same hi
      log.commit(f, Seq(("fresh", 2L)).toDF("g", "n"), (0L, 5L))
      val got = log.read(spark, (0L, 5L)).collect().map(_.getString(0)).toSeq
      assert(got == Seq("fresh"),
        s"markerless legacy dir must not shadow the committed version: $got")
      // but a version ONLY committed under the legacy name still reads
      f.create(new Path(dir, "_graft_views/v/_commits/7"), true).close()
      Seq(("old", 3L)).toDF("g", "n")
        .write.parquet(s"$dir/_graft_views/v/asof=7")
      assert(log.isCommitted(f, (0L, 7L)))
      assert(log.read(spark, (0L, 7L)).collect().map(_.getString(0)).toSeq == Seq("old"))
    }
  }
}
