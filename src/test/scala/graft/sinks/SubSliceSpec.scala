package graft.sinks

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent
import graft.operators.IncrementalDistinct

/** Sub-sliced bucketed state (the WRITE-side hot-bucket bound): a
  * refcount state's hot group — a stop term's posting list, a dense IVF
  * cell — lives in ONE bucket, so every refresh touching it rewrote the
  * whole corpus-sized bucket. With `subBuckets > 1` the bucket's rows
  * split by a second hash over the VALUE, and a refresh reads and
  * rewrites only the dirty sub-slices. These specs pin: contents are
  * IDENTICAL to the unsliced state under churn; the rewrite and merge
  * input are sub-slice-bounded, with clean siblings carried by
  * reference; and gc at sub granularity keeps every referenced slice.
  */
class SubSliceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(
      lsn: Long, op: String,
      before: Map[String, String], after: Map[String, String]): Row =
    Row(lsn, lsn, 7L, op, "public", "users", T, T, Seq("id"), before, after)

  private def row(id: Long, grp: String, w: String): Map[String, String] =
    Map("id" -> id.toString, "grp" -> grp, "w" -> w)

  private def mkDist = new IncrementalDistinct(
    group = Seq("grp" -> (im => element_at(im, "grp"))),
    name = "w",
    value = im => element_at(im, "w"))

  private def entriesSet(md: MaintainedDistinct): Set[(String, String, Long)] =
    md.entries(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("sub-sliced state contents equal the unsliced state across churn") {
    val dir = Files.createTempDirectory("lake-sub-eq").toString
    try {
      val sink = new LakeSink(dir)
      val s1 = new MaintainedDistinct(sink, mkDist, "public", "users", "nd_s1",
        stateBuckets = 4)
      val s4 = new MaintainedDistinct(sink, mkDist, "public", "users", "nd_s4",
        stateBuckets = 4, subBuckets = 4)
      // seed: 6 groups × 5 values (some shared values refcount > 1)
      sink.appendBatch(envelope(
        (0L until 30L).map(i => ev(i + 1, "insert", null,
          row(i, s"g${i % 6}", s"w${i % 5}"))) ++
        (0L until 6L).map(i => ev(100 + i, "insert", null,
          row(1000 + i, s"g$i", "w0")))), 0L)
      assert(s1.refresh(spark) == 1 && s4.refresh(spark) == 1)
      assert(entriesSet(s1) == entriesSet(s4))
      // churn: delete one, update one value, insert a new value
      sink.appendBatch(envelope(Seq(
        ev(200, "delete", row(0, "g0", "w0"), null),
        ev(201, "update", row(7, "g1", "w2"), row(7, "g1", "w9")),
        ev(202, "insert", null, row(2000, "g3", "wX")))), 1L)
      assert(s1.refresh(spark) == 1 && s4.refresh(spark) == 1)
      val e1 = entriesSet(s1)
      assert(e1 == entriesSet(s4), "sub-sliced contents diverged under churn")
      assert(e1.exists(_._3 > 1L), "refcounts above 1 must survive slicing")
      // views agree too
      val v1 = s1.read(spark).collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap
      val v4 = s4.read(spark).collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap
      assert(v1 == v4 && v1.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("a hot bucket's refresh rewrites only its dirty sub-slices") {
    val dir = Files.createTempDirectory("lake-sub-hot").toString
    try {
      val sink = new LakeSink(dir)
      val HOT = 64
      val md = new MaintainedDistinct(sink, mkDist, "public", "users", "nd_hot",
        stateBuckets = 4, subBuckets = 8)
      // one HOT group with 64 distinct values — all in hash("hot")'s bucket
      sink.appendBatch(envelope(
        (0L until HOT.toLong).map(i =>
          ev(i + 1, "insert", null, row(i, "hot", s"w$i")))), 0L)
      assert(md.refresh(spark) == 1)
      // churn TWO values of the hot group
      sink.appendBatch(envelope(Seq(
        ev(500, "delete", row(3, "hot", "w3"), null),
        ev(501, "insert", null, row(9000, "hot", "w-new")))), 1L)
      assert(md.refresh(spark) == 1)
      // contents exact
      assert(md.read(spark).collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap == Map("hot" -> HOT.toLong))
      // the WRITE pin: the churn version's own slice dirs hold only the
      // dirty sub-slices' merged rows (≤ 2 subs of ~HOT/8 rows), the
      // clean siblings carried by reference from the seed version
      val states = new BucketedStateLog(
        new Path(sink.root, "_graft_views/nd_hot"), 4, mkDist.groupCols,
        8, Seq("v"))
      val f = states.fs(spark)
      val keys = states.committed(f)
      val churnKey = keys.last
      val refs = states.entries(f, churnKey)
      val vName = s"v${graft.sinks.IntervalKeys.name(churnKey)}"
      val (written, carried) = refs.partition(_._2.startsWith(vName))
      assert(carried.nonEmpty, "clean hot-bucket sub-slices must carry by reference")
      val writtenRows = written.values.toSeq match {
        case Nil => 0L
        case rels => spark.read.schema(mkDist.init(spark).schema)
          .parquet(rels.map(r => new Path(sink.root,
            s"_graft_views/nd_hot/$r").toString): _*).count()
      }
      // the MERGE-INPUT pin on the same construction refresh ran: dirty
      // slices' rows ≪ the whole touched bucket
      val d = mkDist.delta(envelope(Seq(
        ev(500, "delete", row(3, "hot", "w3"), null),
        ev(501, "insert", null, row(9000, "hot", "w-new")))))
      val dirty = d.select(
          states.bucketExpr(mkDist.groupCols.map(col)).as("b"),
          states.subExpr.as("s"))
        .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val seedKey = keys.head
      val restricted = states.readSlices(spark, seedKey, dirty,
        mkDist.init(spark).schema).count()
      val wholeBucket = states.readBuckets(spark, seedKey,
        Some(dirty.map(_._1)), mkDist.init(spark).schema).count()
      assert(wholeBucket == HOT, s"hot bucket should hold all rows: $wholeBucket")
      assert(restricted < wholeBucket / 2,
        s"merge input must be dirty-slice rows, got $restricted of $wholeBucket")
      // the rewrite is EXACTLY the merged dirty slices: their prior rows
      // minus the retracted value plus the inserted one (hash variance
      // in slice populations cancels out of an exact identity)
      assert(writtenRows == restricted,
        s"churn rewrite must be the merged dirty slices: wrote " +
          s"$writtenRows, dirty-slice input $restricted (bucket $wholeBucket)")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("changing subBuckets over committed state refuses; rebuild migrates the layout") {
    val dir = Files.createTempDirectory("lake-sub-geo").toString
    try {
      val sink = new LakeSink(dir)
      val s1 = new MaintainedDistinct(sink, mkDist, "public", "users", "nd_geo",
        stateBuckets = 4)
      sink.appendBatch(envelope((0L until 20L).map(i =>
        ev(i + 1, "insert", null, row(i, s"g${i % 3}", s"w$i")))), 0L)
      assert(s1.refresh(spark) == 1)
      sink.appendBatch(envelope(Seq(
        ev(100, "insert", null, row(100, "g0", "w-a")))), 1L)
      assert(s1.refresh(spark) == 1)
      // a second writer over the SAME unfingerprinted state dir with a
      // different sub geometry: its incremental commit would scramble
      // carried refs — refused before any write
      val s4 = new MaintainedDistinct(sink, mkDist, "public", "users", "nd_geo",
        stateBuckets = 4, subBuckets = 4)
      sink.appendBatch(envelope(Seq(
        ev(101, "insert", null, row(101, "g1", "w-b")))), 2L)
      val e = intercept[IllegalStateException] { s4.refresh(spark) }
      assert(e.getMessage.contains("geometry") ||
        e.getMessage.contains("subs"), e.getMessage)
      // the refusal left the cursor unadvanced and the state intact
      assert(s1.read(spark).collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap ==
        Map("g0" -> 8L, "g1" -> 7L, "g2" -> 6L))
      // a parameterless maintainer migrates by full re-seed: delete the
      // state dir (the lake cursor survives — it lives under the lake's
      // _graft_cursors, not here), and the next refresh re-seeds through
      // BASE as a full rewrite that stamps the new geometry
      val f = new Path(sink.root, "_graft_views/nd_geo")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.delete(new Path(sink.root, "_graft_views/nd_geo"), true)
      assert(s4.refresh(spark) == 1) // batch 2 applies via seed recompute
      assert(s4.read(spark).collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap ==
        Map("g0" -> 8L, "g1" -> 8L, "g2" -> 6L))
      // and the OLD geometry's writer now refuses the same way
      sink.appendBatch(envelope(Seq(
        ev(102, "insert", null, row(102, "g2", "w-c")))), 3L)
      intercept[IllegalStateException] { s1.refresh(spark) }
      // a READER under the wrong geometry refuses too (it would prune
      // point reads to the wrong slices) — fresh instance, marker 4:4
      val s16 = new MaintainedDistinct(sink, mkDist, "public", "users",
        "nd_geo", stateBuckets = 16, subBuckets = 4)
      intercept[IllegalStateException] { s16.read(spark) }
      // LOST-MARKER hazard: delete _geometry (the crashed-replace
      // window) — a subs=1 writer must NOT silently adopt the
      // sub-encoded manifests (legacy re-encoding would collapse
      // (b,s) keys and drop slices); the raw 'b:s' lines are the proof
      f.delete(new Path(sink.root, "_graft_views/nd_geo/_geometry"), false)
      val s1b = new MaintainedDistinct(sink, mkDist, "public", "users",
        "nd_geo", stateBuckets = 4)
      val lost = intercept[IllegalStateException] { s1b.refresh(spark) }
      assert(lost.getMessage.contains("marker is missing"), lost.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("gc at sub granularity keeps every referenced slice, sweeps the rest") {
    val dir = Files.createTempDirectory("lake-sub-gc").toString
    try {
      val sink = new LakeSink(dir)
      val md = new MaintainedDistinct(sink, mkDist, "public", "users", "nd_gc",
        stateBuckets = 2, subBuckets = 4)
      (0 until 5).foreach { b =>
        sink.appendBatch(envelope(
          (0L until 10L).map(i => ev(b * 100 + i + 1, "insert", null,
            row(b * 100 + i, "hot", s"w$b-$i")))), b.toLong)
        assert(md.refresh(spark) == 1)
      }
      assert(md.read(spark).collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap == Map("hot" -> 50L))
      // every slice dir on disk is referenced by a surviving manifest
      // (gc ran inside each refresh), and the latest read is intact
      val states = new BucketedStateLog(
        new Path(sink.root, "_graft_views/nd_gc"), 2, mkDist.groupCols,
        4, Seq("v"))
      val f = states.fs(spark)
      val keep = states.committed(f)
        .flatMap(k => states.entries(f, k).values).toSet
      val root = new Path(sink.root, "_graft_views/nd_gc")
      val onDisk = f.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
        .flatMap { vd =>
          f.listStatus(vd.getPath).toSeq
            .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
            .flatMap { bd =>
              f.listStatus(bd.getPath).toSeq
                .filter(st => st.isDirectory && st.getPath.getName.startsWith("sub="))
                .map(sd => s"${vd.getPath.getName}/${bd.getPath.getName}/" +
                  sd.getPath.getName)
            }
        }.toSet
      assert(onDisk.nonEmpty && onDisk.subsetOf(keep),
        s"unreferenced sub-slices survive gc: ${onDisk.diff(keep)}")
      assert(keep.filter(_.contains("/")).subsetOf(onDisk),
        s"referenced sub-slices missing from disk: ${keep.diff(onDisk)}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("a corrupted manifest line fails loud, naming the manifest, never a bare MatchError") {
    val dir = Files.createTempDirectory("lake-sub-corrupt").toString
    try {
      val sink = new LakeSink(dir)
      val md = new MaintainedDistinct(sink, mkDist, "public", "users", "nd_c",
        stateBuckets = 4)
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, row(1, "g", "w")))), 0L)
      assert(md.refresh(spark) == 1)
      // corrupt the committed manifest in place: each malformed shape —
      // a 'b:s:x' key, a non-numeric bucket, a path-less line — must
      // surface as the descriptive corrupted-manifest error
      val commits = new java.io.File(dir,
        "_graft_views/nd_c/_commits").listFiles()
        .filter(_.getName.startsWith("manifest."))
      assert(commits.length == 1)
      val orig = java.nio.file.Files.readAllBytes(commits.head.toPath)
      // drop the local FS checksum sidecar: the corruption must reach the
      // PARSER (the code under test), not Hadoop's crc check
      def dropCrc(): Unit = commits.head.getParentFile.listFiles()
        .filter(_.getName.endsWith(".crc")).foreach(_.delete())
      for (bad <- Seq("1:2:3\tx", "oops\tx", "justoneline")) {
        java.nio.file.Files.write(commits.head.toPath,
          (new String(orig, "UTF-8") + bad + "\n").getBytes("UTF-8"))
        dropCrc()
        val e = intercept[IllegalStateException] { md.entries(spark).count() }
        assert(e.getMessage.contains("corrupted state manifest") &&
          e.getMessage.contains(bad.takeWhile(_ != '\t')),
          s"for '$bad': ${e.getMessage}")
      }
      // restored manifest serves again
      java.nio.file.Files.write(commits.head.toPath, orig)
      dropCrc()
      assert(entriesSet(md) == Set(("g", "w", 1L)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
