package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent
import graft.operators.{IncrementalAgg, IncrementalDistinct}

/** The coherence barrier over independent maintainer cursors: bounded
  * polls deliver exactly the pinned interval and never absorb what they
  * exclude; [[Maintainer.refreshCoherent]] makes a group's applied batch
  * sets identical even when the writer lands a batch mid-barrier — the
  * torn-sides caveat [[HybridRetrieval]]'s scaladoc documents, closed.
  */
class CoherentRefreshSpec extends AnyFunSuite {
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

  private def row(id: String, grp: String, v: String): Map[String, String] =
    Map("id" -> id, "grp" -> grp, "v" -> v)

  private def mkAgg = new IncrementalAgg(
    group = Seq("grp" -> (im => element_at(im, "grp"))),
    sums = Seq("v" -> (im => element_at(im, "v").cast("double"))))

  private def mkDist = new IncrementalDistinct(
    group = Seq("grp" -> (im => element_at(im, "grp"))),
    name = "v",
    value = im => element_at(im, "v"))

  private def withLake(body: (LakeSink, MaintainedView, MaintainedDistinct) => Unit): Unit = {
    val dir = Files.createTempDirectory("lake-coh").toString
    try {
      val sink = new LakeSink(dir)
      body(sink,
        new MaintainedView(sink, mkAgg, "public", "users", "coh_view"),
        new MaintainedDistinct(sink, mkDist, "public", "users", "coh_nd"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  private def viewSum(mv: MaintainedView): Map[String, Double] =
    mv.read(spark).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap

  test("bounded poll applies only the pinned interval and never absorbs the excluded tail") {
    withLake { (sink, mv, _) =>
      sink.appendBatch(envelope(Seq(ev(1, "insert", null, row("1", "a", "1")))), 0L)
      sink.appendBatch(envelope(Seq(ev(2, "insert", null, row("2", "a", "2")))), 1L)
      val bound = sink.committedHull(spark)
      assert(bound == ((0L, 1L)), s"hull over batches 0,1: $bound")
      // the writer lands batch 2 AFTER the pin — the bounded refresh
      // must apply 0,1 and leave 2 untouched for a later refresh
      sink.appendBatch(envelope(Seq(ev(3, "insert", null, row("3", "a", "4")))), 2L)
      assert(mv.refresh(spark, Some(bound)) == 2)
      assert(viewSum(mv) == Map("a" -> 3d), "batch 2 excluded by the bound")
      assert(mv.latestKeyAny(spark).contains((0L, 1L)))
      // excluded-not-absorbed: the plain refresh still delivers batch 2
      assert(mv.refresh(spark) == 1)
      assert(viewSum(mv) == Map("a" -> 7d))
      // a bound the consumer has fully passed is a no-op, not an error
      assert(mv.refresh(spark, Some(bound)) == 0)
      // an inverted hull (empty lake convention) delivers nothing
      assert(mv.refresh(spark, Some((0L, Long.MinValue))) == 0)
    }
  }

  test("a bound below the consumer's undelivered backlog refuses instead of losing a batch") {
    withLake { (sink, mv, _) =>
      sink.appendBatch(envelope(Seq(ev(1, "insert", null, row("1", "a", "1")))), 0L)
      sink.appendBatch(envelope(Seq(ev(2, "insert", null, row("2", "a", "2")))), 1L)
      // virgin cursor, bound excluding committed batch 0: advancing to
      // [0,1] would mark 0 delivered without delivering it
      val e = intercept[IllegalArgumentException] {
        mv.refresh(spark, Some((1L, 1L)))
      }
      assert(e.getMessage.contains("committedHull"), e.getMessage)
      // nothing was applied or absorbed — the plain refresh delivers both
      assert(mv.refresh(spark) == 2)
      assert(viewSum(mv) == Map("a" -> 3d))
    }
  }

  test("refreshCoherent pins one bound across maintainers racing a writer") {
    withLake { (sink, mv, md) =>
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, row("1", "a", "1")),
        ev(2, "insert", null, row("2", "a", "2")))), 0L)
      sink.appendBatch(envelope(Seq(ev(3, "insert", null, row("3", "b", "5")))), 1L)
      // the torn shape, deterministically: pin the barrier's bound, let
      // one side refresh, land a batch, then the other side — WITHOUT
      // the bound the second side would be one span ahead
      val bound = sink.committedHull(spark)
      assert(mv.refresh(spark, Some(bound)) == 2)
      sink.appendBatch(envelope(Seq(ev(4, "insert", null, row("4", "a", "9")))), 2L)
      assert(md.refresh(spark, Some(bound)) == 2)
      assert(mv.latestKeyAny(spark) == md.latestKey(spark),
        "both sides pinned to the barrier's interval")
      assert(viewSum(mv) == Map("a" -> 3d, "b" -> 5d), "batch 2 outside the barrier")
      // the real one-call barrier: both catch up to a NEW pin together
      val next = Maintainer.refreshCoherent(spark, sink, mv, md)
      assert(next == ((0L, 2L)))
      assert(mv.latestKeyAny(spark).contains((0L, 2L)))
      assert(md.latestKey(spark).contains((0L, 2L)))
      assert(viewSum(mv) == Map("a" -> 12d, "b" -> 5d))
      // already-current members no-op under a repeated barrier
      assert(Maintainer.refreshCoherent(spark, sink, mv, md) == ((0L, 2L)))
      // two writers on one cursor/state dir — the same instance twice OR
      // a second instance constructed over the same lake + name — are
      // refused before any refresh starts (identity is the stateId, not
      // the object reference)
      intercept[IllegalArgumentException] {
        Maintainer.refreshCoherent(spark, sink, mv, mv)
      }
      val mv2 = new MaintainedView(sink, mkAgg, "public", "users", "coh_view")
      intercept[IllegalArgumentException] {
        Maintainer.refreshCoherent(spark, sink, mv, mv2)
      }
      // a standalone maintainer colliding with a COMPOSITE's derived
      // companion (a view named like the BM25 index's stats state) is
      // two concurrent writers on one companion dir — the disjointness
      // check covers every OWNED state id, not just the primaries
      val bm = new MaintainedBm25Index(sink, "public", "users", "coh_bm",
        idKey = "id", textKey = "grp")
      val clash = new MaintainedView(sink, mkAgg, "public", "users",
        "coh_bm_stats")
      val e = intercept[IllegalArgumentException] {
        Maintainer.refreshCoherent(spark, sink, bm, clash)
      }
      assert(e.getMessage.contains("companion"), e.getMessage)
    }
  }

  test("barriers racing a live writer never tear the group") {
    withLake { (sink, mv, md) =>
      // a real writer: batches land continuously while barriers run —
      // every barrier must still leave both sides on IDENTICAL applied
      // intervals (the deterministic test above pins the mechanism; this
      // pins it under actual concurrency)
      val rounds = 8
      val writer = new Thread(() => {
        var id = 0L
        while (id < 40) {
          sink.appendBatch(envelope(Seq(
            ev(id + 1, "insert", null,
              row(s"w$id", if (id % 2 == 0) "a" else "b", (id % 7).toString)))),
            id)
          id += 1
          Thread.sleep(5)
        }
      })
      writer.start()
      try {
        (1 to rounds).foreach { _ =>
          Maintainer.refreshCoherent(spark, sink, mv, md)
          val (vk, dk) = (mv.latestKeyAny(spark), md.latestKey(spark))
          assert(vk == dk, s"barrier left torn sides: view=$vk distinct=$dk")
          Thread.sleep(15)
        }
      } finally writer.join()
      // drain the tail and check both states equal a direct recompute
      Maintainer.refreshCoherent(spark, sink, mv, md)
      assert(mv.latestKeyAny(spark) == md.latestKey(spark))
      val sums = viewSum(mv)
      val nd = md.read(spark).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = (0L until 40L).groupBy(id => if (id % 2 == 0) "a" else "b")
      assert(sums == want.map { case (g, ids) =>
        g -> ids.map(id => (id % 7).toDouble).sum })
      assert(nd == want.map { case (g, ids) =>
        g -> ids.map(_ % 7).distinct.size.toLong })
    }
  }
}
