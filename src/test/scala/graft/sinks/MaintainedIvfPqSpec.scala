package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** The PQ mode of the CDC-maintained IVF index: postings carry
  * deterministic codes, ADC shortlisting bounds the exact fetch to the
  * shortlist (the 100 TB read-cost claim), codebooks are part of the
  * fingerprint, and maintenance equals a from-scratch rebuild under
  * churn exactly as in plain-posting mode.
  */
class MaintainedIvfPqSpec extends AnyFunSuite {
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
    Row(lsn, lsn, 7L, op, "public", "vecs", T, T, Seq("id"), before, after)
  private def doc(id: String, emb: String): Map[String, String] =
    Map("id" -> id, "emb" -> emb)

  // 4-D embeddings; two well-separated centroids
  private val Cents = Seq(Seq(0f, 0f, 0f, 0f), Seq(10f, 10f, 10f, 10f))
  // 2 subspaces x width 2, 3 codewords each — chosen so directed
  // embeddings land on predictable codes
  private val Books: Seq[Seq[Seq[Float]]] = Seq(
    Seq(Seq(0f, 0f), Seq(5f, 5f), Seq(10f, 10f)),
    Seq(Seq(0f, 0f), Seq(5f, 5f), Seq(10f, 10f)))

  private def mkIndex(sink: LakeSink, name: String = "ivfpq",
      books: Seq[Seq[Seq[Float]]] = Books) =
    new MaintainedIvfIndex(sink, "public", "vecs", name,
      idKey = "id", embKey = "emb", centroids = Cents, stateBuckets = 8,
      pqBooks = Some(books))

  private def withIndex(body: (LakeSink, MaintainedIvfIndex, String) => Unit): Unit = {
    val dir = Files.createTempDirectory("lake-ivfpq").toString
    try {
      val sink = new LakeSink(dir)
      body(sink, mkIndex(sink), dir)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  /** (cell, id, code) of every posting — the full-state probe. */
  private def postings(ix: MaintainedIvfIndex): Set[(Int, String, String)] =
    ix.search(spark, Seq(0f, 0f, 0f, 0f), nprobe = Cents.size).collect()
      .map(r => (r.getInt(1), r.getString(0), r.getString(2))).toSet

  test("postings carry deterministic codes; edits move them, deletes retract them") {
    withIndex { (sink, ix, _) =>
      sink.appendBatch(envelope(Seq(
        // near (0,0,0,0): cell 0, subvectors near codeword 0 of each book
        ev(1, "insert", null, doc("a", "0.1,0.2,0.3,0.1")),
        // (10,10,4,6): cell 1 (closer to 10^4 overall), sub1 near
        // codeword 2 (10,10), sub2 (4,6) nearest codeword 1 (5,5)
        ev(2, "insert", null, doc("b", "10,10,4,6")))), 0L)
      assert(ix.refresh(spark) == 1)
      assert(postings(ix) == Set((0, "a", "0,0"), (1, "b", "2,1")))
      // an embedding edit moves cell AND code
      sink.appendBatch(envelope(Seq(
        ev(3, "update", doc("b", "10,10,4,6"), doc("b", "5,5,0,1")))), 1L)
      assert(ix.refresh(spark) == 1)
      assert(postings(ix) == Set((0, "a", "0,0"), (0, "b", "1,0")))
      // a delete retracts exactly its (cell, id, code) row
      sink.appendBatch(envelope(Seq(
        ev(4, "delete", doc("a", "0.1,0.2,0.3,0.1"), null))), 2L)
      assert(ix.refresh(spark) == 1)
      assert(postings(ix) == Set((0, "b", "1,0")))
      // a missing id contributes nothing (struct-of-nulls guard)
      sink.appendBatch(envelope(Seq(
        ev(5, "insert", null, Map("emb" -> "1,1,1,1")))), 3L)
      assert(ix.refresh(spark) == 1)
      assert(postings(ix) == Set((0, "b", "1,0")))
    }
  }

  test("ADC with a corpus-wide shortlist equals the exact searchTopK; a tight shortlist bounds the exact fetch") {
    withIndex { (sink, ix, _) =>
      // 12 docs in cell 0. Doc "trap" is the TRUE nearest to the query
      // (at the origin) but each of its sub-vectors (2.6, 2.6) sits just
      // past the (0,0)/(5,5) Voronoi bisector (x1+x2 = 5), so it
      // quantizes to codeword 1 — ADC 2·‖(5,5)‖² = 100. The d* docs'
      // sub-vectors (4.5+, 0) stay inside codeword 0's cell (sum < 5) —
      // ADC 0 — while being truly FARTHER (2·4.5² ≈ 40.5 vs trap's
      // 4·2.6² ≈ 27.04 total).
      val rows = (0 until 11).map { i =>
        val x = 4.5 + i * 0.02
        ev(i + 1L, "insert", null, doc(f"d$i%02d", s"$x,0,$x,0"))
      } :+ ev(50, "insert", null, doc("trap", "2.6,2.6,2.6,2.6"))
      sink.appendBatch(envelope(rows), 0L)
      assert(ix.refresh(spark) == 1)
      val q = Seq(0f, 0f, 0f, 0f)
      val exact = ix.searchTopK(spark, q, nprobe = 1, k = 3).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(exact.head._1 == "trap", s"true nearest must be trap: $exact")
      // shortlist covering the whole cell: ADC == exact, score for score
      val full = ix.searchTopKAdc(spark, q, nprobe = 1, k = 3, shortlist = 12)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(full == exact, s"full-shortlist ADC must equal exact: $full vs $exact")
      // tight shortlist: ADC leaves trap outside a shortlist of 3 — the
      // output PROVES the exact fetch touched only the shortlist (had it
      // fetched all candidates, trap would win the re-rank). This is the
      // documented recall/cost dial, and the bounded-fetch pin.
      val tight = ix.searchTopKAdc(spark, q, nprobe = 1, k = 3, shortlist = 3)
        .collect().map(_.getString(0)).toSeq
      assert(!tight.contains("trap"),
        s"ADC shortlist must exclude the badly-quantized doc: $tight")
      assert(tight == Seq("d00", "d01", "d02"),
        s"survivors re-rank exactly: $tight")
    }
  }

  test("trap doc quantization sanity: codes land where the ADC story says") {
    withIndex { (sink, ix, _) =>
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("trap", "2.6,2.6,2.6,2.6")),
        ev(2, "insert", null, doc("d00", "4.5,0,4.5,0")))), 0L)
      assert(ix.refresh(spark) == 1)
      val byId = postings(ix).map(p => p._2 -> p._3).toMap
      // (2.6,2.6): ‖x−(0,0)‖² = 13.52 > ‖x−(5,5)‖² = 11.52 → codeword 1.
      // (4.5,0):   ‖x−(0,0)‖² = 20.25 < ‖x−(5,5)‖² = 25.25 → codeword 0.
      assert(byId == Map("trap" -> "1,1", "d00" -> "0,0"), s"$byId")
    }
  }

  test("changed codebooks refuse every read and refresh; rebuild migrates; plain<->pq refuses both ways") {
    withIndex { (sink, ix, _) =>
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("a", "0.1,0.2,0.3,0.1")))), 0L)
      assert(ix.refresh(spark) == 1)
      // same shape, different content — content hash must differ
      val retrained = mkIndex(sink, books = Seq(
        Seq(Seq(0f, 0f), Seq(5f, 5f), Seq(9f, 9f)),
        Seq(Seq(0f, 0f), Seq(5f, 5f), Seq(10f, 10f))))
      intercept[IllegalStateException](retrained.refresh(spark))
      intercept[IllegalStateException](
        retrained.search(spark, Seq(0f, 0f, 0f, 0f), 1).collect())
      intercept[IllegalStateException](
        retrained.searchTopKAdc(spark, Seq(0f, 0f, 0f, 0f), 1, 1, 4))
      // a PLAIN-posting instance over the pq state refuses too
      val plain = new MaintainedIvfIndex(sink, "public", "vecs", "ivfpq",
        idKey = "id", embKey = "emb", centroids = Cents, stateBuckets = 8)
      intercept[IllegalStateException](plain.refresh(spark))
      // rebuild migrates to the retrained books; the original refuses
      retrained.rebuild(spark)
      assert(postings(retrained) == Set((0, "a", "0,0")))
      intercept[IllegalStateException](ix.refresh(spark))
      // maintenance continues incrementally under the successor
      sink.appendBatch(envelope(Seq(
        ev(2, "insert", null, doc("b", "10,10,10,10")))), 1L)
      assert(retrained.refresh(spark) == 1)
      assert(postings(retrained) == Set((0, "a", "0,0"), (1, "b", "2,2")))
    }
  }

  test("maintained pq postings equal a from-scratch rebuild after arbitrary churn") {
    val embs = Seq("0.5,0.5,0.5,0.5", "1.0,0.2,4.9,5.2", "10.2,9.7,10.1,9.9",
      "9.1,10.4,5.0,5.1", "4.8,5.2,0.1,0.2", "1.0")
    withIndex { (sink, ix, _) =>
      val rnd = new scala.util.Random(67L)
      val live = scala.collection.mutable.Map.empty[String, String]
      var lsn = 10L
      (0 until 6).foreach { batch =>
        val rows = (0 until 3).map { _ =>
          lsn += 1
          val id = s"v${rnd.nextInt(8)}"
          live.get(id) match {
            case Some(old) if rnd.nextInt(4) == 0 =>
              live.remove(id); ev(lsn, "delete", doc(id, old), null)
            case Some(old) =>
              val e = embs(rnd.nextInt(embs.size))
              live(id) = e; ev(lsn, "update", doc(id, old), doc(id, e))
            case None =>
              val e = embs(rnd.nextInt(embs.size))
              live(id) = e; ev(lsn, "insert", null, doc(id, e))
          }
        }
        sink.appendBatch(envelope(rows), batch.toLong)
        assert(ix.refresh(spark) == 1)
        val dir2 = Files.createTempDirectory("lake-ivfpq-rebuild").toString
        try {
          val sink2 = new LakeSink(dir2)
          val fresh = mkIndex(sink2)
          sink2.appendBatch(envelope(live.toSeq.zipWithIndex.map {
            case ((id, e), i) => ev(1000L + i, "insert", null, doc(id, e))
          }), 0L)
          fresh.refresh(spark)
          assert(postings(ix) == postings(fresh),
            s"batch $batch: maintained != rebuilt (live=$live)")
        } finally org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(dir2))
      }
    }
  }

  test("set ADC read equals the per-probe loop on a churned corpus") {
    withIndex { (sink, ix, _) =>
      sink.appendBatch(envelope((0 until 10).map { i =>
        val base = if (i % 2 == 0) 0.0 else 10.0
        ev(i + 1L, "insert", null,
          doc(s"v$i", s"${base + i * 0.1},${base},${base + 0.05 * i},${base}"))
      }), 0L)
      assert(ix.refresh(spark) == 1)
      // churn: move one, delete one
      sink.appendBatch(envelope(Seq(
        ev(20, "update", doc("v2", "0.2,0.0,0.1,0.0"), doc("v2", "9.9,10.0,10.1,10.0")),
        ev(21, "delete", doc("v3", "10.3,10.0,10.15,10.0"), null))), 1L)
      assert(ix.refresh(spark) == 1)
      val probes = Seq(
        "p0" -> "0.1,0.1,0.1,0.1",
        "p1" -> "10.0,10.0,10.0,10.0",
        "p2" -> "5.0,5.0,5.0,5.0",
        "pbad" -> "1,2") // mis-dimensioned: no output rows
      import spark.implicits._
      val pf = probes.toDF("pid", "payload")
      val got = ix.searchTopKAllAdc(spark, pf, "pid", "payload",
        nprobe = 2, k = 3, shortlist = 5).collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val want = probes.flatMap { case (p, q) =>
        val qs = q.split(",").map(_.toFloat).toSeq
        if (qs.size != 4) Seq.empty
        else ix.searchTopKAdc(spark, qs, nprobe = 2, k = 3, shortlist = 5)
          .collect().map(r => ((p, r.getString(0)), r.getDouble(1)))
      }.sortBy(_._1)
      assert(got.map(_._1) == want.map(_._1), s"$got vs $want")
      got.zip(want).foreach { case ((gk, gd), (_, wd)) =>
        assert(gd == wd, s"dist at $gk: $gd vs $wd")
      }
      assert(got.nonEmpty)
      assert(!got.exists(_._1._1 == "pbad"))
    }
  }

  test("trainCodebooksFromCorpus is deterministic and its books serve ADC searches") {
    withIndex { (sink, ix, _) =>
      // two tight clusters per subspace so trained codewords separate
      sink.appendBatch(envelope((0 until 8).map { i =>
        val a = if (i % 2 == 0) 0.0 else 10.0
        val b = if (i < 4) 0.0 else 10.0
        ev(i + 1L, "insert", null,
          doc(s"v$i", s"${a + i * 0.01},${a},${b},${b + i * 0.01}"))
      }), 0L)
      assert(ix.refresh(spark) == 1)
      val b1 = ix.trainCodebooksFromCorpus(spark, subspaces = 2, codewords = 2)
      val b2 = ix.trainCodebooksFromCorpus(spark, subspaces = 2, codewords = 2)
      assert(b1 == b2, "codebook training must be deterministic")
      assert(b1.size == 2 && b1.forall(_.head.size == 2))
      // a successor under the trained books: refuses until rebuilt, then
      // ADC search works with full recall on this separable corpus
      val trained = mkIndex(sink, books = b1)
      intercept[IllegalStateException](trained.refresh(spark))
      trained.rebuild(spark)
      val got = trained.searchTopKAdc(spark, Seq(0f, 0f, 0f, 0f),
        nprobe = 2, k = 2, shortlist = 8).collect().map(_.getString(0)).toSeq
      val exact = trained.searchTopK(spark, Seq(0f, 0f, 0f, 0f),
        nprobe = 2, k = 2).collect().map(_.getString(0)).toSeq
      assert(got == exact, s"trained-book ADC with full shortlist: $got vs $exact")
      // requires a divisible subspace count
      intercept[IllegalArgumentException](
        ix.trainCodebooksFromCorpus(spark, subspaces = 3, codewords = 2))
    }
  }

  test("codebook drift -> retrainCodebooksAndRebuild: reconstruction error drops, ADC serves, old refuses") {
    val dir = Files.createTempDirectory("lake-ivfpq-rt").toString
    try {
      val sink = new LakeSink(dir)
      // deliberately BAD books: every codeword far from every sub-vector
      val bad = mkIndex(sink, name = "pqrt", books = Seq(
        Seq(Seq(100f, 100f), Seq(120f, 100f)),
        Seq(Seq(100f, 100f), Seq(120f, 100f))))
      sink.appendBatch(envelope((0 until 8).map { i =>
        val a = if (i % 2 == 0) 0.0 else 10.0
        val b = if (i < 4) 0.0 else 10.0
        ev(i + 1L, "insert", null,
          doc(s"v$i", s"${a + i * 0.01},${a},${b},${b + i * 0.01}"))
      }), 0L)
      assert(bad.refresh(spark) == 1)
      val re0 = bad.pqReconstructionError(spark)
      assert(re0 > 10000, s"bad books must show large reconstruction error: $re0")
      val good = bad.retrainCodebooksAndRebuild(spark, subspaces = 2, codewords = 2)
      val re1 = good.pqReconstructionError(spark)
      assert(re1 < re0 / 100, s"retrained books must fit: $re1 vs $re0")
      // ADC under the new books finds the true neighbors (tight shortlist
      // works now — codes separate the clusters)
      val got = good.searchTopKAdc(spark, Seq(0f, 0f, 0f, 0f),
        nprobe = 2, k = 2, shortlist = 2).collect().map(_.getString(0)).toSeq
      val exact = good.searchTopK(spark, Seq(0f, 0f, 0f, 0f),
        nprobe = 2, k = 2).collect().map(_.getString(0)).toSeq
      assert(got == exact, s"separable corpus: tight ADC == exact: $got vs $exact")
      // the old instance refuses everything from the marker on
      intercept[IllegalStateException](bad.refresh(spark))
      intercept[IllegalStateException](bad.pqReconstructionError(spark))
      // centroids carried over unchanged: the centroid gauge still reads
      assert(good.quantizationError(spark) >= 0.0)
      // maintenance continues incrementally under the successor
      sink.appendBatch(envelope(Seq(
        ev(50, "insert", null, doc("v9", "0.05,0.0,0.05,0.0")))), 1L)
      assert(good.refresh(spark) == 1)
      // near-origin docs: v0 (dist 0), v2 (0.0008), then v9 (0.005)
      assert(good.searchTopKAdc(spark, Seq(0f, 0f, 0f, 0f), 2, 3, 8)
        .collect().map(_.getString(0)).toSeq == Seq("v0", "v2", "v9"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("shortlist/k/book validation fails loud") {
    withIndex { (sink, ix, _) =>
      intercept[IllegalArgumentException](
        ix.searchTopKAdc(spark, Seq(0f, 0f, 0f, 0f), 1, k = 4, shortlist = 3))
      intercept[IllegalArgumentException](
        ix.searchTopKAdc(spark, Seq(0f, 0f), 1, k = 1, shortlist = 4))
      // widths must sum to dim
      intercept[IllegalArgumentException](
        new MaintainedIvfIndex(sink, "public", "vecs", "bad",
          idKey = "id", embKey = "emb", centroids = Cents,
          pqBooks = Some(Seq(Seq(Seq(0f, 0f))))))
      // a plain index refuses the ADC reads outright
      val plain = new MaintainedIvfIndex(sink, "public", "vecs", "plain",
        idKey = "id", embKey = "emb", centroids = Cents)
      intercept[IllegalArgumentException](
        plain.searchTopKAdc(spark, Seq(0f, 0f, 0f, 0f), 1, 1, 4))
      import spark.implicits._
      intercept[IllegalArgumentException](
        plain.searchTopKAllAdc(spark, Seq(("p", "0,0,0,0")).toDF("i", "p"),
          "i", "p", 1, 1, 4))
    }
  }
}
