package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** [[HybridRetrieval]]: RRF fusion of the maintained BM25 and IVF set
  * reads — hand-computed fusion arithmetic on constructed rankings,
  * then end-to-end over churned maintained indexes with set == loop,
  * single-side degradation, and the ADC routing.
  */
class HybridRetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(lsn: Long, op: String,
      before: Map[String, String], after: Map[String, String]): Row =
    Row(lsn, lsn, 7L, op, "public", "docs", T, T, Seq("id"), before, after)

  private def frame(schema: Seq[(String, String)], rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      org.apache.spark.sql.types.StructType(schema.map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromDDL(t))
      }))

  private def lexFrame(rows: (String, String, Double)*): DataFrame =
    frame(Seq("probe_id" -> "string", "id" -> "string", "score" -> "double"),
      rows.map { case (p, d, s) => Row(p, d, s) })

  private def vecFrame(rows: (String, String, Double)*): DataFrame =
    frame(Seq("probe_id" -> "string", "id" -> "string", "dist" -> "double"),
      rows.map { case (p, d, s) => Row(p, d, s) })

  test("fuse: hand-computed RRF — a both-lists doc beats single-list rank-1 docs") {
    // probe p: lexically L1 > B > L2; by vector V1 > B > V2.
    // rrfK=60: B = 1/62+1/62 = 0.032258..; L1 = 1/61 = 0.016393..
    val lex = lexFrame(("p", "L1", 9.0), ("p", "B", 5.0), ("p", "L2", 1.0))
    val vec = vecFrame(("p", "V1", 0.1), ("p", "B", 0.5), ("p", "V2", 2.0))
    val got = HybridRetrieval.fuse(lex, vec, k = 10).collect()
      .map(r => (r.getString(1),
        (r.getDouble(2), Option(r.get(3)), Option(r.get(4)))))
      .toMap
    def rr(r: Int) = 1.0 / (60 + r)
    assert(got("B") == (rr(2) + rr(2), Some(2), Some(2)))
    assert(got("L1") == (rr(1), Some(1), None))
    assert(got("V1") == (rr(1), None, Some(1)))
    assert(got("L2") == (rr(3), Some(3), None))
    assert(got("V2") == (rr(3), None, Some(3)))
    // B's two mid ranks beat every single-list rank-1
    val order = HybridRetrieval.fuse(lex, vec, k = 10).collect()
      .sortBy(r => (-r.getDouble(2), r.getString(1))).map(_.getString(1))
    assert(order.head == "B", s"fused winner: ${order.toSeq}")
    // top-k cut + deterministic tie on id: L1/V1 tie at 1/61, L1 first
    val top3 = HybridRetrieval.fuse(lex, vec, k = 3).collect()
      .map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(top3.keySet == Set("B", "L1", "V1"), s"top3: $top3")
  }

  test("fuse: probes on one side only fuse as that list; empty inputs empty") {
    val lex = lexFrame(("only_lex", "a", 2.0), ("only_lex", "b", 1.0))
    val vec = vecFrame(("only_vec", "c", 0.3))
    val got = HybridRetrieval.fuse(lex, vec, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got == Map(
      ("only_lex", "a") -> 1.0 / 61, ("only_lex", "b") -> 1.0 / 62,
      ("only_vec", "c") -> 1.0 / 61))
    assert(HybridRetrieval.fuse(lexFrame(), vecFrame(), k = 5).count() == 0)
    intercept[IllegalArgumentException] {
      HybridRetrieval.fuse(lexFrame(), vecFrame(), k = 0)
    }
    intercept[IllegalArgumentException] {
      HybridRetrieval.fuse(lexFrame(), vecFrame(), k = 5, rrfK = 0)
    }
  }

  private def jacFrame(rows: (String, String, Double)*): DataFrame =
    frame(Seq("probe_id" -> "string", "id" -> "string", "jaccard" -> "double"),
      rows.map { case (p, d, s) => Row(p, d, s) })

  test("fuseAll: hand-computed 3-list RRF; two-list fuse is its special case") {
    // probe p — lex: L > B > C; vec: V > B; jac: C > B.
    // B: 1/62+1/62+1/62; C: 1/63+1/61; L/V: 1/61.
    val lex = lexFrame(("p", "L", 9.0), ("p", "B", 5.0), ("p", "C", 1.0))
    val vec = vecFrame(("p", "V", 0.1), ("p", "B", 0.5))
    val jac = jacFrame(("p", "C", 0.9), ("p", "B", 0.7))
    val got = HybridRetrieval.fuseAll(Seq(
        ("lex_rank", lex, col("score").desc),
        ("vec_rank", vec, col("dist").asc),
        ("jac_rank", jac, col("jaccard").desc)), k = 10).collect()
      .map(r => r.getString(1) ->
        ((r.getDouble(2), Option(r.get(3)), Option(r.get(4)),
          Option(r.get(5))))).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    assert(got("B") == ((rr(2) * 3, Some(2), Some(2), Some(2))))
    assert(got("C") == ((rr(3) + rr(1), Some(3), None, Some(1))))
    assert(got("L") == ((rr(1), Some(1), None, None)))
    assert(got("V") == ((rr(1), None, Some(1), None)))
    // three mid ranks beat two (B > C) beat one (L/V)
    assert(got("B")._1 > got("C")._1 && got("C")._1 > got("L")._1)
    // the two-list fuse IS fuseAll's special case, column for column
    val two = HybridRetrieval.fuse(lex, vec, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    val gen = HybridRetrieval.fuseAll(Seq(
        ("lex_rank", lex, col("score").desc),
        ("vec_rank", vec, col("dist").asc)), k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(two == gen, s"fuse vs fuseAll: $two vs $gen")
    intercept[IllegalArgumentException] {
      HybridRetrieval.fuseAll(Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] { // reserved / duplicate names
      HybridRetrieval.fuseAll(Seq(("rrf", lex, col("score").desc)), k = 3)
    }
    intercept[IllegalArgumentException] {
      HybridRetrieval.fuseAll(Seq(
        ("r1", lex, col("score").desc), ("r1", vec, col("dist").asc)), k = 3)
    }
  }

  test("fuseAll: a list with duplicate (probe, doc) rows contributes its best occurrence once") {
    // B appears twice lexically (9.0 and 2.0): only the 9.0 row ranks —
    // rank 1 for B, rank 2 for L (NOT rank 3: the duplicate must not
    // consume a rank slot), and B fuses once, never double-counted
    val lex = lexFrame(("p", "B", 9.0), ("p", "B", 2.0), ("p", "L", 5.0))
    val vec = vecFrame(("p", "B", 0.5))
    val got = HybridRetrieval.fuse(lex, vec, k = 10).collect()
      .map(r => r.getString(1) ->
        ((r.getDouble(2), Option(r.get(3)), Option(r.get(4))))).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    assert(got("B") == ((rr(1) + rr(1), Some(1), Some(1))))
    assert(got("L") == ((rr(2), Some(2), None)))
  }

  test("searchAll: hybrid winner needs both sides; set == per-probe loop; single-payload probes degrade") {
    val dir = Files.createTempDirectory("lake-hybrid").toString
    try {
      val sink = new LakeSink(dir)
      val bm = new MaintainedBm25Index(sink, "public", "docs", "hbm",
        idKey = "id", textKey = "text", stateBuckets = 8)
      val cents = Seq(Seq(0f, 0f), Seq(10f, 0f))
      val ivf = new MaintainedIvfIndex(sink, "public", "docs", "hivf",
        idKey = "id", embKey = "emb", centroids = cents, stateBuckets = 8)
      def doc(id: String, t: String, e: String) =
        Map("id" -> id, "text" -> t, "emb" -> e)
      // h1: mid lexically (one "apple"), nearest by vector.
      // l1: lexical rank 1 (apple-dense), far by vector.
      // v1: no query term at all, second-nearest by vector.
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("h1", "apple tree on the hill", "1,1")),
        ev(2, "insert", null, doc("l1", "apple apple apple apple pie", "9,1")),
        ev(3, "insert", null, doc("v1", "winter mountain trail", "2,0")),
        ev(4, "insert", null, doc("g1", "gone soon", "0,2")))), 0L)
      assert(bm.refresh(spark) == 1 && ivf.refresh(spark) == 1)
      // churn: g1 deleted, l1's embedding moves (still far from probe)
      sink.appendBatch(envelope(Seq(
        ev(5, "delete", doc("g1", "gone soon", "0,2"), null),
        ev(6, "update", doc("l1", "apple apple apple apple pie", "9,1"),
          doc("l1", "apple apple apple apple pie", "8,0")))), 1L)
      assert(bm.refresh(spark) == 1 && ivf.refresh(spark) == 1)
      val probes = frame(
        Seq("pid" -> "string", "q" -> "string", "e" -> "string"),
        Seq(Row("p", "apple", "0.6,0.6"),
          Row("p_lexonly", "apple pie", null),
          Row("p_veconly", "42 !!!", "7.5,0.5"),
          Row("p_none", null, null)))
      val got = HybridRetrieval.searchAll(spark, bm, ivf, probes,
        "pid", "q", "e", k = 3, kLex = 5, kVec = 5, nprobe = 2)
      val rows = got.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), Option(r.get(3)), Option(r.get(4)))).toMap
      // the hybrid winner: h1 is rank 2 lexically (l1's tf wins rank 1)
      // and rank 1 by vector — two ranks beat either single-side rank 1
      val pWin = rows.filter(_._1._1 == "p").maxBy(_._2._1)
      assert(pWin._1 == ("p", "h1"), s"hybrid winner: $rows")
      assert(pWin._2._2.nonEmpty && pWin._2._3.nonEmpty,
        "winner must carry both ranks")
      // single-payload probes rank on their live side only
      assert(rows.keySet.filter(_._1 == "p_lexonly").map(_._2).nonEmpty)
      assert(rows.filter(_._1._1 == "p_lexonly").values
        .forall { case (_, lx, vx) => lx.nonEmpty && vx.isEmpty })
      assert(rows.filter(_._1._1 == "p_veconly").values
        .forall { case (_, lx, vx) => lx.isEmpty && vx.nonEmpty })
      assert(!rows.keySet.exists(_._1 == "p_none"))
      // deleted doc never fuses
      assert(!rows.keySet.exists(_._2 == "g1"))
      // set == per-probe loop: fuse each probe's point reads and compare
      val want = Seq(
        ("p", Some("apple"), Some(Seq(0.6f, 0.6f))),
        ("p_lexonly", Some("apple pie"), None),
        ("p_veconly", Some("42 !!!"), Some(Seq(7.5f, 0.5f))),
        ("p_none", None, None)).flatMap { case (p, q, e) =>
        val lex = q.map(t => bm.search(spark, t, 5)
            .select(lit(p).as("probe_id"), col("id"), col("score")))
          .getOrElse(lexFrame())
        val vec = e.map(v => ivf.searchTopK(spark, v, nprobe = 2, k = 5)
            .select(lit(p).as("probe_id"), col("id"), col("dist")))
          .getOrElse(vecFrame())
        HybridRetrieval.fuse(lex, vec, k = 3).collect()
          .map(r => (r.getString(0), r.getString(1)) ->
            (r.getDouble(2), Option(r.get(3)), Option(r.get(4))))
      }.toMap
      assert(rows == want, s"set vs loop: $rows vs $want")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("searchAll: shortlist>0 routes the vector side through ADC — equal to exact at covering shortlist, refused without books") {
    val dir = Files.createTempDirectory("lake-hybridpq").toString
    try {
      val sink = new LakeSink(dir)
      val bm = new MaintainedBm25Index(sink, "public", "docs", "pbm",
        idKey = "id", textKey = "text", stateBuckets = 8)
      val cents = Seq(Seq(0f, 0f), Seq(10f, 0f))
      // one subspace per dim, codewords on the data values: ADC exactish
      val books = Seq(
        Seq(Seq(0f), Seq(1f), Seq(8f), Seq(9f)),
        Seq(Seq(0f), Seq(1f)))
      val plain = new MaintainedIvfIndex(sink, "public", "docs", "pivf",
        idKey = "id", embKey = "emb", centroids = cents, stateBuckets = 8)
      val pq = new MaintainedIvfIndex(sink, "public", "docs", "qivf",
        idKey = "id", embKey = "emb", centroids = cents, stateBuckets = 8,
        pqBooks = Some(books))
      def doc(id: String, t: String, e: String) =
        Map("id" -> id, "text" -> t, "emb" -> e)
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("a", "apple orchard", "1,1")),
        ev(2, "insert", null, doc("b", "apple pie recipe", "0,1")),
        ev(3, "insert", null, doc("c", "cherry grove", "9,0")))), 0L)
      assert(bm.refresh(spark) == 1)
      assert(plain.refresh(spark) == 1 && pq.refresh(spark) == 1)
      val probes = frame(
        Seq("pid" -> "string", "q" -> "string", "e" -> "string"),
        Seq(Row("p1", "apple", "0.5,0.9"), Row("p2", "cherry", "8.5,0.1")))
      def run(ix: MaintainedIvfIndex, sl: Int) =
        HybridRetrieval.searchAll(spark, bm, ix, probes, "pid", "q", "e",
          k = 3, kLex = 5, kVec = 3, nprobe = 2, shortlist = sl).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
          .toMap
      // covering shortlist: ADC fusion == exact fusion, score for score
      assert(run(pq, 3) == run(plain, 0))
      intercept[IllegalArgumentException] { run(plain, 3) } // no books
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("fuseAll end-to-end: the LSH exact-Jaccard leg as a third list over a churned corpus; set == loop") {
    val dir = Files.createTempDirectory("lake-hybrid3").toString
    try {
      val sink = new LakeSink(dir)
      val bm = new MaintainedBm25Index(sink, "public", "docs", "tbm",
        idKey = "id", textKey = "text", stateBuckets = 8)
      val ivf = new MaintainedIvfIndex(sink, "public", "docs", "tivf",
        idKey = "id", embKey = "emb",
        centroids = Seq(Seq(0f, 0f), Seq(10f, 0f)), stateBuckets = 8)
      val lsh = new MaintainedLshIndex(sink, "public", "docs", "tlsh",
        idKey = "id", textKey = "text", stateBuckets = 8)
      val textA = "the quick brown fox jumps over the lazy dog tonight"
      val textN = "the quick brown fox jumps over the lazy dog yesterday"
      def doc(id: String, t: String, e: String) =
        Map("id" -> id, "text" -> t, "emb" -> e)
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("a1", textA, "1,1")),
        ev(2, "insert", null, doc("n1", textN, "8,1")),
        ev(3, "insert", null, doc("g1", "gone soon entirely", "0,2")))), 0L)
      def refreshAll(): Unit =
        Seq(bm, ivf, lsh).foreach(m => assert(m.refresh(spark, None) == 1))
      refreshAll()
      // churn: g1 deleted, a fresh near-dup lands
      sink.appendBatch(envelope(Seq(
        ev(4, "delete", doc("g1", "gone soon entirely", "0,2"), null),
        ev(5, "insert", null, doc("a2", textA, "2,0")))), 1L)
      refreshAll()
      val probes = frame(
        Seq("pid" -> "string", "q" -> "string", "e" -> "string",
          "t" -> "string"),
        Seq(Row("p1", "quick dog", "0.5,0.5", textA),
          Row("p2", "yesterday", "7.5,0.5", textN)))
      def legs(p: DataFrame) = Seq(
        ("lex_rank", bm.searchAll(spark, p, "pid", "q", 5),
          col("score").desc),
        ("vec_rank", ivf.searchTopKAll(spark, p, "pid", "e", 2, 5),
          col("dist").asc),
        ("jac_rank", lsh.verifiedCandidatesForAll(spark, p, "pid", "t", 0.5)
          .select(col("probe_id"), col("id"), col("jaccard")),
          col("jaccard").desc))
      def toMapRows(df: DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getDouble(2), Option(r.get(3)), Option(r.get(4)),
            Option(r.get(5))))).toMap
      val set = toMapRows(HybridRetrieval.fuseAll(legs(probes), k = 4))
      // the third leg is load-bearing: some doc must carry a jac rank,
      // and the deleted doc never fuses
      assert(set.values.exists(_._4.nonEmpty), s"no jac ranks in $set")
      assert(!set.keySet.exists(_._2 == "g1"))
      // set == per-probe loop through the SAME three point/set reads
      val loop = probes.collect().flatMap { pr =>
        val one = frame(
          Seq("pid" -> "string", "q" -> "string", "e" -> "string",
            "t" -> "string"), Seq(pr))
        toMapRows(HybridRetrieval.fuseAll(legs(one), k = 4))
      }.toMap
      assert(set == loop, s"set vs loop: $set vs $loop")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("searchAllCoherent: torn sides come out fused over identical pinned intervals") {
    val dir = Files.createTempDirectory("lake-hybridc").toString
    try {
      val sink = new LakeSink(dir)
      val bm = new MaintainedBm25Index(sink, "public", "docs", "cbm",
        idKey = "id", textKey = "text", stateBuckets = 8)
      val ivf = new MaintainedIvfIndex(sink, "public", "docs", "civf",
        idKey = "id", embKey = "emb",
        centroids = Seq(Seq(0f, 0f), Seq(10f, 0f)), stateBuckets = 8)
      def doc(id: String, t: String, e: String) =
        Map("id" -> id, "text" -> t, "emb" -> e)
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("a", "apple orchard", "1,1")))), 0L)
      assert(bm.refresh(spark) == 1 && ivf.refresh(spark) == 1)
      // TEAR the sides: batch 1 lands and only the BM25 side applies it
      sink.appendBatch(envelope(Seq(
        ev(2, "insert", null, doc("b", "apple pie", "0,1")))), 1L)
      assert(bm.refresh(spark) == 1)
      val probes = frame(
        Seq("pid" -> "string", "q" -> "string", "e" -> "string"),
        Seq(Row("p", "apple pie", "0.2,0.9")))
      val (bound, fused) = HybridRetrieval.searchAllCoherent(spark, sink,
        bm, ivf, probes, "pid", "q", "e", k = 3, kLex = 5, kVec = 5,
        nprobe = 2)
      assert(bound == sink.committedHull(spark))
      val rows = fused.collect().map(r => r.getString(1) ->
        ((Option(r.get(3)), Option(r.get(4))))).toMap
      // the torn doc b now ranks on BOTH sides — the barrier drove the
      // lagging IVF cursor to the same pinned hull before the reads
      assert(rows("b")._1.nonEmpty && rows("b")._2.nonEmpty,
        s"doc b must carry both ranks after the barrier: $rows")
      assert(rows("a")._1.nonEmpty && rows("a")._2.nonEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
