package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** The CDC-maintained BM25 index: tf postings stay exact for the CURRENT
  * corpus under insert/edit/delete churn, the bucket-pruned search ranks
  * by the reference formula, and everything matches an independent
  * in-test brute force after every batch.
  */
class MaintainedBm25IndexSpec extends AnyFunSuite {
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
  private def doc(id: String, text: String): Map[String, String] =
    Map("id" -> id, "text" -> text)

  private def mkIndex(sink: LakeSink) =
    new MaintainedBm25Index(sink, "public", "docs", "bm",
      idKey = "id", textKey = "text", stateBuckets = 8)

  /** Independent model: the same tokenizer and reference formula,
    * computed in plain Scala over the live corpus.
    */
  private def brute(corpus: Map[String, String], query: String,
      k1: Double = 1.2, b: Double = 0.75): Map[String, Double] = {
    def toks(s: String) =
      s.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val docs = corpus.map { case (id, t) => id -> toks(t) }
      .filter(_._2.nonEmpty)
    if (docs.isEmpty) return Map.empty
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val q = toks(query).distinct
    docs.flatMap { case (id, ts) =>
      val dl = ts.size.toDouble
      val score = q.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = docs.values.count(_.contains(t)).toDouble
          math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
            (tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)))
        }
      }.sum
      if (score > 0) Some(id -> score) else None
    }
  }

  private def got(ix: MaintainedBm25Index, q: String, k: Int = 10): Seq[(String, Double)] =
    ix.search(spark, q, k).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  private def assertSearch(ix: MaintainedBm25Index,
      corpus: Map[String, String], q: String): Unit = {
    val want = brute(corpus, q).toSeq
      .sortBy { case (id, s) => (-s, id) }
    val g = got(ix, q)
    assert(g.map(_._1) == want.map(_._1),
      s"ranking for '$q': got ${g.map(_._1)}, want ${want.map(_._1)}")
    g.zip(want).foreach { case ((_, gs), (_, ws)) =>
      assert(math.abs(gs - ws) < 1e-9, s"score for '$q': $gs vs $ws")
    }
  }

  test("postings are term frequencies; search matches an independent brute force") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      val ix = mkIndex(sink)
      val corpus = Map(
        "d1" -> "apple banana apple",
        "d2" -> "banana cherry",
        "d3" -> "apple cherry cherry date here",
        "d4" -> "Zebra! zebra?? ZEBRA")
      sink.appendBatch(envelope(corpus.toSeq.zipWithIndex.map {
        case ((id, t), i) => ev(i + 1L, "insert", null, doc(id, t))
      }), 0L)
      assert(ix.refresh(spark) == 1)
      // tf postings: rc IS the term frequency (tokenizer folds case/punct)
      val posts = ix.postings(spark).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(posts(("apple", "d1")) == 2L)
      assert(posts(("zebra", "d4")) == 3L)
      assert(posts(("cherry", "d3")) == 2L)
      assert(!posts.contains(("apple", "d2")))
      val (n, avgdl) = ix.corpusStats(spark)
      assert(n == 4L && math.abs(avgdl - (3 + 2 + 5 + 3) / 4.0) < 1e-12)
      assertSearch(ix, corpus, "apple cherry")
      assertSearch(ix, corpus, "banana")
      assertSearch(ix, corpus, "zebra date")
      // a term nowhere in the corpus contributes nothing, never errors
      assertSearch(ix, corpus, "apple nonexistent")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("churn: edits move tf, deletes retract, unchanged text telescopes; equals brute force after every batch") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      val ix = mkIndex(sink)
      var corpus = Map(
        "d1" -> "apple banana apple",
        "d2" -> "banana cherry",
        "d3" -> "apple cherry cherry date here")
      sink.appendBatch(envelope(corpus.toSeq.zipWithIndex.map {
        case ((id, t), i) => ev(i + 1L, "insert", null, doc(id, t))
      }), 0L)
      assert(ix.refresh(spark) == 1)
      // batch 1: d1 loses both apples (tf retraction), d3 deleted, d5 new
      sink.appendBatch(envelope(Seq(
        ev(10, "update", doc("d1", corpus("d1")), doc("d1", "banana banana")),
        ev(11, "delete", doc("d3", corpus("d3")), null),
        ev(12, "insert", null, doc("d5", "date apple")))), 1L)
      corpus = corpus - "d3" + ("d1" -> "banana banana") + ("d5" -> "date apple")
      assert(ix.refresh(spark) == 1)
      assertSearch(ix, corpus, "apple")
      assertSearch(ix, corpus, "banana date")
      // apple's only posting is now d5 with tf 1
      val posts = ix.postings(spark).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(posts.get(("apple", "d1")).isEmpty && posts(("apple", "d5")) == 1L)
      // batch 2: a text-UNCHANGED update must telescope to a zero-net
      // delta (and everything still equals brute force + a full rebuild)
      sink.appendBatch(envelope(Seq(
        ev(20, "update", doc("d2", corpus("d2")), doc("d2", corpus("d2"))))), 2L)
      assert(ix.refresh(spark) == 1)
      assertSearch(ix, corpus, "banana cherry")
      ix.assertConsistent(spark)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("seed after compact+vacuum indexes BASE-only documents") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      val ix = mkIndex(sink)
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("a", "apple banana")))), 0L)
      sink.compact(spark)
      sink.vacuum(spark) // batch 0's changelog gone; doc lives only in BASE
      sink.seedCursor(spark, "view_bm")
      sink.seedCursor(spark, "view_bm_stats")
      sink.seedCursor(spark, "view_bm_df")
      sink.appendBatch(envelope(Seq(
        ev(2, "insert", null, doc("b", "apple cherry")))), 1L)
      assert(ix.refresh(spark) == 1)
      val corpus = Map("a" -> "apple banana", "b" -> "apple cherry")
      assertSearch(ix, corpus, "apple banana")
      assert(ix.corpusStats(spark) == ((2L, 2.0)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("no-token queries, token-less docs, and the empty index are all safe") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      val ix = mkIndex(sink)
      // empty index: same (id, score) schema, zero rows
      val empty0 = ix.search(spark, "anything", 5)
      assert(empty0.isEmpty && empty0.columns.toSeq == Seq("id", "score"))
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("a", "apple banana")),
        ev(2, "insert", null, doc("z", "123 456 !!!")), // no alpha tokens
        ev(3, "insert", null, Map("id" -> "m")))), 0L)  // no text at all
      assert(ix.refresh(spark) == 1)
      // token-less docs contribute nothing — not even to N/avgdl
      assert(ix.corpusStats(spark) == ((1L, 2.0)))
      val empty1 = ix.search(spark, "42 --- 17", 5)
      assert(empty1.isEmpty && empty1.columns.toSeq == Seq("id", "score"))
      assert(got(ix, "apple").map(_._1) == Seq("a"))
      // churn across the token-less boundary: z gains tokens (N must
      // grow), the text-less m deletes (N must NOT shrink — it never
      // counted)
      sink.appendBatch(envelope(Seq(
        ev(4, "update", Map("id" -> "z", "text" -> "123 456 !!!"),
          doc("z", "apple apple")),
        ev(5, "delete", Map("id" -> "m"), null))), 1L)
      assert(ix.refresh(spark) == 1)
      assert(ix.corpusStats(spark) == ((2L, 2.0)))
      assertSearch(ix,
        Map("a" -> "apple banana", "z" -> "apple apple"), "apple")
      // and back: z loses its tokens again — pure stats retraction
      sink.appendBatch(envelope(Seq(
        ev(6, "update", doc("z", "apple apple"),
          Map("id" -> "z", "text" -> "9 9 9")))), 2L)
      assert(ix.refresh(spark) == 1)
      assert(ix.corpusStats(spark) == ((1L, 2.0)))
      assert(got(ix, "apple").map(_._1) == Seq("a"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("changed textKey refuses; composite rebuild migrates the stats view too") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      val ix = mkIndex(sink) // textKey = "text"
      // docs carry BOTH text columns, with different token lengths
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, Map("id" -> "a", "text" -> "apple banana",
          "body" -> "apple apple apple banana cherry")),
        ev(2, "insert", null, Map("id" -> "b", "text" -> "cherry",
          "body" -> "banana date")))), 0L)
      assert(ix.refresh(spark) == 1)
      assert(ix.corpusStats(spark) == ((2L, 1.5))) // "text" lengths 2, 1
      // reopen tokenizing the OTHER column: every read and refresh refuses
      val ix2 = new MaintainedBm25Index(sink, "public", "docs", "bm",
        idKey = "id", textKey = "body", stateBuckets = 8)
      intercept[IllegalStateException](ix2.refresh(spark))
      intercept[IllegalStateException](ix2.search(spark, "apple", 3))
      intercept[IllegalStateException](ix2.postings(spark))
      intercept[IllegalStateException](ix2.corpusStats(spark))
      // the composite migration re-derives BOTH the postings AND the
      // corpus stats from "body" — a postings-only rebuild would leave
      // N/avgdl silently computed from "text" (idf and length
      // normalization skewed on every subsequent search)
      ix2.rebuild(spark)
      assert(ix2.corpusStats(spark) == ((2L, 3.5))) // "body" lengths 5, 2
      val posts = ix2.postings(spark).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(posts(("apple", "a")) == 3L && posts(("date", "b")) == 1L)
      // the df view migrated inside the same marker window: df now
      // counts "body" vocabulary (apple df 1 though tf 3; banana df 2)
      val dfs2 = ix2.termDfs(spark).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dfs2 == Map("apple" -> 1L, "banana" -> 2L, "cherry" -> 1L,
        "date" -> 1L), s"df view must re-derive from body: $dfs2")
      val bodyCorpus = Map(
        "a" -> "apple apple apple banana cherry", "b" -> "banana date")
      assertSearch(ix2, bodyCorpus, "apple date")
      // incremental maintenance continues under the new key; the ORIGINAL
      // instance is now the mismatched one
      sink.appendBatch(envelope(Seq(
        ev(3, "insert", null, Map("id" -> "c", "body" -> "cherry cherry")))), 1L)
      assert(ix2.refresh(spark) == 1)
      assertSearch(ix2, bodyCorpus + ("c" -> "cherry cherry"), "cherry")
      intercept[IllegalStateException](ix.search(spark, "apple", 1))
      intercept[IllegalStateException](ix.corpusStats(spark))
      intercept[IllegalStateException](ix.termDfs(spark))
      // incremental df maintenance continued under the new key: c's
      // cherry joined the vocabulary
      assert(ix2.termDfs(spark).filter("term = 'cherry'").head().getLong(1) == 2L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("df view tracks document frequency under churn; dfCap drops a term EXACTLY like removing it from the query") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      val ix = mkIndex(sink)
      var corpus = Map(
        "d1" -> "the apple orchard the",   // "the" repeated: df 1, tf 2
        "d2" -> "the banana grove",
        "d3" -> "the cherry tree",
        "d4" -> "the date palm apple")
      sink.appendBatch(envelope(corpus.toSeq.zipWithIndex.map {
        case ((id, t), i) => ev(i + 1L, "insert", null, doc(id, t))
      }), 0L)
      assert(ix.refresh(spark) == 1)
      def dfs(): Map[String, Long] = ix.termDfs(spark).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // df counts DOCUMENTS, not occurrences: d1's repeated "the" is 1
      assert(dfs()("the") == 4L && dfs()("apple") == 2L && dfs()("cherry") == 1L)
      // Σ df over the view == distinct postings (the two states agree)
      assert(dfs().values.sum == ix.postings(spark).count())
      // capping at df ≤ 3 drops exactly "the"; scores equal the
      // stop-term-less query EXACTLY (the documented semantics)
      val capped = got3(ix, "the apple palm", dfCap = 3)
      val minus = got3(ix, "apple palm")
      assert(capped == minus,
        s"capped query must equal the query minus the capped term: $capped vs $minus")
      // the capped ranking is sane on its own: d4 matches both terms
      assert(capped.head._1 == "d4")
      // a query of ONLY capped terms returns empty, never errors
      val onlyStop = ix.search(spark, "the", 5, dfCap = 3)
      assert(onlyStop.isEmpty && onlyStop.columns.toSeq == Seq("id", "score"))
      // churn: d2 loses "the" and d4 (the+apple+palm) deletes — "the"
      // drops to df 2 (d1, d3), under the cap; d5 adds a new apple doc
      // so apple stays at df 2 (d1, d5)
      sink.appendBatch(envelope(Seq(
        ev(10, "update", doc("d2", corpus("d2")), doc("d2", "banana grove")),
        ev(11, "insert", null, doc("d5", "apple pie")),
        ev(12, "delete", doc("d4", corpus("d4")), null))), 1L)
      corpus = corpus - "d4" + ("d2" -> "banana grove") + ("d5" -> "apple pie")
      assert(ix.refresh(spark) == 1)
      assert(dfs()("the") == 2L && dfs()("apple") == 2L &&
        !dfs().contains("palm"))
      assert(dfs().values.sum == ix.postings(spark).count())
      // with "the" at df 2 ≤ cap, the capped search now INCLUDES it and
      // equals the uncapped search exactly
      assert(got3(ix, "the apple", dfCap = 3) == got3(ix, "the apple"))
      assertSearch(ix, corpus, "the apple")
      // pre-df-era state (upgrade path): with the df view state gone,
      // pruning is silently skipped — same answer at uncapped cost
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$dir/_graft_views/bm_df"))
      assert(got3(ix, "the apple", dfCap = 1) == got3(ix, "the apple"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  private def got3(ix: MaintainedBm25Index, q: String,
      dfCap: Long = Long.MaxValue): Seq[(String, Double)] =
    ix.search(spark, q, 10, dfCap).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

  test("constructor defaultDfCap: the NO-ARGUMENT search path is capped, per-call overrides win") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      // the scale posture: built with the cap, so a plain search(q, k)
      // is bounded — nobody has to remember the dial at every call site
      val ix = new MaintainedBm25Index(sink, "public", "docs", "bm",
        idKey = "id", textKey = "text", stateBuckets = 8,
        defaultDfCap = Some(3L))
      val corpus = Map(
        "d1" -> "the apple orchard", "d2" -> "the banana grove",
        "d3" -> "the cherry tree", "d4" -> "the date palm apple")
      sink.appendBatch(envelope(corpus.toSeq.zipWithIndex.map {
        case ((id, t), i) => ev(i + 1L, "insert", null, doc(id, t))
      }), 0L)
      assert(ix.refresh(spark) == 1)
      // "the" has df 4 > 3: the DEFAULT path must equal the explicit cap
      // (== the query minus the stop term, the documented semantics)
      def res(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
        df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val byDefault = res(ix.search(spark, "the apple palm", 10))
      assert(byDefault == res(ix.search(spark, "the apple palm", 10, 3L)))
      assert(byDefault == res(ix.search(spark, "apple palm", 10)))
      assert(byDefault.nonEmpty && byDefault.head._1 == "d4")
      // per-call override back to uncapped: "the" contributes again
      val uncapped = res(ix.search(spark, "the apple palm", 10,
        Long.MaxValue))
      assert(uncapped.size == 4 && uncapped != byDefault,
        s"explicit Long.MaxValue must force the uncapped read: $uncapped")
      // the set read inherits the same default
      val probes = spark.createDataFrame(Seq(("p1", "the apple palm")))
        .toDF("pid", "q")
      val set = ix.searchAll(spark, probes, "pid", "q", 10).collect()
        .map(r => (r.getString(1), r.getDouble(2))).toSeq
      assert(set == byDefault,
        s"searchAll must inherit defaultDfCap: $set vs $byDefault")
      // an invalid explicit cap still refuses loudly
      intercept[IllegalArgumentException](
        ix.search(spark, "apple", 10, 0L).collect())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("companion-ahead race: a batch landing between postings and companion refreshes must not empty the search") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      val ix = mkIndex(sink)
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("a", "apple banana")))), 0L)
      // simulate the race: postings apply batch 0, then batch 1 commits,
      // THEN the companions refresh — their only version covers (0, 1),
      // which lies OUTSIDE the postings' (0, 0) interval
      assert(ix.md.refresh(spark) == 1)
      sink.appendBatch(envelope(Seq(
        ev(2, "insert", null, doc("b", "apple cherry")))), 1L)
      ix.statsView.refresh(spark)
      ix.dfView.refresh(spark)
      // pinned-within finds nothing; the fallback serves the companions'
      // (slightly ahead) latest instead of emptying every result —
      // pre-fix this returned zero rows and termDfs an empty frame
      val hits = got(ix, "apple")
      assert(hits.map(_._1) == Seq("a"),
        s"search must serve from the ahead companions, got $hits")
      val dfs = ix.termDfs(spark).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(dfs("apple") == 2L, s"df view (ahead) must serve: $dfs")
      // the capped path must also survive the race (df gate reads the
      // ahead version, postings still at batch 0)
      assert(ix.search(spark, "apple", 10, dfCap = 5L).collect()
        .map(_.getString(0)).toSeq == Seq("a"))
      // convergence: the next full refresh realigns every cursor
      assert(ix.refresh(spark) == 1)
      assertSearch(ix,
        Map("a" -> "apple banana", "b" -> "apple cherry"), "apple cherry")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("length normalization: equal tf, shorter document scores higher") {
    val dir = Files.createTempDirectory("lake-bm25").toString
    try {
      val sink = new LakeSink(dir)
      val ix = mkIndex(sink)
      sink.appendBatch(envelope(Seq(
        ev(1, "insert", null, doc("short", "apple pie")),
        ev(2, "insert", null, doc("long",
          "apple pie with a very long tail of extra words about nothing")))), 0L)
      assert(ix.refresh(spark) == 1)
      val r = got(ix, "apple")
      assert(r.map(_._1) == Seq("short", "long"),
        s"b-normalization must favor the shorter doc at equal tf: $r")
      assert(r(0)._2 > r(1)._2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
