package graft.operators

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence check for the duplicate-passage scan: random
  * corpora from a tiny vocabulary (so 10-token spans genuinely repeat
  * across docs), with adversarial whitespace — runs of spaces/tabs/
  * newlines, leading/trailing blanks — and doc lengths straddling the
  * span width (shorter than 10 tokens, exactly 10, just over). A local
  * brute force over the SAME tokenization pins every per-source
  * aggregate, so any drift between Spark's `split`/`slice`/`array_join`
  * semantics and the intended segment math surfaces here rather than in
  * the fixed-corpus oracle.
  */
class SpanDedupPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val vocab = Vector("a", "b", "cc", "ddd")
  private val genWs: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
  private val genDoc: Gen[String] = for {
    n <- Gen.frequency(2 -> Gen.choose(0, 9), 1 -> Gen.const(10),
      3 -> Gen.choose(11, 35))
    toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    seps <- Gen.listOfN(math.max(n - 1, 0), genWs)
    lead <- Gen.oneOf("", " ", "\n")
    trail <- Gen.oneOf("", " ", "\t")
  } yield lead + toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString + trail

  private val genCorpus: Gen[List[(Long, String, String)]] =
    Gen.choose(1, 25).flatMap { n =>
      Gen.sequence[List[(Long, String, String)], (Long, String, String)](
        (0 until n).toList.map { i =>
          for {
            src <- Gen.oneOf("s0", "s1", "s2")
            doc <- genDoc
          } yield (i.toLong, src, doc)
        })
    }

  test("matches the brute-force reference on random whitespace-adversarial corpora") {
    val prop = Prop.forAll(genCorpus) { corpus =>
      val df = spark.createDataFrame(corpus).toDF("doc_id", "source", "text")
      val got = DedupQueries.spanDedupFrame(df)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      got == SpanBrute(corpus)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30).withInitialSeed(Seed(20260813L)),
      prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}
