package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.graftbridge.PlanBridge
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan shape for the round-8 text-analysis additions:
  * trigram-LM scoring, PII scan, Zipf slope. The oracle proves value
  * equality with DuckDB; these pin the properties the numbers must have
  * and the plans that keep them scale-safe.
  */
class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("lmScore: bits are positive, bounded by log2(corpus), and corpus model broadcasts") {
    val df = TextQueries.lmScore(spark, dir)
    df.collect() // materialize under AQE so the final plan is decided
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avg, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn > 0 && mn <= avg && avg <= mx,
        s"cross-entropy ordering violated for lang ${r.getString(0)}")
      // -log2(p) of the rarest possible trigram bounds the per-doc average.
      assert(mx < 64, "bits-per-trigram must be finite and sane")
    }
    val plan = PlanBridge.executedPlan(df).toString
    assert(plan.contains("BroadcastHashJoin"),
      s"corpus trigram model must broadcast, not shuffle:\n$plan")
  }

  test("piiScan: planted spans are found and counted per source") {
    import spark.implicits._
    // Semantics on a controlled frame (the parquet corpus has no planted
    // PII): route through the same projection the operator uses.
    val docs = Seq(
      ("s1", "contact a@b.example or c.d+x@e-f.org today"),
      ("s1", "id 1234567 and 987654321 end"),
      ("s2", "see https://ex.example/path and http://h.example x"),
      ("s2", "clean text only")).toDF("source", "text")
    // same patterns as the operator, via a temp view + the same expressions
    docs.createOrReplaceTempView("pii_probe")
    val got = spark.sql(
      """SELECT source,
           sum(regexp_count(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS emails,
           sum(regexp_count(text, '[0-9]{6,}')) AS digitruns,
           sum(regexp_count(text, 'https?://[^ ]+')) AS urls
         FROM pii_probe GROUP BY source ORDER BY source""").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(("s1", 2L, 2L, 0L), ("s2", 0L, 0L, 2L)))
    // operator output schema + rollup over the real corpus
    val out = TextQueries.piiScan(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "docs_with_email <= n_docs")
      assert(r.getLong(2) <= r.getLong(3), "docs_with <= total matches")
    }
  }

  test("zipfSlope: natural-ish corpus slopes are negative; raw text never shuffles") {
    val df = TextQueries.zipfSlope(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 100, "at most the top-100 ranks enter the fit")
      assert(r.getDouble(2) < 0,
        s"rank-frequency slope must be negative for lang ${r.getString(0)}")
    }
    val plan = PlanBridge.executedPlan(df).toString.split("== Initial Plan ==").head
    // the window runs on aggregated (lang, token) counts: the partial_count
    // must appear BELOW the first exchange (map-side combine of raw tokens)
    assert(plan.contains("partial_count"), s"token counting must map-side combine:\n$plan")
    // two-phase top-k: the FIRST window must key on the hash shard so no
    // partition ever sorts a whole language's vocabulary
    val firstWindow = plan.split("\n").find(_.contains("windowspecdefinition"))
    assert(firstWindow.isEmpty || plan.split("\n")
      .filter(_.contains("windowspecdefinition")).last.contains("shard"),
      s"per-shard top-k stage missing:\n$plan")
  }
}
