package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Recall of the LSH scale path against the exact brute-force baseline —
  * multi-probe (Hamming-1 neighbor buckets) must hold top-3 recall at or
  * above 90% on the sf0.1 corpus.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.1"

  private def topPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe LSH top-3 recall >= 90% of exact on sf0.1") {
    val exact = topPairs(AnnQueries.annCosine(spark, dir))
    val lsh = topPairs(AnnQueries.annLsh(spark, dir))
    assert(exact.nonEmpty)
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    info(f"LSH top-3 recall vs exact: ${recall * 100}%.1f%% (${lsh.intersect(exact).size}/${exact.size})")
    assert(recall >= 0.90, f"multi-probe recall $recall%.3f below the 90%% bar")
  }

  test("IVF recall is measured and documented (index-structure demo, untrained quantizer)") {
    // Honest floor, not a quality bar: with deterministic SAMPLE vectors as
    // centroids (no k-means training — an iterative trainer can't be
    // mirrored in the one-shot SQL oracle) and NProbe=2 of ~20 cells on
    // this weakly-clustered corpus, top-3 recall measures ≈29%. The IVF
    // query demonstrates the real index structure (assignment, cell
    // probing, candidate-only scoring); LSH multi-probe is the high-recall
    // path here, and a production deployment swaps in trained centroids
    // without changing the plan.
    val exact = topPairs(AnnQueries.annCosine(spark, dir))
    val ivf = topPairs(AnnQueries.annIvf(spark, dir))
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    info(f"IVF top-3 recall vs exact: ${recall * 100}%.1f%% (${ivf.intersect(exact).size}/${exact.size})")
    assert(recall >= 0.25, f"IVF recall $recall%.3f fell below its measured baseline")
  }
}
