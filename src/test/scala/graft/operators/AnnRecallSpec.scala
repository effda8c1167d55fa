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

  test("multi-probe LSH top-3 recall >= 90% of exact on sf0.1") {
    val exact = AnnQueries.annCosine(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = AnnQueries.annLsh(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    info(f"LSH top-3 recall vs exact: ${recall * 100}%.1f%% (${lsh.intersect(exact).size}/${exact.size})")
    assert(recall >= 0.90, f"multi-probe recall $recall%.3f below the 90%% bar")
  }
}
