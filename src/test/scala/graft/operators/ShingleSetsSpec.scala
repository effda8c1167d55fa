package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Cache lifecycle of the shared shingle scan: memoized while in use,
  * releasable so a long-lived session doesn't accumulate corpus-sized
  * cached frames per (dir, n).
  */
class ShingleSetsSpec extends AnyFunSuite {
  // The memo is keyed by SparkSession identity, and sibling suites running in
  // parallel hold their own shingle caches on the shared session — counting
  // that global state races. A private newSession() (same SparkContext,
  // distinct session object) makes every cachedCount assertion see only this
  // spec's entries.
  lazy val spark = SparkTestBase.spark.newSession()
  val dir = "/root/testdata/sf0.001"

  test("release(dir) unpersists and forgets; a later apply rebuilds") {
    val df = ShingleSets(spark, dir, 5)
    val n = df.count()
    assert(n > 0)
    assert(ShingleSets.cachedCount(spark) >= 1)
    assert(df.storageLevel.useMemory, "frame must be persisted while cached")

    ShingleSets.release(spark, dir)
    assert(ShingleSets.cachedCount(spark) == 0)
    assert(!df.storageLevel.useMemory, "release must unpersist the frame")

    // Rebuild works and memoizes again; releaseAll clears it.
    assert(ShingleSets(spark, dir, 5).count() == n)
    assert(ShingleSets.cachedCount(spark) == 1)
    ShingleSets.releaseAll(spark)
    assert(ShingleSets.cachedCount(spark) == 0)
  }
}
