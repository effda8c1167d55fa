package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Connected-components engine behind [[DedupQueries.dedupClusters]]: the
  * min-label-propagation fast path and the star-contraction fallback that
  * kicks in when a graph is deeper than the propagation round budget.
  */
class DedupComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)], propRounds: Int): Map[Long, Long] = {
    val df = DedupQueries.connectedComponents(
      pairs.toDF("src", "dst"), propRounds)
    val out = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.unpersist(blocking = true)
    out
  }

  test("propagation path: shallow graph converges within the round budget") {
    // Two components: a triangle {1,2,3} and an edge {10,11}.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
    val lbl = labelsOf(pairs, propRounds = 16)
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("star-contraction fallback: path graph far deeper than propRounds") {
    // A single path 0-1-2-...-200: diameter 200, propagation budget 2.
    // Min-label propagation would need ~200 rounds; the fallback must
    // resolve it in O(log n) star rounds and still label every vertex with
    // the component minimum (0).
    val n = 200L
    val pairs = (0L until n).map(i => (i, i + 1))
    val lbl = labelsOf(pairs, propRounds = 2)
    assert(lbl.keySet == (0L to n).toSet)
    assert(lbl.values.toSet == Set(0L), s"non-minimum labels: ${lbl.filter(_._2 != 0L)}")
  }

  test("fallback preserves component separation on a forest of deep paths") {
    // Two long paths with disjoint id ranges plus an isolated edge; labels
    // must be each component's minimum and never bleed across components.
    val p1 = (100L until 180L).map(i => (i + 1, i)) // reversed orientation
    val p2 = (500L until 560L).map(i => (i, i + 1))
    val pairs = p1 ++ p2 ++ Seq((900L, 901L))
    val lbl = labelsOf(pairs, propRounds = 3)
    assert((100L to 180L).forall(v => lbl(v) == 100L))
    assert((500L to 560L).forall(v => lbl(v) == 500L))
    assert(lbl(900L) == 900L && lbl(901L) == 900L)
    assert(lbl.size == 81 + 61 + 2)
  }
}
