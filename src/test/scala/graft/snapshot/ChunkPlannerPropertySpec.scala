package graft.snapshot

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The partition invariant behind every chunked snapshot: for ANY pk range
  * and chunk size, the integer_range predicates must assign every key in
  * [min, max] to EXACTLY one chunk — a gap loses rows silently, an overlap
  * duplicates them, and both break the snapshot→CDC exactly-once handoff.
  * Pinned over random ranges including negative spans, full-Long extremes,
  * and chunk sizes from 1 up.
  */
class ChunkPlannerPropertySpec extends AnyFunSuite {

  /** Parse the planner's own predicate shape back into an interval test. */
  private def member(pred: String, k: Long): Boolean = {
    val closed = raw"(\w+) >= (-?\d+) AND \1 <= (-?\d+)".r
    val halfOpen = raw"(\w+) >= (-?\d+) AND \1 < (-?\d+)".r
    pred match {
      case "1 = 0" => false
      case closed(_, lo, hi) => k >= lo.toLong && k <= hi.toLong
      case halfOpen(_, lo, hi) => k >= lo.toLong && k < hi.toLong
      case other => fail(s"unexpected predicate shape: $other")
    }
  }

  test("integer_range chunks partition [min, max] exactly — no gap, no overlap") {
    val gen = for {
      min <- Gen.chooseNum(-100000L, 100000L)
      span <- Gen.chooseNum(0L, 5000L)
      chunk <- Gen.chooseNum(1L, 700L)
      probes <- Gen.listOfN(12, Gen.chooseNum(0L, span))
    } yield (min, min + span, chunk, probes)
    val prop = Prop.forAll(gen) { case (min, max, chunk, probes) =>
      val chunks = ChunkPlanner.integerRange("id", min, max, chunk)
      val points = (probes.map(min + _) ++ Seq(min, max, min + (max - min) / 2)).distinct
      val exact = points.forall { k =>
        chunks.count(c => member(c.predicate.get, k)) == 1
      }
      // keys just OUTSIDE the range belong to no chunk
      val outside = Seq(min - 1, max + 1).forall { k =>
        chunks.count(c => member(c.predicate.get, k)) == 0
      }
      // exactly one chunk is marked last, and indexes are dense
      exact && outside && chunks.count(_.isLast) == 1 &&
        chunks.map(_.index) == chunks.indices
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500)
        .withInitialSeed(Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("offset chunks cover rowCount exactly with dense offsets") {
    val prop = Prop.forAll(
      Gen.chooseNum(0L, 100000L), Gen.chooseNum(1L, 999L)) { (rows, chunk) =>
      val chunks = ChunkPlanner.offsetLimit(rows, chunk)
      val coverage = chunks.map(_.limitOffset.get).map(_._1).sum
      val offsets = chunks.map(_.limitOffset.get._2)
      coverage >= rows && offsets == offsets.sorted &&
        offsets.distinct == offsets && chunks.count(_.isLast) == 1
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300)
        .withInitialSeed(Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }
}
