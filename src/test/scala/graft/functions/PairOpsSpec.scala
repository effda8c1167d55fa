package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The codegen'd pair-emission and sorted-merge-intersect kernels behind
  * the inverted-index dedup path: agreement with the HOF formulations they
  * replaced, boundary sizes, and type checking.
  */
class PairOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("ordered_pairs emits every (i<j) pair in element order") {
    val df = Seq(Seq(3L, 7L, 9L)).toDF("ds")
    val out = df.select(explode(PairOps.orderedPairs(col("ds"))).as("p"))
      .select("p.d1", "p.d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((3L, 7L), (3L, 9L), (7L, 9L)))
  }

  test("ordered_pairs matches the transform/slice/flatten HOF formulation") {
    val df = spark.range(50).select(
      // variable-length sorted lists, incl. size 0 and 1
      array_sort(array_distinct(transform(
        sequence(lit(0), pmod(col("id") * 13, lit(7))),
        i => pmod(col("id") * 31 + i * 17, lit(11))))).as("ds"))
    val hof = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))),
        y => struct(x.as("d1"), y.as("d2")))))
    val mismatches = df
      .select((PairOps.orderedPairs(col("ds")) === hof).as("ok"))
      .filter(!col("ok")).count()
    assert(mismatches == 0)
  }

  test("ordered_pairs on empty and singleton lists emits nothing") {
    val df = Seq(Seq.empty[Long], Seq(5L)).toDF("ds")
    assert(df.select(explode(PairOps.orderedPairs(col("ds")))).count() == 0)
  }

  test("ordered_pairs skips null slots instead of reading garbage through them") {
    val df = Seq(Seq[Option[Long]](Some(1L), None, Some(2L), Some(3L))).toDF("ds")
    val got = df.select(explode(PairOps.orderedPairs(col("ds"))).as("p"))
      .select(col("p.d1"), col("p.d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (1L, 3L), (2L, 3L)),
      "pairs are over the non-null elements only — no fabricated id 0")
  }

  test("sorted_intersect_count matches size(array_intersect) on sorted distinct arrays") {
    val df = spark.range(200).select(
      array_sort(array_distinct(transform(
        sequence(lit(0), pmod(col("id") * 7, lit(20))),
        i => pmod(col("id") * 13 + i * 29, lit(40))))).as("a"),
      array_sort(array_distinct(transform(
        sequence(lit(0), pmod(col("id") * 11, lit(20))),
        i => pmod(col("id") * 17 + i * 23, lit(40))))).as("b"))
    val mismatches = df.select(
        (PairOps.sortedIntersectCount(col("a"), col("b")) ===
          size(array_intersect(col("a"), col("b"))).cast("long")).as("ok"))
      .filter(!col("ok")).count()
    assert(mismatches == 0)
  }

  test("sorted_intersect_count: disjoint, identical, empty") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
    val out = df.select(PairOps.sortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 3L, 0L))
  }

  test("interpreted eval equals codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val arr = Literal.create(new GenericArrayData(Array(2L, 5L, 8L)),
      ArrayType(LongType, containsNull = false))
    val pairs = OrderedPairs(arr).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(pairs.numElements() == 3)
    val cnt = SortedIntersectCount(arr, Literal.create(
      new GenericArrayData(Array(5L, 8L, 9L)),
      ArrayType(LongType, containsNull = false))).eval(null)
    assert(cnt == 2L)
  }

  test("wrong input types are a loud analysis error") {
    val df = Seq((Seq("x"), Seq(1L))).toDF("s", "d")
    val e1 = intercept[Exception](df.select(PairOps.orderedPairs(col("s"))).collect())
    assert(e1.getMessage.contains("ordered_pairs") || e1.getMessage.contains("array<bigint>"))
    val e2 = intercept[Exception](
      df.select(PairOps.sortedIntersectCount(col("s"), col("d"))).collect())
    assert(e2.getMessage.contains("sorted_intersect_count") ||
      e2.getMessage.contains("array<bigint>"))
  }
}
