package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The fused SRP expressions under the LSH index: bucket folding must equal
  * the reference formulation (per-plane dot + sign + shift), projections
  * must match plain dot products bit-for-bit, null elements must null the
  * result, and float/double element types must agree.
  */
class SrpExpressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dim = 4
  private val bands = 2
  private val bits = 3
  // 6 planes x 4 dims, chosen so signs flip across vectors
  private val weights: Array[Double] = Array(
    1.0, -2.0, 0.5, 0.0,
    -1.0, 1.0, 1.0, -1.0,
    0.25, 0.25, -0.25, 0.5,
    2.0, 0.0, -1.0, 1.0,
    -0.5, -0.5, 0.5, 0.5,
    0.0, 1.0, 0.0, -2.0)

  private def expected(v: Array[Double]): (Array[Long], Array[Double]) = {
    val projs = Array.tabulate(bands * bits) { p =>
      (0 until dim).map(i => weights(p * dim + i) * v(i)).sum
    }
    val buckets = new Array[Long](bands)
    projs.zipWithIndex.foreach { case (s, p) =>
      if (s >= 0) buckets(p / bits) |= 1L << (p % bits)
    }
    (buckets, projs)
  }

  test("buckets and projections match the per-plane formulation (float and double)") {
    val vecs = Seq(
      Array(1.0, 2.0, -3.0, 0.5),
      Array(-1.0, 0.0, 0.0, 4.0),
      Array(0.0, 0.0, 0.0, 0.0))
    val fdf = vecs.map(v => Tuple1(v.map(_.toFloat))).toDF("v")
    val ddf = vecs.map(Tuple1(_)).toDF("v")
    for (df <- Seq(fdf, ddf)) {
      val rows = df.select(
        VectorOps.srpBuckets(col("v"), weights, dim, bands, bits).as("b"),
        VectorOps.srpProjections(col("v"), weights, dim).as("p")).collect()
      rows.zip(vecs).foreach { case (r, v) =>
        val (eb, ep) = expected(v)
        assert(r.getSeq[Long](0) == eb.toSeq, s"buckets for ${v.mkString(",")}")
        assert(r.getSeq[Double](1) == ep.toSeq, s"projections for ${v.mkString(",")}")
      }
    }
  }

  test("interpreted eval equals codegen output") {
    // Force the interpreted path through a context codegen can't cover:
    // direct Expression.eval on a literal row.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val v = Array(1.0, 2.0, -3.0, 0.5)
    val lit = Literal(new GenericArrayData(v), ArrayType(DoubleType))
    val bk = SrpBuckets(lit, weights, dim, bands, bits).eval(null)
      .asInstanceOf[ArrayData].toLongArray()
    val pj = SrpProjections(lit, weights, dim).eval(null)
      .asInstanceOf[ArrayData].toDoubleArray()
    val (eb, ep) = expected(v)
    assert(bk.toSeq == eb.toSeq && pj.toSeq == ep.toSeq)
  }

  test("a null element nulls the result; short vectors use min length") {
    val df = Seq(
      (1, Seq[java.lang.Double](1.0, null, 2.0, 3.0)),
      (2, Seq[java.lang.Double](1.0, 1.0))).toDF("id", "v")
    val rows = df.select(col("id"),
      VectorOps.srpBuckets(col("v"), weights, dim, bands, bits).as("b"),
      VectorOps.srpProjections(col("v"), weights, dim).as("p"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2), "null element → null result")
    // 2-element vector: planes see only the first 2 weights
    val v2 = Array(1.0, 1.0, 0.0, 0.0)
    val (eb, ep) = expected(v2)
    assert(rows(1).getSeq[Long](1) == eb.toSeq)
    assert(rows(1).getSeq[Double](2) == ep.toSeq)
  }
}
