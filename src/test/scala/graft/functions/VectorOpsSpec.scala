package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The codegen'd dot-product expression: float/double inputs, null
  * propagation, agreement with the HOF formulation it replaced.
  */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("float and double arrays, mixed, accumulate in double") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0))).toDF("f", "d")
    assert(df.select(VectorOps.dot(col("f"), col("d"))).head.getDouble(0) == 32.0)
    assert(df.select(VectorOps.dot(col("f"), col("f"))).head.getDouble(0) == 14.0)
    assert(df.select(VectorOps.dot(col("d"), col("d"))).head.getDouble(0) == 77.0)
  }

  test("matches the interpreted zip_with/aggregate formulation bit-for-bit") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        transform(col("embedding"), x => x.cast("double")).as("vd"))
    val hof = aggregate(zip_with(col("vd"), col("vd"), (x, y) => x * y), lit(0.0), (a, x) => a + x)
    val diff = vecs
      .select((VectorOps.dot(col("embedding"), col("embedding")) - hof).as("delta"))
      .agg(max(abs(col("delta")))).head.getDouble(0)
    assert(diff == 0.0, "accumulation order and widening must be identical")
  }

  test("null array or null element yields null") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), None))),
      (None: Option[Seq[Option[Double]]], Some(Seq(Some(1.0), Some(2.0))))
    ).toDF("a", "b")
    val out = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("non-numeric arrays are a loud analysis error") {
    val df = Seq((Seq("x"), Seq(1.0))).toDF("s", "d")
    val ex = intercept[Exception](df.select(VectorOps.dot(col("s"), col("d"))).collect())
    assert(ex.getMessage.toLowerCase.contains("dot_product") ||
      ex.getMessage.contains("array<float|double>"))
  }
}
