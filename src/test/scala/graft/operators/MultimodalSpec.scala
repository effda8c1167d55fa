package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.MultimodalQueries._

/** Multimodal plumbing: binary schema, batched per-partition decode (the
  * mapInPandas-shaped stage), and stub-vs-columnar feature agreement.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  test("media table has the opaque-binary schema with typed metadata") {
    val df = mediaTable(spark, dir)
    val types = df.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("payload") == "binary")
    assert(types("media_type") == "string")
    assert(types("width") == "integer" && types("height") == "integer")
    val row = df.head()
    assert(row.getAs[Array[Byte]]("payload").nonEmpty)
  }

  test("batched decode emits one feature row per media row, batch-invariant") {
    val n = mediaTable(spark, dir).count()
    val feats = decodeFeatures(spark, dir, batchSize = 7)
    assert(feats.count() == n)
    // batch size must not change results (pure per-row kernel, batched only
    // for amortization — the Arrow-batch contract)
    val a = decodeFeatures(spark, dir, batchSize = 3).collect().sortBy(_.doc_id).toSeq
    val b = decodeFeatures(spark, dir, batchSize = 1000).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }

  test("stub decode and codegen'd columnar features agree") {
    val fromStub = decodeFeatures(spark, dir).toDF()
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("sum_bytes"),
        sum("n_frames").as("sum_frames"), sum("n_sampled").as("sum_sampled"),
        min("fingerprint").as("min_fp"))
      .orderBy("media_type").collect().toSeq
    // the columnar query additionally carries the resize sums; the stub
    // kernel models decode/frame features only — compare the shared columns
    val fromColumns = multimodalFeatures(spark, dir)
      .select("media_type", "n_docs", "sum_bytes", "sum_frames", "sum_sampled", "min_fp")
      .orderBy("media_type").collect().toSeq
    assert(fromStub == fromColumns)
  }
}
