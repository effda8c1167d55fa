package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The three explicit 100-TB scale patterns: salting (skewed aggregation),
  * bucketing (co-located joins), and partitioned corpus export.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("salted aggregation equals the plain aggregation on a skewed key") {
    // 90% of rows share one key — the pathological shape salting exists for
    val skewed = spark.range(10000)
      .select(when($"id" % 10 =!= 0, "hot").otherwise(concat(lit("k"), $"id" % 7)).as("k"),
        $"id".as("v"))
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = ScaleOps.saltedAgg(skewed, "k", 16, "n", "v", "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
    // phase 1 really fans the hot key out across salts
    val fanout = skewed
      .withColumn("_salt", pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(16)))
      .filter($"k" === "hot").select("_salt").distinct().count()
    assert(fanout > 8, s"hot key only reached $fanout of 16 salts")
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // at test scale Spark would (rightly) broadcast; force the shuffled
      // path so the assertion exercises what bucketing buys at 100 TB,
      // where NEITHER side broadcasts
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dir = "/root/testdata/sf0.001"
      Tables.orders(spark, dir).write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(spark, dir).write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum > 0)
      val plan = PlanBridge.executedPlan(joined).toString
      // bucket layout co-locates both sides: the JOIN keys need no exchange
      // (the small final aggregate may still shuffle on its own key)
      assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"),
        s"expected a bucketed sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
        !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"expected no exchange on the bucketed join keys:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("corpus writer lays out hive partitions with bounded files") {
    val out = Files.createTempDirectory("graft-corpus").toFile
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    ScaleOps.writeCorpus(docs, out.getAbsolutePath,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"), maxRecordsPerFile = 100)
    val langDirs = out.listFiles().filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty, "no hive-style partition dirs written")
    // bounded file size: no file holds more than maxRecordsPerFile rows
    val perFile = spark.read.parquet(out.getAbsolutePath)
      .select(input_file_name().as("f")).groupBy("f").count()
      .collect().map(_.getLong(1))
    assert(perFile.nonEmpty && perFile.forall(_ <= 100))
    // partition pruning: a lang filter reads only that directory
    val pruned = spark.read.parquet(out.getAbsolutePath).filter($"lang" === "en")
    assert(pruned.count() == docs.filter($"lang" === "en").count())
  }
}
