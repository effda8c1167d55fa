package graft.sinks

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent
import graft.operators.IncrementalDistinct

/** CHURN-PROPORTIONALITY pin for the maintained distinct count at real
  * group cardinality — the [[RestrictedRecomputeScaleSpec]] technique
  * applied to the refcount state: a 1,000-group / 4,000-refcount-row
  * state with 2 touched groups must feed the bucketed `stepMerge` ONLY
  * the touched buckets' state rows (~|state|·touched/buckets), never the
  * state. Without the bucket restriction every refresh would shuffle the
  * entire refcount state (Σ|distinct values per group| — the largest
  * state any maintainer here carries) through the merge join regardless
  * of churn.
  */
class MaintainedDistinctScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(lsn: Long, op: String,
      before: Map[String, String], after: Map[String, String]): Row =
    Row(lsn, lsn, 7L, op, "public", "users", T, T, Seq("id"), before, after)
  private def img(id: Long, grp: String, w: String): Map[String, String] =
    Map("id" -> id.toString, "grp" -> grp, "w" -> w)

  private val GROUPS = 1000
  private val VALS = 4
  private val BUCKETS = 64
  private def grpName(g: Int) = f"g$g%04d"

  /** Shuffle records written by the MERGE's shuffles specifically — the
    * exchanges hash-partitioned on the refcount key (grp, v), identified
    * by partitioning rather than summed over every exchange so an
    * unrelated exchange can never inflate the measurement.
    */
  private def mergeInputRows(df: DataFrame): Long = {
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    val merges = flatten(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike
        if (e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.exists(_.references.exists(_.name == "v"))
          case _ => false
        }) => e
    }
    assert(merges.nonEmpty, "expected the merge's (grp, v)-partitioned shuffle")
    merges.map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
  }

  test("1,000-group distinct state: merge input scales with touched buckets, not the state") {
    val dir = Files.createTempDirectory("lake-mdscale").toString
    // the merge must SHUFFLE to be measurable: Spark 3.4+ can broadcast
    // even full-outer joins at these sizes, which would hide the row
    // counts this spec exists to compare
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sink = new LakeSink(dir, baseBuckets = 4)
      val dist = new IncrementalDistinct(
        group = Seq("grp" -> (im => element_at(im, "grp"))),
        name = "w",
        value = im => element_at(im, "w"))
      val md = new MaintainedDistinct(sink, dist, "public", "users", "ndscale",
        stateBuckets = BUCKETS)

      // batch 0: 1,000 groups × 4 values → 4,000 refcount rows over 64
      // buckets
      val inserts = for {
        g <- 0 until GROUPS
        i <- 0 until VALS
      } yield ev(g.toLong * 10 + i, "insert", null,
        img(g.toLong * VALS + i, grpName(g), s"w$i"))
      sink.appendBatch(envelope(inserts), 0L)
      assert(md.refresh(spark) == 1)

      // batch 1: touch exactly 2 groups (one insert of a NEW value, one
      // delete of an existing one)
      sink.appendBatch(envelope(Seq(
        ev(20000L, "insert", null, img(99990L, grpName(7), "w-new")),
        ev(20001L, "delete", img(500L * VALS, grpName(500), "w0"), null))), 1L)
      assert(md.refresh(spark) == 1)
      val got = md.read(spark)
        .filter(col("grp").isin("g0007", "g0500", "g0123"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("g0007" -> 5L, "g0500" -> 3L, "g0123" -> 4L))

      // the scale property, measured on the exact construction
      // MaintainedDistinct.refresh runs: delta → touched buckets →
      // readBuckets-restricted state side of stepMerge — vs the same
      // merge against the FULL state
      val states = new BucketedStateLog(
        new Path(sink.root, "_graft_views/ndscale"), BUCKETS, dist.groupCols)
      val f = states.fs(spark)
      val stateSchema = dist.init(spark).schema
      val prevKey = states.committed(f).head // the batch-0 version
      // rebuild batch 1's delta directly from its events
      val span = envelope(Seq(
        ev(20000L, "insert", null, img(99990L, grpName(7), "w-new")),
        ev(20001L, "delete", img(500L * VALS, grpName(500), "w0"), null)))
      val d = dist.delta(span).localCheckpoint()
      val touched = d
        .select(states.bucketExpr(dist.groupCols.map(col)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(touched.size <= 2, s"2 dirty groups must touch <=2 buckets: $touched")

      val restricted = mergeInputRows(dist.stepMerge(
        states.readBuckets(spark, prevKey, Some(touched), stateSchema), d))
      val unrestricted = mergeInputRows(dist.stepMerge(
        states.read(spark, prevKey, stateSchema), d))
      // touched-bucket population ≈ |state| · touched/buckets ≈ 125
      assert(restricted <= 300,
        s"restricted merge input should be ~touched-bucket rows, got $restricted")
      assert(unrestricted >= GROUPS.toLong * VALS,
        s"unrestricted merge input should be state-sized, got $unrestricted")
      val ratio = unrestricted.toDouble / restricted
      info(f"merge input: restricted=$restricted unrestricted=$unrestricted " +
        f"reduction=${ratio}%.0fx")
      assert(ratio > 10,
        s"bucket restriction must cut merge input >10x at 1,000 groups / 2 dirty " +
          s"(got ${ratio}x)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
