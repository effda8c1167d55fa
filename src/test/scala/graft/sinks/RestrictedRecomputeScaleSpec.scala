package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent
import graft.operators.IncrementalAgg

/** CHURN-PROPORTIONALITY proof for the immutable-group restricted
  * recompute at REAL group cardinality — the property the feature exists
  * for, previously exercised only at the degenerate 3-groups-all-dirty
  * shape (r14 verdict). A 1,000-group table with 2 dirty groups must feed
  * the dirty-group fold an input proportional to the DIRTY GROUPS'
  * population, not the table.
  *
  * Measurement: the fold is one shuffle on the replica key
  * ([[LakeSink.foldImages]]'s window), so the executed plan's
  * shuffle-records-written IS the fold input row count. The probe runs
  * `stateAsOf(restrictToImmutable)` — the exact construction
  * [[MaintainedView.refresh]] routes dirty-group recomputes through when
  * `groupIsImmutable` is set — and compares against the unrestricted
  * fold of the same boundary.
  */
class RestrictedRecomputeScaleSpec extends AnyFunSuite {
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
  private def img(id: Long, grp: String, v: Long): Map[String, String] =
    Map("id" -> id.toString, "grp" -> grp, "v" -> v.toString)

  private val GROUPS = 1000
  private val PER_GROUP = 6
  private def grpName(g: Int) = f"g$g%04d"

  /** Shuffle records written by the FOLD's shuffle specifically — the one
    * hash-partitioned on the replica key `k` (LakeSink.foldImages's
    * window). Identified by its partitioning rather than summed over every
    * exchange in the plan: the restriction semi-joins normally broadcast,
    * but an AQE/threshold change that shuffles them must not inflate the
    * measurement and flake the proportionality assertion (r15 ADVICE).
    */
  private def foldInputRows(df: DataFrame): Long = {
    df.collect()
    // AQE wraps exchanges in leaf QueryStageExec nodes — plain collect
    // stops there, so flatten through stage/adaptive boundaries manually
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    val folds = flatten(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike
        if (e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.exists(_.references.exists(_.name == "k"))
          case _ => false
        }) => e
    }
    assert(folds.nonEmpty, "expected the fold's k-partitioned shuffle in the plan")
    folds.map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)).sum
  }

  test("1,000-group view: dirty-group fold input scales with the dirty groups, not the table") {
    val dir = Files.createTempDirectory("lake-scale").toString
    try {
      val sink = new LakeSink(dir, baseBuckets = 4)
      val vEx: Column => Column = im => element_at(im, "v").cast("long")
      val ge: Column => Column = im => element_at(im, "grp")
      val agg = new IncrementalAgg(
        group = Seq("grp" -> ge),
        sums = Seq("v" -> vEx), mins = Seq("v" -> vEx))
      val mv = new MaintainedView(sink, agg, "public", "users", "scale",
        stateBuckets = 8, groupIsImmutable = true, groupCol = Some("grp"))

      // batch 0: 1,000 groups × 6 rows; per-group minimum is v = g (the
      // i = 0 row), the rest sit at g + 10·i
      val inserts = for {
        g <- 0 until GROUPS
        i <- 0 until PER_GROUP
      } yield ev(g.toLong * 10 + i, "insert", null,
        img(g.toLong * PER_GROUP + i, grpName(g), g.toLong + 10L * i))
      sink.appendBatch(envelope(inserts), 0L)
      assert(mv.refresh(spark) == 1)
      // compact + vacuum: BASE becomes load-bearing — the restricted
      // read must prune through base rows, not just the changelog tail
      sink.compact(spark); sink.vacuum(spark)

      // batch 1: delete the MIN row of exactly 2 groups → exactly 2
      // dirty groups (min retraction at the extreme)
      val dirty = Seq(7, 500)
      sink.appendBatch(envelope(dirty.zipWithIndex.map { case (g, i) =>
        ev(20000L + i, "delete",
          img(g.toLong * PER_GROUP, grpName(g), g.toLong), null)
      }), 1L)
      assert(mv.refresh(spark) == 1)

      // values: dirty groups recomputed without their min, a clean
      // sample group untouched
      val got = mv.read(spark)
        .filter(col("grp").isin("g0007", "g0500", "g0123"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      def expect(g: Int, deleted: Boolean) = {
        val vs = (0 until PER_GROUP).map(i => g.toLong + 10L * i)
          .drop(if (deleted) 1 else 0)
        (vs.size.toLong, vs.sum, vs.min)
      }
      assert(got("g0007") == expect(7, deleted = true))
      assert(got("g0500") == expect(500, deleted = true))
      assert(got("g0123") == expect(123, deleted = false))

      // the scale property: the restricted fold (the construction
      // MaintainedView.refresh hands to stepMergeWith for dirty groups)
      // shuffles ~|dirty population| records; the unrestricted fold of
      // the same boundary shuffles the table
      import spark.implicits._
      val ks = dirty.map(grpName).toDF("k")
      val restricted = foldInputRows(
        sink.stateAsOf(spark, "public", "users", 1L,
          restrictToImmutable = Some((ge, ks))))
      val unrestricted = foldInputRows(
        sink.stateAsOf(spark, "public", "users", 1L))
      // dirty population: 2 groups × 6 base rows + 2 tail deletes = 14
      assert(restricted >= 10 && restricted <= 50,
        s"restricted fold input should be ~14 rows, got $restricted")
      assert(unrestricted >= GROUPS.toLong * PER_GROUP,
        s"unrestricted fold input should be table-sized, got $unrestricted")
      val ratio = unrestricted.toDouble / restricted
      info(f"fold input: restricted=$restricted unrestricted=$unrestricted " +
        f"reduction=${ratio}%.0fx")
      assert(ratio > 100,
        s"restriction must cut fold input by >100x at 1,000 groups / 2 dirty " +
          s"(got ${ratio}x)")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
