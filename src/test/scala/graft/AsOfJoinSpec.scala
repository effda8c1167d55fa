package graft

import graft.plans.{AsOf, AsOfJoinExec, AsOfJoinPlan, GraftExtensions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def quotes: DataFrame =
    Seq((1L, ts(10), 1.0), (1L, ts(20), 2.0), (1L, ts(20), 2.5), (2L, ts(15), 3.0))
      .toDF("q_key", "q_ts", "px")

  private def trades: DataFrame =
    Seq((1L, ts(5)), (1L, ts(20)), (1L, ts(25)), (2L, ts(14)), (3L, ts(30)))
      .toDF("key", "t_ts")

  private def asofRows(tol: Option[Long], joinType: String) =
    AsOf.join(trades, quotes, Seq("key"), Seq("q_key"), "t_ts", "q_ts", tol, joinType)
      .select($"key", $"t_ts", $"q_ts", $"px")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)).map(_.getTime / 1000), Option(r.get(3))))
      .toSet

  test("left as-of: latest quote at-or-before each trade, ties inclusive") {
    val got = asofRows(None, "left")
    // key 1 @20: two quotes share q_ts=20 — the merge keeps the LAST in sort
    // order and DuckDB ASOF keeps one arbitrarily; rows project q_ts only in
    // oracle queries. Here we assert the time, and px in {2.0, 2.5}.
    assert(got.map { case (k, t, q, _) => (k, t.getTime / 1000, q) } == Set(
      (1L, 5L, None), (1L, 20L, Some(20L)), (1L, 25L, Some(20L)),
      (2L, 14L, None), (3L, 30L, None)))
    val pxAt20 = got.collect { case (1L, t, Some(20L), px) if t.getTime == 25000 => px }
    assert(pxAt20.forall(p => p.contains(2.0) || p.contains(2.5)))
  }

  test("inner as-of drops unmatched probes") {
    assert(asofRows(None, "inner").toSeq.map(_._1).sorted == Seq(1L, 1L))
  }

  test("tolerance bounds the lookback, boundary inclusive") {
    // trade@25 vs quote@20: gap 5s. tol=5s keeps it, tol=4s drops it.
    val in = asofRows(Some(5L * 1000000), "left")
    assert(in.exists(r => r._1 == 1L && r._2.getTime == 25000 && r._3.contains(20L)))
    val outT = asofRows(Some(4L * 1000000), "left")
    assert(outT.exists(r => r._1 == 1L && r._2.getTime == 25000 && r._3.isEmpty && r._4.isEmpty))
  }

  test("multi-key as-of and empty build side") {
    val l = Seq((1L, "a", 10L), (1L, "b", 10L)).toDF("k1", "k2", "t")
    val r = Seq((1L, "a", 8L, "hit")).toDF("r1", "r2", "rt", "tag")
    val j = AsOf.join(l, r, Seq("k1", "k2"), Seq("r1", "r2"), "t", "rt")
      .select($"k2", $"tag").collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(j == Set(("a", "hit"), ("b", null)))
    val none = AsOf.join(l, r.filter($"r1" === 99), Seq("k1", "k2"), Seq("r1", "r2"), "t", "rt")
    assert(none.count() == 2 && none.filter($"tag".isNotNull).count() == 0)
  }

  test("NULL keys never match — not even each other (SQL equi-join semantics)") {
    val l = Seq((Option(1L), 20L, "a"), (Option.empty[Long], 20L, "b"))
      .toDF("key", "t", "tag")
    val r = Seq((Option(1L), 10L, 1.0), (Option.empty[Long], 5L, 9.9))
      .toDF("rkey", "rt", "px")
    val got = AsOf.join(l, r, Seq("key"), Seq("rkey"), "t", "rt")
      .select($"tag", $"px").collect()
      .map(row => (row.getString(0), Option(row.get(1)))).toSet
    assert(got == Set(("a", Some(1.0)), ("b", None)),
      "the NULL-keyed probe must NOT pick up the NULL-keyed build row")
    // inner drops the NULL-keyed probe entirely
    val inner = AsOf.join(l, r, Seq("key"), Seq("rkey"), "t", "rt", joinType = "inner")
      .select($"tag").as[String].collect().toSeq
    assert(inner == Seq("a"))
  }

  test("Long.MinValue is a legitimate time value, not a NULL sentinel") {
    val l = Seq((1L, Long.MinValue, "min"), (1L, 0L, "zero")).toDF("key", "t", "tag")
    val r = Seq((1L, Long.MinValue, "r_min")).toDF("rkey", "rt", "rtag")
    val got = AsOf.join(l, r, Seq("key"), Seq("rkey"), "t", "rt")
      .select($"tag", $"rtag").collect()
      .map(row => (row.getString(0), Option(row.getString(1)))).toSet
    assert(got == Set(("min", Some("r_min")), ("zero", Some("r_min"))),
      "a MinValue build time matches probes at-or-after it; a MinValue probe matches the equal build time")
  }

  test("column resolution is case-insensitive and ambiguity fails loudly") {
    val got = AsOf.join(trades, quotes, Seq("KEY"), Seq("Q_Key"), "T_TS", "q_TS")
      .count()
    assert(got == 5, "default case-insensitive resolution, like every built-in API")
    val dup = quotes.select($"q_key", $"q_ts", $"px".as("Q_TS"))
    val ex = intercept[IllegalArgumentException](
      AsOf.join(trades, dup, Seq("key"), Seq("q_key"), "t_ts", "q_ts"))
    assert(ex.getMessage.contains("ambiguous"))
  }

  test("self-join from one relation gets deduplicated attribute ids") {
    val ev = Seq((1L, 10L, "click"), (1L, 12L, "purchase")).toDF("uid", "t", "et")
    val j = AsOf.join(
      ev.filter($"et" === "purchase").select($"uid", $"t"),
      ev.filter($"et" === "click").select($"uid".as("cuid"), $"t".as("ct")),
      Seq("uid"), Seq("cuid"), "t", "ct")
    assert(j.collect().map(r => (r.getLong(0), r.getLong(3))).toSet == Set((1L, 10L)))
  }

  test("matches the composed window formulation on real events data") {
    val ev = operators.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter($"event_type" === "purchase").select($"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"))
    val custom = AsOf.join(p, c, Seq("user_id"), Seq("c_user"), "ts", "click_ts")
      .select($"user_id", $"ts", $"click_ts")

    val w = Window.partitionBy("user_id").orderBy($"ts")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = ev.filter($"event_type".isin("purchase", "click"))
      .select($"user_id", $"ts", $"event_type",
        when($"event_type" === "click", $"ts").as("c"))
      .withColumn("click_ts", last("c", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"click_ts")

    assert(custom.count() == composed.count())
    assert(custom.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(custom).count() == 0)
  }

  test("physical plan: AsOfJoinExec with co-partitioned sorted children") {
    val j = AsOf.join(trades, quotes, Seq("key"), Seq("q_key"), "t_ts", "q_ts")
    j.collect()
    val plan = PlanBridge.executedPlan(j).toString
    assert(plan.contains("AsOfJoin"), s"no AsOfJoinExec in:\n$plan")
    assert(plan.contains("Sort") && plan.contains("hashpartitioning"),
      s"expected shuffled+sorted children in:\n$plan")
  }

  test("optimizer rule pushes left-only filters below the join") {
    val j = AsOf.join(trades, quotes, Seq("key"), Seq("q_key"), "t_ts", "q_ts")
      .filter($"key" === 1L && $"px" > 1.0)
    val opt = PlanBridge.optimizedPlan(j)
    val node = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    assert(node.left.collectFirst { case f: Filter => f }.nonEmpty,
      s"left filter not pushed:\n$opt")
    // px predicate references the build side and must stay above
    assert(opt.collectFirst { case f: Filter if f.child.isInstanceOf[AsOfJoinPlan] => f }.nonEmpty)
  }

  test("GraftExtensions registers strategy + rule via withExtensions") {
    val shared = spark // force shared session init before we juggle singletons
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // Reuses the JVM's SparkContext but builds a NEW session, to which the
      // builder applies the injected extensions. Never stopped (that would
      // kill the shared context); only the singletons are restored.
      val s2 = SparkSession.builder()
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2.ne(shared), "expected a fresh session for the extensions test")
      val l = s2.createDataFrame(Seq((1L, 10L))).toDF("k", "t")
      val r = s2.createDataFrame(Seq((1L, 9L, "x"))).toDF("rk", "rt", "v")
      // build the plan node directly — no ensureRegistered on this session —
      // so ONLY the injected strategy can plan it
      val lp = PlanBridge.analyzed(l)
      val rp = PlanBridge.analyzed(r)
      val node = AsOfJoinPlan(lp, rp, Seq(lp.output.head), Seq(rp.output.head),
        lp.output(1), rp.output(1), None, inner = false)
      val df = PlanBridge.ofRows(s2, node)
      assert(df.collect().map(_.getString(4)).toSeq == Seq("x"))
      assert(s2.experimental.extraStrategies.isEmpty,
        "strategy must have come from the injected extensions, not the experimental seam")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
