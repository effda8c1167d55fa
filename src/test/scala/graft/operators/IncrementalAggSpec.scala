package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Incremental view maintenance: delta arithmetic, dirty-group min/max
  * recompute, SQL null semantics, truncate reset, and the two loud failure
  * modes (missing before image, negative group count).
  */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val envSchema = StructType(Seq(
    StructField("op", StringType),
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType))))

  private def env(rows: (String, Map[String, String], Map[String, String])*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.map { case (op, b, a) => Row(op, b, a) }).asJava),
      envSchema)

  private def img(g: String, v: String): Map[String, String] =
    Map("g" -> g, "v" -> v)

  private val vEx: Column => Column = im => element_at(im, "v").cast("double")
  private def agg = new IncrementalAgg(
    group = Seq("g" -> (im => element_at(im, "g"))),
    sums = Seq("v" -> vEx), mins = Seq("v" -> vEx), maxs = Seq("v" -> vEx))

  private def viewMap(state: DataFrame): Map[String, (Long, Option[Double], Option[Double], Option[Double])] =
    agg.view(state).collect().map { r =>
      r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    }.toMap

  private def current(rows: (String, String)*): DataFrame =
    env(rows.map { case (g, v) => ("insert", null: Map[String, String], img(g, v)) }: _*)
      .select(col("after"))

  test("inserts, non-extreme update, and non-extreme delete maintain without recompute") {
    val a = agg
    val s0 = a.step(a.init(spark), env(
      ("insert", null, img("x", "1")),
      ("insert", null, img("x", "5")),
      ("insert", null, img("x", "3")),
      ("insert", null, img("y", "7"))),
      sys.error("no recompute expected"))
    assert(viewMap(s0) == Map(
      "x" -> ((3L, Some(9d), Some(1d), Some(5d))),
      "y" -> ((1L, Some(7d), Some(7d), Some(7d)))))
    // update 3 -> 4 (interior) and delete the interior 4: extremes survive
    val s1 = a.step(s0, env(("update", img("x", "3"), img("x", "4"))),
      sys.error("interior update must not recompute"))
    val s2 = a.step(s1, env(("delete", img("x", "4"), null)),
      sys.error("interior delete must not recompute"))
    assert(viewMap(s2) == Map(
      "x" -> ((2L, Some(6d), Some(1d), Some(5d))),
      "y" -> ((1L, Some(7d), Some(7d), Some(7d)))))
  }

  test("retracting a group's min dirties ONLY that group and recomputes it bounded") {
    val a = agg
    val s0 = a.step(a.init(spark), env(
      ("insert", null, img("x", "1")),
      ("insert", null, img("x", "5")),
      ("insert", null, img("y", "7")),
      ("insert", null, img("y", "2"))),
      sys.error("no recompute expected"))
    // delete x's min (1); y untouched. current state carries a poisoned y
    // row that would flip y's aggregate if it were (wrongly) recomputed —
    // bounded recompute must read x's rows only.
    val cur = current("x" -> "5", "y" -> "999")
    val s1 = a.step(s0, env(("delete", img("x", "1"), null)), cur)
    assert(viewMap(s1) == Map(
      "x" -> ((1L, Some(5d), Some(5d), Some(5d))),
      "y" -> ((2L, Some(9d), Some(2d), Some(7d)))))
  }

  test("an update that raises the max recomputes nothing; one that retracts it does") {
    val a = agg
    val s0 = a.step(a.init(spark), env(
      ("insert", null, img("x", "5")),
      ("insert", null, img("x", "9"))),
      sys.error("no recompute expected"))
    val s1 = a.step(s0, env(("update", img("x", "5"), img("x", "11"))),
      current("x" -> "9", "x" -> "11"))
    assert(viewMap(s1)("x") == ((2L, Some(20d), Some(9d), Some(11d))))
    // now retract the max 11 back down: dirty, recompute from current
    val s2 = a.step(s1, env(("update", img("x", "11"), img("x", "6"))),
      current("x" -> "9", "x" -> "6"))
    assert(viewMap(s2)("x") == ((2L, Some(15d), Some(6d), Some(9d))))
  }

  test("net-new group with intra-batch churn recomputes (delta pairing is lost)") {
    val a = agg
    // brand-new group z: insert 1, delete 1, insert 10 in ONE batch —
    // the aggregated delta can't know the surviving min, so z is dirty
    val s0 = a.step(a.init(spark), env(
      ("insert", null, img("z", "1")),
      ("delete", img("z", "1"), null),
      ("insert", null, img("z", "10"))),
      current("z" -> "10"))
    assert(viewMap(s0) == Map("z" -> ((1L, Some(10d), Some(10d), Some(10d)))))
  }

  test("sum over only-null values is NULL, and nulls never poison count") {
    val a = agg
    val s0 = a.step(a.init(spark), env(
      ("insert", null, img("x", null)),
      ("insert", null, img("x", null))),
      sys.error("no recompute expected"))
    assert(viewMap(s0) == Map("x" -> ((2L, None, None, None))))
    val s1 = a.step(s0, env(("insert", null, img("x", "4"))),
      sys.error("no recompute expected"))
    assert(viewMap(s1) == Map("x" -> ((3L, Some(4d), Some(4d), Some(4d)))))
    // delete one null row: count drops, sum stays (non-null count is 1).
    // a null retraction can't displace an extreme but state min is reached
    // via the dirty path only when del_min is non-null — stays clean.
    val s2 = a.step(s1, env(("delete", img("x", null), null)),
      sys.error("null delete must not recompute"))
    assert(viewMap(s2) == Map("x" -> ((2L, Some(4d), Some(4d), Some(4d)))))
  }

  test("a group retracted to zero rows disappears") {
    val a = agg
    val s0 = a.step(a.init(spark), env(("insert", null, img("x", "3"))),
      sys.error("no recompute expected"))
    val s1 = a.step(s0, env(("delete", img("x", "3"), null)), current())
    assert(viewMap(s1).isEmpty)
  }

  test("truncate resets to a full recompute of current state") {
    val a = agg
    val s0 = a.step(a.init(spark), env(
      ("insert", null, img("x", "3")),
      ("insert", null, img("y", "8"))),
      sys.error("no recompute expected"))
    val s1 = a.step(s0, env(
      ("truncate", null, null),
      ("insert", null, img("w", "2"))),
      current("w" -> "2"))
    assert(viewMap(s1) == Map("w" -> ((1L, Some(2d), Some(2d), Some(2d)))))
  }

  test("update/delete without a before image fails loudly (REPLICA IDENTITY FULL required)") {
    val a = agg
    val s0 = a.step(a.init(spark), env(("insert", null, img("x", "3"))),
      sys.error("no recompute expected"))
    val e = intercept[Exception] {
      a.step(s0, env(("delete", null, null)), current()).collect()
    }
    assert(e.getMessage.contains("REPLICA IDENTITY FULL"))
  }

  test("decimal sums are carried in the measure's own type, exactly") {
    val decEx: Column => Column = im => element_at(im, "v").cast("decimal(10,2)")
    val a = new IncrementalAgg(
      group = Seq("g" -> (im => element_at(im, "g"))),
      sums = Seq("v" -> decEx))
    // 0.10 + 0.20 + 0.30 is NOT 0.60 in binary floating point — a double
    // accumulator would show 0.6000000000000001; decimal must stay exact
    val s0 = a.step(a.init(spark), env(
      ("insert", null, img("x", "0.10")),
      ("insert", null, img("x", "0.20")),
      ("insert", null, img("x", "0.30"))),
      sys.error("no recompute expected"))
    val sumField = a.view(s0).schema("sum_v")
    assert(sumField.dataType.isInstanceOf[DecimalType],
      s"sum must stay decimal, got ${sumField.dataType}")
    val v0 = a.view(s0).collect().head.getDecimal(2)
    assert(v0.compareTo(new java.math.BigDecimal("0.60")) == 0, s"got $v0")
    // retraction arithmetic stays exact too
    val s1 = a.step(s0, env(("delete", img("x", "0.30"), null)),
      sys.error("no recompute expected"))
    val v1 = a.view(s1).collect().head.getDecimal(2)
    assert(v1.compareTo(new java.math.BigDecimal("0.30")) == 0, s"got $v1")
  }

  test("a retraction for rows never added fails loudly") {
    val a = agg
    val e = intercept[Exception] {
      // sums/mins empty variant so the dirty path can't mask the count check
      val plain = new IncrementalAgg(
        group = Seq("g" -> (im => element_at(im, "g"))), sums = Nil)
      plain.step(plain.init(spark), env(("delete", img("x", "3"), null)),
        sys.error("no recompute expected")).collect()
    }
    assert(e.getMessage.contains("negative group count"))
  }
}
