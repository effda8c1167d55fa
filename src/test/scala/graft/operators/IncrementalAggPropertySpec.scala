package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Property: for ANY consistent changelog (inserts, group-moving and
  * value-moving updates, deletes, truncates, null measures, null groups)
  * and ANY batch split, the incrementally maintained state equals a
  * from-scratch recompute of the current table AFTER EVERY BATCH — not
  * just at the end, so a transiently wrong extreme that a later batch
  * happens to repair still fails.
  *
  * This is the maintenance contract `q_ivm`/`q_mv` lean on: counts and
  * sums merge arithmetically, min/max retractions at a group's stored
  * extreme must trigger the bounded dirty-group recompute, intra-batch
  * insert+delete pairing is lost in the aggregated delta (the net-new
  * group must recompute, not trust the delta), and SQL null semantics
  * (sum over only nulls is NULL; nulls never count) must survive any
  * interleaving. The directed IncrementalAggSpec cases pin each behavior
  * in isolation; this spec covers their interactions.
  */
class IncrementalAggPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val envSchema = StructType(Seq(
    StructField("op", StringType),
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType))))

  private def envelope(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      envSchema)

  private val vEx: Column => Column = im => element_at(im, "v").cast("long")
  private def agg = new IncrementalAgg(
    group = Seq("g" -> (im => element_at(im, "g"))),
    sums = Seq("v" -> vEx), mins = Seq("v" -> vEx), maxs = Seq("v" -> vEx))

  // ---- abstract ops, concretized against a model so the changelog is
  // consistent (IncrementalAgg fails loud on retractions of rows never
  // added — random raw ops would mostly exercise that error path)
  private sealed trait Op
  private case class Touch(key: Int, grp: Option[String], value: Option[Int]) extends Op
  private case class Drop(key: Int) extends Op
  private case object Trunc extends Op

  private val K = 8
  // null groups and null measures are first-class: g=None exercises the
  // <=> group merge; v=None exercises sum/count null semantics and
  // null-valued extremes
  private val genOp: Gen[Op] = Gen.frequency(
    7 -> (for {
      k <- Gen.choose(0, K - 1)
      g <- Gen.frequency(5 -> Gen.oneOf("ga", "gb", "gc").map(Some(_)),
        1 -> Gen.const(None))
      v <- Gen.frequency(5 -> Gen.choose(-50, 50).map(Some(_)),
        1 -> Gen.const(None))
    } yield Touch(k, g, v)),
    3 -> Gen.choose(0, K - 1).map(Drop(_)),
    1 -> Gen.const(Trunc))

  private val genCase: Gen[(List[Op], Int)] = for {
    ops <- Gen.listOfN(24, genOp)
    nBatches <- Gen.choose(1, 5)
  } yield (ops, nBatches)

  private def img(g: Option[String], v: Option[Int]): Map[String, String] =
    Map("g" -> g.orNull, "v" -> v.map(_.toString).orNull)

  private type Table = Map[Int, (Option[String], Option[Int])]

  /** One abstract op → (concrete envelope rows, next table state).
    * Touch of a live key is an update (group moves included); of a dead
    * key an insert. Drop of a dead key is a no-op.
    */
  private def concretize(table: Table, op: Op): (Seq[Row], Table) = op match {
    case Touch(k, g, v) => table.get(k) match {
      case Some((g0, v0)) =>
        (Seq(Row("update", img(g0, v0), img(g, v))), table + (k -> (g, v)))
      case None =>
        (Seq(Row("insert", null, img(g, v))), table + (k -> (g, v)))
    }
    case Drop(k) => table.get(k) match {
      case Some((g0, v0)) => (Seq(Row("delete", img(g0, v0), null)), table - k)
      case None => (Nil, table)
    }
    case Trunc => (Seq(Row("truncate", null, null)), Map.empty)
  }

  private def currentDf(table: Table): DataFrame =
    envelope(table.toSeq.map { case (_, (g, v)) =>
      Row("insert", null, img(g, v)) }).select(col("after"))

  private def viewSet(state: DataFrame): Set[(Option[String], Long, Option[Long], Option[Long], Option[Long])] =
    agg.view(state).collect().map { r =>
      (Option(r.getString(0)), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSet

  test("maintained state == from-scratch recompute after every batch, any history") {
    val a = agg
    val prop = Prop.forAll(genCase) { case (ops, nBatches) =>
      var table: Table = Map.empty
      val per = math.max(1, math.ceil(ops.size.toDouble / nBatches).toInt)
      var state = a.init(spark)
      var ok = true
      for (batch <- ops.grouped(per) if ok) {
        val rows = Seq.newBuilder[Row]
        for (op <- batch) {
          val (rs, next) = concretize(table, op)
          rows ++= rs; table = next
        }
        val cur = currentDf(table)
        state = a.step(state, envelope(rows.result()), cur)
        val got = viewSet(state)
        val want = viewSet(a.recomputeAll(cur))
        if (got != want) {
          info(s"MISMATCH ops=$ops nBatches=$nBatches got=$got want=$want")
          ok = false
        }
      }
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(24).withInitialSeed(Seed(14L)),
      prop)
    assert(res.passed, res.status.toString)
  }
}
