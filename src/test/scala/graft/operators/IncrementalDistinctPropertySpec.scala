package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Property: for ANY consistent changelog (inserts, group-moving and
  * value-moving updates, deletes, truncates, null values, null groups)
  * and ANY batch split, the refcount-maintained `count(DISTINCT value)`
  * equals a from-scratch recompute of the current table AFTER EVERY
  * BATCH — the [[IncrementalAggPropertySpec]] contract applied to the
  * one aggregate scalar state cannot maintain under retraction.
  *
  * The interactions this covers that the directed q_ivm gate cannot:
  * several rows sharing one (group, value) pair (a delete of one must
  * NOT drop the distinct count while siblings survive — the refcount's
  * reason to exist), value-moving updates (decrement old + increment
  * new in one delta), group moves, intra-batch insert+delete pairing
  * telescoping to a zero-net delta row, SQL null semantics (NULL values
  * never count; a group whose rows are all NULL-valued is absent), and
  * truncate resetting through the recompute path mid-history.
  */
class IncrementalDistinctPropertySpec extends AnyFunSuite {
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

  private def dist = new IncrementalDistinct(
    group = Seq("g" -> (im => element_at(im, "g"))),
    name = "w",
    value = im => element_at(im, "w").cast("long"))

  // ---- abstract ops concretized against a model, so the changelog is
  // consistent (the refcount fails loud on retractions of values never
  // added — raw random ops would mostly exercise that error path).
  // A SMALL value domain is the point: collisions must be frequent so
  // refcounts regularly sit above 1.
  private sealed trait Op
  private case class Touch(key: Int, grp: Option[String], value: Option[Int]) extends Op
  private case class Drop(key: Int) extends Op
  private case object Trunc extends Op

  private val K = 8
  private val genOp: Gen[Op] = Gen.frequency(
    7 -> (for {
      k <- Gen.choose(0, K - 1)
      g <- Gen.frequency(5 -> Gen.oneOf("ga", "gb", "gc").map(Some(_)),
        1 -> Gen.const(None))
      w <- Gen.frequency(5 -> Gen.choose(0, 3).map(Some(_)),
        1 -> Gen.const(None))
    } yield Touch(k, g, w)),
    3 -> Gen.choose(0, K - 1).map(Drop(_)),
    1 -> Gen.const(Trunc))

  private val genCase: Gen[(List[Op], Int)] = for {
    ops <- Gen.listOfN(24, genOp)
    nBatches <- Gen.choose(1, 5)
  } yield (ops, nBatches)

  private def img(g: Option[String], w: Option[Int]): Map[String, String] =
    Map("g" -> g.orNull, "w" -> w.map(_.toString).orNull)

  private type Table = Map[Int, (Option[String], Option[Int])]

  private def concretize(table: Table, op: Op): (Seq[Row], Table) = op match {
    case Touch(k, g, w) => table.get(k) match {
      case Some((g0, w0)) =>
        (Seq(Row("update", img(g0, w0), img(g, w))), table + (k -> (g, w)))
      case None =>
        (Seq(Row("insert", null, img(g, w))), table + (k -> (g, w)))
    }
    case Drop(k) => table.get(k) match {
      case Some((g0, w0)) => (Seq(Row("delete", img(g0, w0), null)), table - k)
      case None => (Nil, table)
    }
    case Trunc => (Seq(Row("truncate", null, null)), Map.empty)
  }

  private def currentDf(table: Table): DataFrame =
    envelope(table.toSeq.map { case (_, (g, w)) =>
      Row("insert", null, img(g, w)) }).select(col("after"))

  private def viewSet(state: DataFrame): Set[(Option[String], Long)] =
    dist.view(state).collect().map { r =>
      (Option(r.getString(0)), r.getLong(1))
    }.toSet

  /** The model's answer, computed independently of Spark: distinct
    * non-null values per group; all-NULL-valued groups absent.
    */
  private def modelSet(table: Table): Set[(Option[String], Long)] =
    table.values.toSeq
      .collect { case (g, Some(w)) => (g, w) }
      .groupBy(_._1)
      .map { case (g, vs) => (g, vs.map(_._2).distinct.size.toLong) }
      .toSet

  private def topKSet(state: DataFrame, k: Int): Set[(Option[String], Long, Long, Int)] =
    dist.viewTopK(state, k).collect().map { r =>
      (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getInt(3))
    }.toSet

  /** Model top-k per group: frequency desc, value asc tiebreak. */
  private def modelTopK(table: Table, k: Int): Set[(Option[String], Long, Long, Int)] =
    table.values.toSeq
      .collect { case (g, Some(w)) => (g, w.toLong) }
      .groupBy(_._1)
      .flatMap { case (g, vs) =>
        vs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
          .sortBy { case (w, f) => (-f, w) }
          .take(k).zipWithIndex
          .map { case ((w, f), i) => (g, w, f, i + 1) }
      }.toSet

  test("maintained distinct count == from-scratch recompute after every batch, any history") {
    val d = dist
    val prop = Prop.forAll(genCase) { case (ops, nBatches) =>
      var table: Table = Map.empty
      val per = math.max(1, math.ceil(ops.size.toDouble / nBatches).toInt)
      var state = d.init(spark)
      var ok = true
      for (batch <- ops.grouped(per) if ok) {
        val rows = Seq.newBuilder[Row]
        for (op <- batch) {
          val (rs, next) = concretize(table, op)
          rows ++= rs; table = next
        }
        val cur = currentDf(table)
        state = d.step(state, envelope(rows.result()), cur)
        val got = viewSet(state)
        val want = viewSet(d.recomputeAll(cur))
        val model = modelSet(table)
        // the top-k view over the SAME maintained state must match the
        // model's exact frequency ranking too — retractions that evict a
        // heavy hitter must surface the next-heaviest value
        val gotTop = topKSet(state, 2)
        val modelTop = modelTopK(table, 2)
        if (got != want || got != model || gotTop != modelTop) {
          info(s"MISMATCH ops=$ops nBatches=$nBatches got=$got want=$want " +
            s"model=$model gotTop=$gotTop modelTop=$modelTop")
          ok = false
        }
      }
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(24).withInitialSeed(Seed(16L)),
      prop)
    assert(res.passed, res.status.toString)
  }
}
