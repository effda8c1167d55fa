package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence check for the custom merge as-of join: arbitrary
  * key/time multisets (duplicate keys, duplicate timestamps, empty sides,
  * singleton keys) against a brute-force per-row reference. Results are
  * compared on the matched TIME, which is what as-of semantics pin down —
  * when several build rows share the winning (key, time), any of them is a
  * correct match (DuckDB's ASOF picks arbitrarily too).
  */
class AsOfJoinPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val genRows: Gen[List[(Long, Long)]] =
    Gen.choose(0, 35).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L))))

  test("matches the brute-force reference on random inputs") {
    val prop = Prop.forAll(genRows, genRows, Gen.option(Gen.choose(0L, 10L)),
      Gen.oneOf("left", "inner")) { (lRows, rRows, tol, joinType) =>
      // sentinel rows (keys outside the generated 0..4 range) keep
      // createDataFrame schema inference alive for empty sides; the left
      // sentinel is filtered out of the comparison below
      val left = spark.createDataFrame(
        (lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }) :+ ((-2L, 0L, -1L)))
        .toDF("k", "t", "idx")
      val right = spark.createDataFrame(rRows :+ ((-1L, 0L)))
        .toDF("rk", "rt")
      val got = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt", tol, joinType)
        .filter(col("idx") >= 0)
        .select(col("idx"), col("rt"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toSet
      val expected = lRows.zipWithIndex.flatMap { case ((k, t), i) =>
        val cands = rRows.filter { case (rk, rt) =>
          rk == k && rt <= t && tol.forall(t - rt <= _) }
        if (cands.nonEmpty) Some((i.toLong, Some(cands.map(_._2).max)))
        else if (joinType == "left") Some((i.toLong, None))
        else None
      }.toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30).withInitialSeed(Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("NULL keys and times match nothing — fuzzed against brute force") {
    import spark.implicits._
    val genNullable: Gen[List[(Option[Long], Option[Long])]] =
      Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, Gen.zip(
        Gen.option(Gen.choose(0L, 3L)), Gen.option(Gen.choose(0L, 20L)))))
    val prop = Prop.forAll(genNullable, genNullable, Gen.oneOf("left", "inner")) {
      (lRows, rRows, joinType) =>
        val left = (lRows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) } :+
          ((Some(-2L): Option[Long], Some(0L): Option[Long], -1L)))
          .toDF("k", "t", "idx")
        val right = (rRows :+ ((Some(-1L): Option[Long], Some(0L): Option[Long])))
          .toDF("rk", "rt")
        val got = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt", None, joinType)
          .filter(col("idx") >= 0)
          .select(col("idx"), col("rt"))
          .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
          .toSet
        // SQL equi-join semantics: a row with a NULL key or time joins
        // nothing — including other NULL-keyed rows.
        val expected = lRows.zipWithIndex.flatMap { case ((kOpt, tOpt), i) =>
          val cands = for {
            k <- kOpt.toList
            t <- tOpt.toList
            (rkOpt, rtOpt) <- rRows
            rk <- rkOpt.toList
            rt <- rtOpt.toList
            if rk == k && rt <= t
          } yield rt
          if (cands.nonEmpty) Some((i.toLong, Some(cands.max)))
          else if (joinType == "left") Some((i.toLong, None))
          else None
        }.toSet
        got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30).withInitialSeed(Seed(11L)), prop)
    assert(res.passed, res.status.toString)
  }
}
