package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** Property: for ANY event sequence, batch split, compaction point, and
  * key subset, the KEY-RESTRICTED fold (`stateAsOf(restrictToKeys)` —
  * BASE bucket-pruned + semi-joined tail) returns exactly the
  * unrestricted fold filtered to those keys. This is the soundness
  * contract every maintained view/join dirty-key recompute leans on: a
  * restricted fold that dropped a newer version (wrong bucket pruned) or
  * resurrected an older one (tail row missed) would silently corrupt
  * maintained state.
  *
  * The op mix deliberately includes KEY-CHANGING updates (before.id ≠
  * after.id — the fold keys updates on the after image, so the old key's
  * history and the new key's history land in different buckets),
  * truncates (which carry no key and must supersede restricted rows via
  * the UNRESTRICTED tail scan), and a compact+vacuum point (so the
  * restricted read must prune BASE slices, not just the tail).
  */
class RestrictedFoldPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)

  private sealed trait Op
  private case class Upsert(key: Int, value: Int) extends Op
  private case class Delete(key: Int) extends Op
  private case class KeyMove(from: Int, to: Int, value: Int) extends Op
  private case object Truncate extends Op

  private val K = 8 // key space 0..7 over 4 base buckets — collisions certain

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> (for { k <- Gen.choose(0, K - 1); v <- Gen.choose(0, 99) } yield Upsert(k, v)),
    3 -> Gen.choose(0, K - 1).map(Delete(_)),
    2 -> (for {
      a <- Gen.choose(0, K - 1); b <- Gen.choose(0, K - 1); v <- Gen.choose(0, 99)
    } yield KeyMove(a, b, v)),
    1 -> Gen.const(Truncate))

  private val genCase: Gen[(List[Op], Int, Int, Set[Int])] = for {
    ops <- Gen.listOfN(26, genOp)
    nBatches <- Gen.choose(1, 6)
    compactAfter <- Gen.choose(0, nBatches) // 0 = never compact
    restrict <- Gen.someOf(0 until K)       // any subset incl. empty
  } yield (ops, nBatches, compactAfter, restrict.toSet)

  private def img(k: Int, v: Int): Map[String, String] =
    Map("id" -> k.toString, "v" -> v.toString)

  private def toRow(op: Op, lsn: Long): Row = op match {
    case Upsert(k, v) =>
      Row(lsn, lsn, 7L, "insert", "public", "t", T, T, Seq("id"), null, img(k, v))
    case Delete(k) =>
      Row(lsn, lsn, 7L, "delete", "public", "t", T, T, Seq("id"),
        Map("id" -> k.toString, "v" -> null), null)
    case KeyMove(a, b, v) =>
      Row(lsn, lsn, 7L, "update", "public", "t", T, T, Seq("id"),
        img(a, v), img(b, v))
    case Truncate =>
      Row(lsn, lsn, 7L, "truncate", "public", "t", T, T, Seq("id"), null, null)
  }

  private def stateMap(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select(col("k"), element_at(col("after"), "v"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("restricted fold == unrestricted fold filtered to the keys, any history") {
    val prop = Prop.forAll(genCase) { case (ops, nBatches, compactAfter, restrict) =>
      val dir = Files.createTempDirectory("lake-rprop").toString
      try {
        val sink = new LakeSink(dir, baseBuckets = 4)
        val rows = ops.zipWithIndex.map { case (op, i) => toRow(op, 10L + i) }
        val per = math.max(1, math.ceil(rows.size.toDouble / nBatches).toInt)
        var last = -1L
        rows.grouped(per).zipWithIndex.foreach { case (chunk, id) =>
          sink.appendBatch(envelope(chunk), id.toLong)
          last = id.toLong
          if (id + 1 == compactAfter) { sink.compact(spark); sink.vacuum(spark) }
        }
        val ks = restrict.map(_.toString).toSeq.sorted
        val ksDF = {
          import spark.implicits._
          ks.toDF("k")
        }
        val restricted = stateMap(sink.stateAsOf(
          spark, "public", "t", asOf = last, restrictToKeys = Some(ksDF)))
        val full = stateMap(sink.stateAsOf(spark, "public", "t", asOf = last))
        val want = full.view.filterKeys(restrict.map(_.toString)).toMap
        val ok = restricted == want
        if (!ok) info(s"MISMATCH ops=$ops nBatches=$nBatches " +
          s"compactAfter=$compactAfter restrict=$restrict " +
          s"restricted=$restricted want=$want full=$full")
        ok
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(32).withInitialSeed(Seed(14L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  // -------------------------------------------------------------------
  // The IMMUTABLE-column restriction (`restrictToImmutable`): rows carry
  // a `grp` column that is a pure function of the row key (so it honors
  // the immutability contract by construction, NULL for some keys), and
  // the fold restricted by grp must equal the full fold filtered to
  // those grp values — across deletes, truncates, re-inserts, and a
  // compact+vacuum point (BASE rows must pass the filter too).

  private def grpOf(k: Int): String = if (k % 4 == 3) null else ("g" + (k % 3))

  private def toRowG(op: Op, lsn: Long): Row = op match {
    case Upsert(k, v) =>
      Row(lsn, lsn, 7L, "insert", "public", "t", T, T, Seq("id"), null,
        Map("id" -> k.toString, "grp" -> grpOf(k), "v" -> v.toString))
    case Delete(k) =>
      Row(lsn, lsn, 7L, "delete", "public", "t", T, T, Seq("id"),
        Map("id" -> k.toString, "grp" -> grpOf(k), "v" -> null), null)
    case KeyMove(a, _, v) => // reuse as a plain update of `v` (grp fixed)
      Row(lsn, lsn, 7L, "update", "public", "t", T, T, Seq("id"),
        Map("id" -> a.toString, "grp" -> grpOf(a), "v" -> "old"),
        Map("id" -> a.toString, "grp" -> grpOf(a), "v" -> v.toString))
    case Truncate =>
      Row(lsn, lsn, 7L, "truncate", "public", "t", T, T, Seq("id"), null, null)
  }

  private val genCaseG: Gen[(List[Op], Int, Int, Set[String])] = for {
    ops <- Gen.listOfN(26, genOp)
    nBatches <- Gen.choose(1, 6)
    compactAfter <- Gen.choose(0, nBatches)
    restrict <- Gen.someOf(Seq("g0", "g1", "g2"))
  } yield (ops, nBatches, compactAfter, restrict.toSet)

  test("immutable-column-restricted fold == unrestricted fold filtered, any history") {
    val prop = Prop.forAll(genCaseG) { case (ops, nBatches, compactAfter, restrict) =>
      val dir = Files.createTempDirectory("lake-iprop").toString
      try {
        val sink = new LakeSink(dir, baseBuckets = 4)
        val rows = ops.zipWithIndex.map { case (op, i) => toRowG(op, 10L + i) }
        val per = math.max(1, math.ceil(rows.size.toDouble / nBatches).toInt)
        var last = -1L
        rows.grouped(per).zipWithIndex.foreach { case (chunk, id) =>
          sink.appendBatch(envelope(chunk), id.toLong)
          last = id.toLong
          if (id + 1 == compactAfter) { sink.compact(spark); sink.vacuum(spark) }
        }
        val ksDF = {
          import spark.implicits._
          restrict.toSeq.sorted.toDF("k")
        }
        val restricted = stateMap(sink.stateAsOf(
          spark, "public", "t", asOf = last,
          restrictToImmutable = Some(((i: org.apache.spark.sql.Column) =>
            element_at(i, "grp"), ksDF))))
        val full = sink.stateAsOf(spark, "public", "t", asOf = last)
          .select(col("k"), element_at(col("after"), "v"),
            element_at(col("after"), "grp"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        val want = full.filter(r => r._3 != null && restrict.contains(r._3))
          .map(r => r._1 -> r._2).toMap
        val ok = restricted == want
        if (!ok) info(s"MISMATCH ops=$ops nBatches=$nBatches " +
          s"compactAfter=$compactAfter restrict=$restrict " +
          s"restricted=$restricted want=$want")
        ok
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(32).withInitialSeed(Seed(41L)),
      prop)
    assert(res.passed, res.status.toString)
  }
}
