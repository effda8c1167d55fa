package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** Property: for ANY event sequence (random ops over a small key space),
  * ANY batch split, and ANY compaction point, the lake fold equals a
  * sequential in-memory replay of the same events — the same standing-fuzz
  * pattern the wire decoders carry (corrupt frames, message orderings).
  * This is the invariant that makes compact/vacuum safe to run at any
  * time against a live log.
  */
class LakeFoldPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)

  private sealed trait Op
  private case class Upsert(key: Int, value: Int) extends Op
  private case class Delete(key: Int) extends Op
  private case object Truncate extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    6 -> (for { k <- Gen.choose(0, 5); v <- Gen.choose(0, 99) } yield Upsert(k, v)),
    3 -> Gen.choose(0, 5).map(Delete(_)),
    1 -> Gen.const(Truncate))

  private val genCase: Gen[(List[Op], Int, Int)] = for {
    ops <- Gen.listOfN(24, genOp)
    nBatches <- Gen.choose(1, 5)
    compactAfter <- Gen.choose(0, nBatches) // 0 = never compact
  } yield (ops, nBatches, compactAfter)

  private def toRow(op: Op, lsn: Long): Row = op match {
    case Upsert(k, v) =>
      Row(lsn, lsn, 7L, "insert", "public", "t", T, T, Seq("id"),
        null, Map("id" -> k.toString, "v" -> v.toString))
    case Delete(k) =>
      Row(lsn, lsn, 7L, "delete", "public", "t", T, T, Seq("id"),
        Map("id" -> k.toString, "v" -> null), null)
    case Truncate =>
      Row(lsn, lsn, 7L, "truncate", "public", "t", T, T, Seq("id"), null, null)
  }

  /** The oracle: replay sequentially into a map. */
  private def replay(ops: List[Op]): Map[String, String] =
    ops.foldLeft(Map.empty[String, String]) {
      case (m, Upsert(k, v)) => m + (k.toString -> v.toString)
      case (m, Delete(k)) => m - k.toString
      case (_, Truncate) => Map.empty
    }

  test("fold == sequential replay for any ops, batch split, compaction point") {
    val prop = Prop.forAll(genCase) { case (ops, nBatches, compactAfter) =>
      val dir = Files.createTempDirectory("lake-prop").toString
      try {
        val sink = new LakeSink(dir)
        val rows = ops.zipWithIndex.map { case (op, i) => toRow(op, 10L + i) }
        val per = math.max(1, math.ceil(rows.size.toDouble / nBatches).toInt)
        rows.grouped(per).zipWithIndex.foreach { case (chunk, id) =>
          sink.appendBatch(envelope(chunk), id.toLong)
          if (id + 1 == compactAfter) { sink.compact(spark); sink.vacuum(spark) }
        }
        val folded = sink.latestState(spark, "public", "t")
          .select(col("k"), element_at(col("after"), "v"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        val ok = folded == replay(ops)
        if (!ok) info(s"MISMATCH ops=$ops nBatches=$nBatches compactAfter=$compactAfter " +
          s"folded=$folded replay=${replay(ops)}")
        ok
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withInitialSeed(Seed(23L)), prop)
    assert(res.passed, res.status.toString)
  }
}
