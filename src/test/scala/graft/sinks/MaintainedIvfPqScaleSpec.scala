package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** READ-proportionality pin for the PQ mode of the maintained IVF
  * index — the 100-TB pitch is "the exact fetch pays for the SHORTLIST,
  * not the candidates": a probed cell holding 2,000 of a 10,000-doc
  * corpus must feed [[MaintainedIvfIndex.searchTopKAdc]]'s exact
  * re-rank only the ADC survivors' lake buckets, while the exact
  * [[MaintainedIvfIndex.searchTopK]] fetches every candidate's
  * embedding. Measured on the lake fold's own parquet scans
  * (file-level bucket pruning is exactly what a 1000-executor cluster
  * would see as saved IO).
  *
  * Sizing lesson (the family's bucket rule applied to the LAKE side):
  * the fetch prunes base FILES by the restrict keys' hash buckets, so
  * its floor is shortlistBuckets × (corpus/baseBuckets) resident rows —
  * `baseBuckets` must sit well above the shortlist for the restriction
  * to bite, exactly like `stateBuckets` vs churn×bands on the write
  * side.
  */
class MaintainedIvfPqScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(lsn: Long, op: String,
      before: Map[String, String], after: Map[String, String]): Row =
    Row(lsn, lsn, 7L, op, "public", "vecs", T, T, Seq("id"), before, after)
  private def doc(id: String, emb: String): Map[String, String] =
    Map("id" -> id, "emb" -> emb)

  private val DOCS = 10000
  private val HOT = 2000 // candidates in the probed cell
  private val BASE_BUCKETS = 256
  private val SHORTLIST = 16

  /** Rows produced by every parquet scan in the query — the fold's base
    * slices plus the changelog tail; both compared plans share the tail,
    * so the delta is the base pruning (AQE-proof flatten, same technique
    * as [[MaintainedLshIndexScaleSpec.mergeInputRows]]).
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ nested).flatMap(flatten)
    }
    val scans = flatten(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected the fold's parquet scans")
    scans.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
  }

  test("10,000-doc PQ index: the ADC fetch scans shortlist-proportional lake rows, the exact fetch candidate-proportional") {
    val dir = Files.createTempDirectory("lake-ivfpqscale").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sink = new LakeSink(dir, baseBuckets = BASE_BUCKETS)
      // 4-D embeddings; hot cell at the origin, cold cell at (50,50,50,50).
      // Hot docs spread along x1 with zero-padded ids so id order == true
      // distance order; the codeword ladder along x1 makes ADC order agree
      // with true order up to quantization width, so a 16-doc shortlist
      // contains the true top-10 and the pin can assert exact equality.
      val cents = Seq(Seq(0f, 0f, 0f, 0f), Seq(50f, 50f, 50f, 50f))
      val ladder = (0 until 16).map(r => Seq(r * 0.15f, 0f))
      val books = Seq(ladder, Seq(Seq(0f, 0f)))
      val ix = new MaintainedIvfIndex(sink, "public", "vecs", "pqscale",
        idKey = "id", embKey = "emb", centroids = cents,
        stateBuckets = 64, pqBooks = Some(books))
      val rows = (0 until DOCS).map { i =>
        val emb =
          if (i < HOT) s"${i * 0.001},0,0,0"
          else s"${50 + (i % 7) * 0.01},50,${50 - (i % 5) * 0.01},50"
        ev(i.toLong, "insert", null, doc(f"d$i%04d", emb))
      }
      sink.appendBatch(envelope(rows), 0L)
      // compact so the corpus lives in BASE slices (the 100-TB resident
      // shape — the fetch's pruning target); the tail is empty
      sink.compact(spark)
      assert(ix.refresh(spark) == 1)

      val q = Seq(0f, 0f, 0f, 0f)
      assert(ix.search(spark, q, nprobe = 1).count() == HOT.toLong,
        "the probed cell must hold all hot docs")

      val exactDf = ix.searchTopK(spark, q, nprobe = 1, k = 10)
      val exactRows = scanRows(exactDf)
      val exactTop = exactDf.collect().map(_.getString(0)).toSeq

      val adcDf = ix.searchTopKAdc(spark, q, nprobe = 1, k = 10,
        shortlist = SHORTLIST)
      val adcRows = scanRows(adcDf)
      val adcTop = adcDf.collect().map(_.getString(0)).toSeq

      // recall on the constructed corpus: the shortlist covers the true
      // top-10, so ADC == exact, id for id
      assert(adcTop == exactTop, s"$adcTop vs $exactTop")
      assert(adcTop == (0 until 10).map(i => f"d$i%04d"), s"$adcTop")

      // the scale property: candidate-restricted vs shortlist-restricted
      // base pruning. Floors: 2,000 keys touch ~all 256 buckets (≈ the
      // whole corpus scans); 16 keys touch ≤ 16 (≤ 2× slack for hash
      // skew over ~39 resident rows/bucket)
      assert(exactRows >= DOCS / 2,
        s"exact fetch should be candidate-proportional, got $exactRows")
      val bound = 2L * SHORTLIST * (DOCS / BASE_BUCKETS)
      assert(adcRows <= bound,
        s"ADC fetch should be shortlist-proportional (bound $bound), got $adcRows")
      val ratio = exactRows.toDouble / adcRows
      info(f"fetch scans: exact=$exactRows adc=$adcRows reduction=$ratio%.1fx " +
        f"(shortlist $SHORTLIST of $HOT candidates, $BASE_BUCKETS base buckets)")
      assert(ratio > 5,
        s"ADC must cut the exact-fetch scan >5x on a hot cell (got $ratio)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
