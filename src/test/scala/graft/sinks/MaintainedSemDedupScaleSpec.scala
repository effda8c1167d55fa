package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cdc.ChangeEvent

/** The maintained SemDeDup's 10k-doc scale pin: one churned document
  * against a 10,000-doc corpus over ~200 cells must re-verdict and
  * REWRITE only its dirty cells' buckets — the resident population
  * carries by manifest reference — while the maintained verdicts stay
  * equal to the batch pipeline's from-scratch recompute. Without the
  * dirty-cell design, 0.1% churn would re-pay the full cluster-pair
  * pass (the exact cost the class exists to kill at 100 TB).
  */
class MaintainedSemDedupScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def envelope(rows: Seq[Row]) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      ChangeEvent.schema)

  private val T = new java.sql.Timestamp(1700000000000L)
  private def ev(lsn: Long, op: String, keys: Seq[String],
      before: Map[String, String], after: Map[String, String]): Row =
    Row(lsn, lsn, 7L, op, "public", "docs", T, T, keys, before, after)

  test("10k-doc corpus: a one-doc churn rewrites only its dirty cells' buckets and stays recompute-equal") {
    val DOCS = 10000
    val CELLS = 200
    val BUCKETS = 32
    // centroids on a line at 0, 100, 200, … — cell c's docs sit at
    // 100·c ± 1, so assignment is unambiguous and ~half of each cell's
    // docs are exact duplicates (angle-0 pairs within the same cell)
    val cents = (0 until CELLS).map(c => Seq((100.0f * c), 1.0f))
    def emb(i: Int): String = {
      val c = i % CELLS
      // two clusters inside each cell: even members share one direction
      // (duplicates of each other at cos=1 relative to the cell anchor),
      // odd members another
      if ((i / CELLS) % 2 == 0) s"${100.0 * c + 1},1" else s"${100.0 * c},2"
    }
    def doc(i: Int): Map[String, String] =
      Map("id" -> f"d$i%05d", "emb" -> emb(i))
    val dir = Files.createTempDirectory("lake-sdscale").toString
    try {
      val sink = new LakeSink(dir)
      val sd = new MaintainedSemDedup(sink, "public", "docs", "sd_scale",
        idKey = "id", embKey = "emb", centroids = cents, tau = 0.999999,
        stateBuckets = BUCKETS)
      sink.appendBatch(envelope(
        (0 until DOCS).map(i => ev(i.toLong, "insert", Seq("id"),
          null, doc(i)))), 0L)
      assert(sd.refresh(spark, None) == 1)
      val dropped0 = sd.read(spark).filter(col("dropped")).count()
      assert(dropped0 > DOCS / 4,
        s"fixture needs a real duplicate population, got $dropped0 dropped")

      // churn ONE doc: move d00007 from cell 7 into cell 8 (both cells'
      // verdicts re-evaluate; everything else must carry)
      sink.appendBatch(envelope(Seq(
        ev(50000L, "update", Seq("id"), doc(7),
          Map("id" -> "d00007", "emb" -> "801,1")))), 1L)
      assert(sd.refresh(spark, None) == 1)
      assert(sd.assertConsistent(spark) == DOCS,
        "maintained verdicts must equal the batch recompute at scale")

      // the write pin: the churn version's own slices hold only the two
      // dirty cells' bucket rows — never the 10k-row verdict state
      val log = sd.stateLog
      val f = log.fs(spark)
      val key = sd.latestKey(spark).get
      val vName = s"v${IntervalKeys.name(key)}"
      val (written, carried) =
        log.entries(f, key).partition(_._2.startsWith(vName))
      assert(carried.nonEmpty, "clean buckets must carry by reference")
      val writtenRows =
        if (written.isEmpty) 0L
        else spark.read
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("cell",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("dropped",
              org.apache.spark.sql.types.BooleanType))))
          .parquet(written.values.toSeq.map(r =>
            new org.apache.hadoop.fs.Path(
              new org.apache.hadoop.fs.Path(dir,
                "_graft_semdedup/sd_scale"), r).toString): _*).count()
      info(s"one-doc churn rewrote $writtenRows rows in ${written.size} " +
        s"buckets (${carried.size} carried) of a $DOCS-row state")
      // two dirty cells → ≤ two buckets → each drags ~CELLS/BUCKETS
      // cells of ~DOCS/CELLS rows: well under a tenth of the state
      assert(writtenRows > 0 && writtenRows <= DOCS / 10,
        s"one-doc churn must be dirty-cell-bounded, rewrote $writtenRows " +
          s"of $DOCS rows")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
