package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.snapshot.{ChunkPlanner, SnapshotConfig, SnapshotReader}

/** Snapshot operators (SURVEY §2.5) as verifiable queries: the chunked
  * parallel scan must be indistinguishable from a plain full scan — the
  * property the reference's `snapshot_ctid_partitioning_test.go` and
  * `snapshot_chunks_test.go` assert. All shapes here are single-scan: chunk
  * membership is a derived column, never a union of per-chunk scans.
  */
object SnapshotQueries {

  /** Planning pass (S5 analogue, `coordinator.go:1028-1059`): one small
    * driver-side aggregate that stands in for the catalog MIN/MAX/COUNT
    * queries. This is plan-time work, not per-row work — the same stats a
    * real deployment reads from pg_class/pg_index.
    */
  private def orderStats(s: SparkSession, dir: String): ChunkPlanner.TableStats = {
    val r = Tables.orders(s, dir)
      .agg(min("o_orderkey"), max("o_orderkey"), count(lit(1))).head()
    ChunkPlanner.TableStats(r.getLong(2), Some("o_orderkey"), r.getLong(0), r.getLong(1))
  }

  /** B3 integer_range chunked scan: per-chunk row counts and key bounds from
    * ONE scan. Proves every row lands in exactly one chunk (sum of n == table
    * count, bounds nest inside the chunk predicates) — the reference's
    * chunk-coverage assertion, in SQL.
    */
  def chunkedScan(s: SparkSession, dir: String): DataFrame = {
    val cfg = SnapshotConfig(chunkSize = 2000)
    SnapshotReader.parquetChunks(s, s"$dir/orders.parquet", orderStats(s, dir), cfg, "orders")
      .groupBy("chunk_index")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"), round(sum("o_totalprice"), 2).as("sum_price"))
  }

  /** B3 + P4: chunked scan with a row predicate AND-composed into every
    * chunk (`coordinator.go:460-490`).
    */
  def chunkedScanWithCondition(s: SparkSession, dir: String): DataFrame = {
    val cfg = SnapshotConfig(
      chunkSize = 3000,
      globalCondition = Some("o_orderstatus = 'F' AND o_totalprice > 50000"))
    SnapshotReader.parquetChunks(s, s"$dir/orders.parquet", orderStats(s, dir), cfg, "orders")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
  }

  /** B3 offset-strategy equivalence: LIMIT/OFFSET chunking == bucketing by
    * global row number. Global numbering is computed scale-safe, bucket-first:
    * (1) range-bucket on the key, (2) count per bucket (tiny driver-side
    * planning result, one row per bucket), (3) rank within bucket in parallel
    * + broadcast the per-bucket base offsets. No global single-task sort —
    * the shape `Window.orderBy(pk)` without partitionBy would be a guaranteed
    * straggler at 100×.
    */
  def offsetChunks(s: SparkSession, dir: String): DataFrame = {
    val stats = orderStats(s, dir)
    val nBuckets = 64L
    val width = math.max(1L, (stats.pkMax - stats.pkMin) / nBuckets + 1)
    val bucketed = Tables.orders(s, dir)
      .withColumn("bucket", expr(s"(o_orderkey - ${stats.pkMin}) div $width"))
    // Planning pass #2: per-bucket counts → exclusive prefix sums. At most
    // nBuckets rows ever reach the driver.
    val counts = bucketed.groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val baseByBucket = counts.map { case (b, n) => val base = acc; acc += n; (b, base) }.toSeq
    import s.implicits._
    val baseDf = baseByBucket.toDF("bucket", "base")
    val w = Window.partitionBy("bucket").orderBy("o_orderkey")
    bucketed.join(broadcast(baseDf), Seq("bucket"))
      .withColumn("rn", col("base") + row_number().over(w))
      .withColumn("chunk_index", expr("(rn - 1) div 2000"))
      .groupBy("chunk_index")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
  }
}
