package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.snapshot.{ChunkPlanner, SnapshotConfig, SnapshotReader}

/** Snapshot operators (SURVEY §2.5) as verifiable queries: the chunked
  * parallel scan must be indistinguishable from a plain full scan — the
  * property the reference's `snapshot_ctid_partitioning_test.go` and
  * `snapshot_chunks_test.go` assert.
  */
object SnapshotQueries {

  private def orderStats(s: SparkSession, dir: String): ChunkPlanner.TableStats = {
    val r = Tables.orders(s, dir)
      .agg(min("o_orderkey"), max("o_orderkey"), count(lit(1))).head
    ChunkPlanner.TableStats(r.getLong(2), Some("o_orderkey"), r.getLong(0), r.getLong(1))
  }

  /** B3 integer_range chunked scan ≡ full scan: union of per-chunk
    * predicate reads, aggregated (order-insensitive) so the oracle is the
    * plain aggregate.
    */
  def chunkedScan(s: SparkSession, dir: String): DataFrame = {
    val cfg = SnapshotConfig(chunkSize = 2000)
    SnapshotReader.parquetChunks(s, s"$dir/orders.parquet", orderStats(s, dir), cfg, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
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

  /** B3 offset-strategy equivalence: LIMIT/OFFSET chunking expressed as
    * row_number bucketing; per-chunk stats prove coverage and sizing.
    * (The global window is the *fallback* strategy — the scale path is
    * integer_range/ctid; this shape documents why: it forces a total order.)
    */
  def offsetChunks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("chunk_index", ((col("rn") - 1) / 2000).cast("long"))
      .groupBy("chunk_index")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
  }
}
