package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store sizing for the 100-TB deployment shape.
  *
  * Every stateful operator in this library ([[StreamingDedup]] band
  * buckets, [[StatefulOps]] per-key images, stream-stream join buffers)
  * stores its state through Spark's state-store provider. The default
  * HDFS-backed provider keeps every key's state **on the executor heap** —
  * fine for the reference's workloads (the reference keeps per-transaction
  * buffers in process memory the same way, `pq/message/stream.go:228-278`)
  * and for local test runs, but a long-running ingest-dedup stream over a
  * 100-TB corpus accumulates state far past heap: 8 bands × billions of
  * documents of retained signatures.
  *
  * The scale path is Spark's built-in RocksDB provider: state lives
  * off-heap in per-partition RocksDB instances with block-cache admission,
  * and checkpoint cost is proportional to the CHANGE per batch (changelog
  * checkpointing) instead of to total state size. Nothing about operator
  * semantics changes — the provider is a pluggable conf — so flipping it is
  * a deployment decision, which is why it is exposed as a session
  * configurator rather than baked into each operator.
  *
  * Usage: `StateBackends.rocksDb(spark)` (typically on a fresh session or
  * before the first stream starts; the provider conf is read at query
  * start). [[RocksDbStateSpec]] proves the dedup stream emits identical
  * flags under both providers.
  */
object StateBackends {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Switch `s`'s streaming state store to RocksDB with changelog
    * checkpointing. Returns `s` for chaining.
    */
  def rocksDb(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    // checkpoint uploads carry only each batch's delta; without this every
    // commit snapshots the full store, which at 100-TB state dominates the
    // batch time
    s.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    s
  }
}
