package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

/** Companion seam to [[PlanBridge]] for DSv1 streaming sources. A v1
  * `Source.getBatch` must return a DataFrame whose logical plan is marked
  * `isStreaming = true` (MicroBatchExecution asserts it), but the public
  * API offers no way to build one from an ordinary batch read — the
  * internal constructor Delta-style sources use is `private[sql]`. This is
  * the one sanctioned hop; nothing else may go in this file.
  */
object StreamBridge {
  /** The physical rows of a (batch) DataFrame, for re-wrapping. */
  def toRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd

  /** Wrap an InternalRow RDD as a streaming-marked DataFrame. */
  def streamingDataFrame(
      s: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    s.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The inverse hop for v1 `Sink.addBatch`: its incoming frame is
    * streaming-flagged, which forbids ordinary write actions — re-wrap
    * the same rows as a batch frame.
    */
  def batchDataFrame(
      s: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    s.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
