package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

/** Companion seam to [[PlanBridge]], reduced to the SINK-side hop since
  * the graft-lake streaming SOURCE moved to DataSource V2 (which needs no
  * streaming-frame constructor). A v1 `Sink.addBatch` receives a
  * streaming-flagged DataFrame, which forbids ordinary write actions, and
  * the public API offers no way to re-wrap its rows as a batch frame —
  * the internal constructor is `private[sql]`. Nothing else may go in
  * this file.
  */
object StreamBridge {
  /** The physical rows of a DataFrame, for re-wrapping (also serves the
    * batch relation's InternalRow pass-through scan).
    */
  def toRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd

  /** Re-wrap a streaming-flagged frame's rows as a batch frame for
    * `Sink.addBatch`'s ordinary write path.
    */
  def batchDataFrame(
      s: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    s.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
