package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Second seam of this bridge package (see [[ColumnBridge]]):
  * `SparkSession.internalCreateDataFrame` is `private[sql]`, but it is the
  * only way to materialize an `RDD[InternalRow]` WITHOUT the per-row
  * `CatalystTypeConverters` walk that `createDataFrame(RDD[Row], schema)`
  * pays — a 3-5× row-materialization tax on ingest paths that already
  * hold their values in wire form. The snapshot wire reader builds
  * `GenericInternalRow`s of `UTF8String`s directly and hands them here.
  */
object DataFrameBridge {
  def fromInternalRows(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
