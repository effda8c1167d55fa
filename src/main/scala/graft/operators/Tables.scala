package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the testdata star schema (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Pin a column to its canonical logical type with a cast that is a
    * no-op against today's files (SimplifyCasts erases it from the plan, so
    * pushdown/pruning are untouched) but holds the type steady if a future
    * testdata generation flips the physical encoding — the round-9 lesson
    * (events.ts became TIMESTAMP_NTZ and every imperative
    * `getLong`/`getAs[LocalDateTime]` row accessor downstream broke for a
    * full round). Applied to exactly the columns the mapPartitions wire
    * encoders read positionally.
    */
  private def pin(df: DataFrame, types: (String, String)*): DataFrame =
    types.foldLeft(df) { case (acc, (c, t)) =>
      // tolerate reduced-schema fixtures (specs write minimal tables)
      if (acc.columns.contains(c)) acc.withColumn(c, col(c).cast(t)) else acc
    }

  /** Fan a narrow scan out to the session's parallelism before CPU-heavy
    * per-row work. The test corpus is single-row-group parquet (one file,
    * one row group per table — TESTDATA.md), which parquet cannot split:
    * every scan plans ONE task, so map-side work (wire encode/decode,
    * shingling, tokenization, regex scans) serializes on one core however
    * many the session has. This is the optimization guide's "unsplittable
    * input" case (§2.5): repartition right after the read. No-op when the
    * scan already carries comparable parallelism (a real multi-file table
    * at 100 TB), so the extra exchange exists only where the input could
    * not parallelize anyway; round-robin keeps sizes even, and Spark's
    * sort-before-repartition (on by default) keeps the placement
    * deterministic under task retries. Apply AFTER projecting the needed
    * columns so the exchange carries only what the consumer reads.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= want) df else df.repartition(want)
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame =
    pin(apply(s, d, "orders"),
      "o_orderkey" -> "long", "o_custkey" -> "long", "o_totalprice" -> "double")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.parquet's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (read as raw-nanos LONG under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (read as TIMESTAMP_NTZ), or plain TIMESTAMP.
    * Normalize all three to a µs TimestampType column so downstream
    * operators see one stable type. Lossless in every case: the nanos
    * generator emitted whole microseconds (epoch_ns % 1000 == 0 across all
    * SFs), and every session here pins spark.sql.session.timeZone=UTC, so
    * the NTZ→LTZ cast preserves the stored micros bit-for-bit — ordering
    * and tie semantics match DuckDB reading the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = pin(apply(s, d, "events"),
      "event_id" -> "long", "user_id" -> "long", "value" -> "double")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // legacy nanos-as-long read
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    pin(apply(s, d, "documents"), "doc_id" -> "long", "n_chars" -> "long")
  def embeddings(s: SparkSession, d: String): DataFrame =
    pin(apply(s, d, "embeddings"),
      "vec_id" -> "long", "embedding" -> "array<float>")
}
