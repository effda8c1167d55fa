package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** Multimodal columns for an LLM-data pipeline (builder's brief): media as
  * opaque BINARY payloads with typed metadata, plus the decode /
  * feature-extract / frame-sample plumbing.
  *
  * No image/audio codecs exist in this container, so the decode kernel is a
  * clearly-marked deterministic STUB ([[MultimodalQueries.DecodeStub]]); the
  * Spark-side plumbing — binary schema, batched per-partition processing
  * (the Scala analogue of `mapInPandas` batch shape), codegen'd byte-level
  * feature columns, and the cross-engine oracle — is real and tested.
  */
object MultimodalQueries {

  /** Opaque media row: payload + typed metadata (SURVEY-brief schema shape).
    * Payload here is synthesized deterministically from `documents.text` —
    * in production it is the real image/audio bytes column.
    */
  final case class MediaRow(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Extracted features — what a real decoder would emit per media object. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      n_frames: Long,
      n_sampled: Long,
      fingerprint: Long)

  /** The stub decode kernel: the ONE seam where a real codec (JNI ffmpeg,
    * a Python `mapInPandas` stage, …) plugs in. Deterministic fake: "frames"
    * are 64-byte payload chunks, frame-sampling keeps every 4th, the
    * "embedding-ish" fingerprint is the 60-bit content hash. Batched
    * signature (many rows in, many rows out) exactly like an Arrow batch UDF.
    */
  object DecodeStub {
    val FrameBytes = 64
    val SampleEvery = 4

    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { m =>
      val nBytes = m.payload.length.toLong
      val nFrames = (nBytes + FrameBytes - 1) / FrameBytes
      val nSampled = (nFrames + SampleEvery - 1) / SampleEvery
      // STUB: a real decoder hashes decoded pixels/samples; this hashes the
      // raw payload (deterministic + cross-engine reproducible).
      val fp = graft.functions.Hash60(new String(m.payload, java.nio.charset.StandardCharsets.UTF_8))
      MediaFeatures(m.doc_id, m.media_type, nBytes, nFrames, nSampled, fp)
    }
  }

  /** The media table: documents dressed as media objects — payload is the
    * UTF-8 byte form of the text (deterministic), media_type derives from
    * `source`, width/height are stub metadata. Column pruning still reaches
    * the parquet scan (payload is built from `text`, not stored twice).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(col("source") === "src1", "image")
        .when(col("source") === "src2", "audio")
        .when(col("source") === "src3", "video")
        .otherwise("document").as("media_type"),
      col("text").cast("binary").as("payload"),
      (octet_length(col("text").cast("binary")) % 640).cast("int").as("width"),
      (octet_length(col("text").cast("binary")) % 480).cast("int").as("height"))

  /** Batched per-partition decode — the `mapInPandas` analogue: a partition's
    * rows are chunked into fixed-size batches, each batch goes through the
    * decode kernel once (amortizing per-batch setup the way Arrow batches
    * do), features stream out. No shuffle: decode parallelism == scan
    * parallelism, exactly what a 100-TB media scan needs.
    */
  def decodeFeatures(s: SparkSession, dir: String, batchSize: Int = 256): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => DecodeStub.decodeBatch(batch.toSeq))
    }
  }

  /** Oracle-checked multimodal feature digest: the same features the batched
    * stub emits, expressed as codegen'd byte-level column functions (no UDF)
    * and aggregated per media type — provable in DuckDB from octet_length +
    * the shared md5-based hash60. Byte-level plumbing (BINARY cast,
    * octet_length, frame arithmetic) is the real part; the hash stands in
    * for decoded-content features.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("n_frames",
        expr(s"(n_bytes + ${DecodeStub.FrameBytes - 1}) div ${DecodeStub.FrameBytes}"))
      .withColumn("n_sampled",
        expr(s"(n_frames + ${DecodeStub.SampleEvery - 1}) div ${DecodeStub.SampleEvery}"))
      .withColumn("fingerprint", hash60(col("payload").cast("string")))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_bytes").as("sum_bytes"),
        sum("n_frames").as("sum_frames"),
        sum("n_sampled").as("sum_sampled"),
        min("fingerprint").as("min_fp"))
}
