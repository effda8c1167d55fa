package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash60

/** Multimodal columns for an LLM-data pipeline (builder's brief): media as
  * opaque BINARY payloads with typed metadata, plus the decode /
  * feature-extract / frame-sample plumbing.
  *
  * The decode kernel is REAL pure-JVM container-header parsing
  * ([[graft.functions.MediaHeaders]]): PNG/JPEG/GIF dimensions and frame
  * counts, WAV sample rate / channels / duration, read byte-by-byte from
  * the binary payload in batched per-partition passes (the Scala analogue
  * of a `mapInPandas` Arrow-batch kernel). Payloads are synthesized with
  * header-accurate containers ([[graft.functions.MediaGen]]) from
  * deterministic per-document parameters, so the DuckDB oracle can compute
  * the expected parse results independently — the oracle checks that the
  * kernel actually recovered the fields from the bytes. Pixel/sample
  * DECODING (a JNI codec or Python stage) remains out of scope in this
  * container; header metadata extraction is the 100-TB probe stage that
  * precedes it.
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

  /** Legacy batch shape retained for the feature-digest query: "frames" as
    * fixed-size payload chunks and a content-hash fingerprint, the
    * byte-level features `multimodalFeatures` proves against DuckDB.
    */
  object DecodeStub {
    val FrameBytes = 64
    val SampleEvery = 4

    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] = batch.map { m =>
      val nBytes = m.payload.length.toLong
      val nFrames = (nBytes + FrameBytes - 1) / FrameBytes
      val nSampled = (nFrames + SampleEvery - 1) / SampleEvery
      val fp = graft.functions.Hash60(new String(m.payload, java.nio.charset.StandardCharsets.UTF_8))
      MediaFeatures(m.doc_id, m.media_type, nBytes, nFrames, nSampled, fp)
    }
  }

  /** A binary media object as it would arrive from a lake table. */
  final case class MediaObject(doc_id: Long, payload: Array[Byte])

  /** Header metadata the real kernel extracts: images fill
    * (width, height, n_frames); audio fills (sample_rate, channels,
    * duration_micros); a corrupt payload maps to format "unknown" (the
    * quarantine lane) instead of failing the scan.
    */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      channels: Int,
      duration_micros: Long)

  /** Synthesize header-accurate media payloads from deterministic
    * per-document parameters: src1→PNG, src2→JPEG, src3→GIF (frame count
    * doc_id%10+1), everything else→WAV (rate 8000+4000·(doc_id%8),
    * doc_id%2+1 channels, 16-bit, data size = the text's UTF-8 byte count).
    * The oracle recomputes these parameters in SQL; the kernel must recover
    * them FROM THE BYTES.
    */
  def mediaObjects(s: SparkSession, dir: String): Dataset[MediaObject] = {
    import s.implicits._
    import graft.functions.MediaGen
    // costFactor: the kernel SYNTHESIZES payloads far larger than its
    // input rows (PNG/GIF buffers scale with doc_id-derived dimensions,
    // not input bytes), so per-input-byte CPU sits an order of magnitude
    // above the wire-codec class the fan-out target is calibrated for.
    graft.operators.Tables.fanOut(
        Tables.documents(s, dir).select("doc_id", "text", "source"),
        costFactor = 8)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (id, text, source) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val w = (id % 640 + 1).toInt
          val h = (id % 480 + 1).toInt
          val payload = source match {
            case "src1" => MediaGen.png(w, h, bytes)
            case "src2" => MediaGen.jpeg(w, h)
            case "src3" => MediaGen.gif(w, h, (id % 10 + 1).toInt)
            case _ => MediaGen.wav((8000 + (id % 8) * 4000).toInt, (id % 2 + 1).toInt, 16, bytes.length.toLong)
          }
          MediaObject(id, payload)
        }
      }
  }

  /** The REAL decode kernel: sniff each payload's container by magic number
    * and parse its header fields byte-by-byte
    * ([[graft.functions.MediaHeaders]]), streaming row-by-row within the
    * partition — header parsing has no per-batch setup to amortize, so no
    * artificial batching (unlike a model/codec kernel, which would batch à
    * la `mapInPandas`). No shuffle — decode parallelism == scan
    * parallelism; malformed payloads land in format "unknown".
    */
  def decodeMetadata(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaObjects(s, dir).mapPartitions(_.map(parseOne))
  }

  private def parseOne(m: MediaObject): MediaMeta = {
    import graft.functions.MediaHeaders
    MediaHeaders.detect(m.payload) match {
      case Some("wav") =>
        MediaHeaders.parseWav(m.payload) match {
          case Some(a) =>
            MediaMeta(m.doc_id, a.format, 0, 0, 0, a.sampleRate, a.channels, a.durationMicros)
          case None => unknown(m.doc_id)
        }
      case Some(_) =>
        MediaHeaders.parseImage(m.payload) match {
          case Some(i) => MediaMeta(m.doc_id, i.format, i.width, i.height, i.frames, 0, 0, 0L)
          case None => unknown(m.doc_id)
        }
      case None => unknown(m.doc_id)
    }
  }

  private def unknown(docId: Long): MediaMeta = MediaMeta(docId, "unknown", 0, 0, 0, 0, 0, 0L)

  /** Oracle-checked per-format digest of the PARSED header fields — passing
    * means the kernel recovered dimensions, frame counts, sample rates, and
    * durations from the binary payloads that the oracle derived from the
    * generation parameters.
    */
  def mediaMetadata(s: SparkSession, dir: String): DataFrame =
    decodeMetadata(s, dir)
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("width").as("sum_width"),
        sum("height").as("sum_height"),
        sum("n_frames").as("sum_frames"),
        sum("sample_rate").as("sum_rate"),
        sum("channels").as("sum_channels"),
        sum("duration_micros").as("sum_duration_micros"))
      .orderBy("format")

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
      // resize stage (brief: decode / feature-extract / RESIZE /
      // frame-sample): aspect-preserving fit into a 256×256 box, integer
      // math only so the oracle reproduces it bit-for-bit. Only downscales;
      // media already inside the box keeps its dimensions.
      .withColumn("long_side", greatest(col("width"), col("height")).cast("long"))
      .withColumn("resize_w", expr(
        s"CASE WHEN long_side <= $ResizeBox THEN width " +
          s"ELSE greatest(1L, (CAST(width AS BIGINT) * $ResizeBox) div long_side) END"))
      .withColumn("resize_h", expr(
        s"CASE WHEN long_side <= $ResizeBox THEN height " +
          s"ELSE greatest(1L, (CAST(height AS BIGINT) * $ResizeBox) div long_side) END"))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_bytes").as("sum_bytes"),
        sum("n_frames").as("sum_frames"),
        sum("n_sampled").as("sum_sampled"),
        sum("resize_w").as("sum_rw"),
        sum("resize_h").as("sum_rh"),
        min("fingerprint").as("min_fp"))

  /** Resize target box (longest side after the aspect-preserving fit). */
  val ResizeBox = 256
}
