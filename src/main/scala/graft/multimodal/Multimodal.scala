package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media blob: opaque bytes + typed metadata. The schema a 100 TB
  * multimodal corpus table uses — media is NEVER parsed at the relational
  * layer, only by the partition-local decode stage.
  */
case class MediaRow(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    content: Array[Byte],
    source: String)

/** Decoded per-blob features (the output of the decode/feature stage). */
case class MediaFeature(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    fingerprint: String,
    width: Int,
    height: Int,
    n_frames: Int,
    ok: Boolean)

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Real in this module: the binary-column schema, the partition-parallel
  * batch shape (`mapPartitions` — one decoder init per partition, the same
  * contract a Pandas-batch UDF gives PySpark), the feature schema, and the
  * resize/frame-sample dataflow.
  *
  * STUBBED — clearly and deliberately: `decodeStub` stands in for a real
  * image/audio decoder (no media libraries ship in this environment). It is
  * a deterministic function of the bytes, so tests are exact; swapping in a
  * real decoder changes ONE function and nothing about the dataflow.
  *
  * Scale notes: decode is embarrassingly parallel and pipelined per
  * partition (no shuffle); feature output is tiny vs input, so the stage is
  * I/O-bound on the media scan — exactly what you want at 100 TB. Blobs
  * larger than ~2 GB must be chunked upstream (parquet binary + JVM array
  * limits), the same constraint any engine has.
  */
object Multimodal {

  /** Deterministic fake decode: header-derived pseudo-dimensions.
    * REPLACE with a real decoder (e.g. javax.imageio / ffmpeg bindings)
    * when the runtime has them — keep the signature.
    */
  private[multimodal] def decodeStub(mediaType: String, bytes: Array[Byte]): (Int, Int, Int, Boolean) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0, false)
    else {
      val h = java.util.Arrays.hashCode(bytes)
      val width = 16 + math.abs(h % 1024)
      val height = 16 + math.abs((h / 1024) % 1024)
      val frames = mediaType match {
        case "video" => 1 + (bytes.length / 4096)
        case "audio" => 1 + (bytes.length / 1024)
        case _ => 1
      }
      (width, height, frames, true)
    }
  }

  /** Decode + feature-extract, one decoder context per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // partition-local init happens HERE (decoder handles, model weights…)
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { r =>
        val (w, h, f, ok) = decodeStub(r.media_type, r.content)
        digest.reset()
        val fp = digest.digest(if (r.content == null) Array.empty else r.content)
          .take(8).map("%02x".format(_)).mkString
        MediaFeature(r.media_id, r.media_type,
          if (r.content == null) 0L else r.content.length.toLong,
          fp, w, h, f, ok)
      }
    }
  }

  /** Frame sampling: every `stride`-th chunk of a video/audio blob as its
    * own row — the explode-shaped stage that feeds per-frame models.
    * Chunking is columnar (`substring` on binary) — no UDF on the hot path.
    */
  def sampleChunks(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_chunks",
        ceil(length(col("content")) / lit(chunkBytes.toDouble)).cast("int"))
      .withColumn("chunk_idx",
        explode(when(col("n_chunks") > 0,
            sequence(lit(0), col("n_chunks") - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))))
      .select(
        col("media_id"), col("media_type"), col("chunk_idx"),
        expr(s"substring(content, chunk_idx * $chunkBytes + 1, $chunkBytes)")
          .as("chunk"))

  /** Deterministic synthetic media table derived from `documents` — the
    * test corpus has no real media; payload bytes are the doc text, typed
    * round-robin. Lets every multimodal stage run at any scale factor.
    */
  def syntheticFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      col("source"))
      .as[MediaRow]
  }
}
