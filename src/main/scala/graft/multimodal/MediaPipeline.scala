package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-decoded per partition.
  *
  * The decode itself is a STUB (no image/audio codecs in this
  * environment): `decodeStub` derives deterministic fake dimensions
  * from an md5-based content hash. Everything around it is the real
  * Spark shape a production decode would use — a typed
  * `Dataset[MediaAsset]`, `mapPartitions` so a native decoder library
  * is initialized once per partition (not per row), schema'd feature
  * structs out. Swapping `decodeStub` for a real JNI/FFI decoder
  * changes no plumbing.
  *
  * At scale: payload bytes stay columnar in parquet, partitions are
  * sized by `spark.sql.files.maxPartitionBytes`, and the decode is
  * embarrassingly parallel — no shuffle anywhere in the pipeline.
  */
object MediaPipeline {

  /** An opaque media payload + envelope metadata. */
  final case class MediaAsset(
      doc_id: Long,
      media_type: String,
      content: Array[Byte])

  /** Decoded (stubbed) per-asset features. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long)

  /** Same 60-bit md5 prefix hash as TextOps.portableHash, computed
    * JVM-side for the mapPartitions path. */
  private[multimodal] def contentHash(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Deterministic fake decode — stands in for a real codec (???). */
  private[multimodal] def decodeStub(a: MediaAsset): MediaFeatures = {
    val h = contentHash(a.content)
    val nBytes = a.content.length.toLong
    MediaFeatures(
      doc_id = a.doc_id,
      media_type = a.media_type,
      n_bytes = nBytes,
      width = 64L + h % 1216L,
      height = 64L + (h / 1216L) % 656L,
      n_frames = if (a.media_type == "video") 1L + nBytes % 30L else 1L)
  }

  /** Synthesize binary payloads from `documents` (stand-in for real
    * blob columns; utf-8 text bytes). media_type cycles by doc_id. */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"))

  /** The batch decode: one decoder per partition, features out. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions { it =>
      // real pipeline: initialize the native decoder once here
      it.map(decodeStub)
    }
  }

  /** Aspect-preserving resize to a `maxDim` cap on the longer side,
    * never upscaling — REAL integer arithmetic (not a stub): the
    * geometry a production thumbnailer computes before handing the
    * target dims to the codec. Exact in both engines (operands ≪ 2⁵³,
    * floor of an exact ratio ≡ integer division). */
  def resizeCols(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
                 maxDim: Long): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val noScale = greatest(w, h) <= maxDim
    val ow = when(noScale, w)
      .when(w >= h, lit(maxDim))
      .otherwise(greatest(lit(1L), floor(w * maxDim / h).cast("long")))
    val oh = when(noScale, h)
      .when(w >= h, greatest(lit(1L), floor(h * maxDim / w).cast("long")))
      .otherwise(lit(maxDim))
    (ow, oh)
  }

  /** Frame sampling: every `everyK`-th frame of each video asset,
    * exploded to one row per sampled frame with the resize target dims
    * and a per-frame fingerprint (stands in for the per-frame decode;
    * deterministic from the decoded features + index, SQL-mirrored).
    * The plumbing under test: generator over the frame index space,
    * schema'd per-frame rows, no shuffle — at 100 TB this is the shape
    * that fans a video corpus out to frame-level training rows. */
  def sampleFrames(features: DataFrame, everyK: Int, maxDim: Long): DataFrame = {
    val (ow, oh) = resizeCols(col("width"), col("height"), maxDim)
    features.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, lit(everyK.toLong))))
      .select(col("doc_id"), col("frame_idx"),
        ((col("width") * 131 + col("height")) * 1000003L + col("frame_idx") * 97L)
          .as("frame_fp"),
        ow.as("out_width"), oh.as("out_height"))
  }
}
