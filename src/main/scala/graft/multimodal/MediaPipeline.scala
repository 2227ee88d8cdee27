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

  // ---- PNG pixel payloads (real IDAT) ---------------------------------

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length)
    bb.put(tpe.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(tpe.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Deterministic 8-bit grayscale test image: seed-driven gradient +
    * interference pattern. Values stay in [0, 229) so brightness-shift
    * experiments have headroom before the byte clamps. */
  private[graft] def pixelPattern(width: Int, height: Int, seed: Long): Array[Byte] = {
    val px = new Array[Byte](width * height)
    val a = 3 + (seed % 5); val b = 2 + (seed % 7); val c = seed % 11
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        px(y * width + x) =
          ((x * a + y * b + ((x.toLong * y) % 13) * c + seed * 31) % 229).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** REAL PNG with a pixel payload: 8-bit grayscale, zlib-deflated
    * IDAT, scanline filters cycling 0..4 so a decoder must implement
    * every PNG filter (None/Sub/Up/Average/Paeth) to read it back. */
  private[graft] def pngPixelBytes(width: Int, height: Int,
                                   pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height, "pixel buffer/dims mismatch")
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      val f = y % 5
      raw(y * (width + 1)) = f.toByte
      var x = 0
      while (x < width) {
        val cur = pixels(y * width + x) & 0xff
        val left = if (x > 0) pixels(y * width + x - 1) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * width + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) pixels((y - 1) * width + x - 1) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (width + 1) + 1 + x) = filtered.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) out.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val ihdrData = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type: grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    PngSig ++ chunk("IHDR", ihdrData) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** REAL PNG pixel decode for 8-bit grayscale non-interlaced streams:
    * chunk walk (IHDR first, ALL IDAT chunks concatenated, stop at
    * IEND), zlib inflate, and all five scanline unfilters — the
    * codec-level step the header-only decode stops short of.
    * Cross-checked pixel-for-pixel against javax.imageio in
    * MediaPipelineSpec. Returns None (never throws) on anything
    * malformed, truncated, or unsupported — the dead-letter contract. */
  private[graft] def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (bytes.length < 8 || !bytes.take(8).sameElements(PngSig)) return None
    var off = 8
    var w = 0; var h = 0; var headerOk = false
    val idat = new java.io.ByteArrayOutputStream
    var done = false
    while (!done && off + 8 <= bytes.length) {
      val bb = java.nio.ByteBuffer.wrap(bytes, off, 8)
      val len = bb.getInt
      val tpe = { val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII") }
      if (len < 0 || off + 12 + len > bytes.length) return None
      tpe match {
        case "IHDR" =>
          if (len != 13) return None
          val d = java.nio.ByteBuffer.wrap(bytes, off + 8, 13)
          w = d.getInt; h = d.getInt
          val bitDepth = d.get(); val colorType = d.get()
          d.get(); d.get() // compression, filter method
          val interlace = d.get()
          headerOk = bitDepth == 8 && colorType == 0 && interlace == 0 &&
            w > 0 && h > 0 && w.toLong * h <= (1L << 26)
        case "IDAT" =>
          if (!headerOk) return None
          idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    if (!headerOk || idat.size == 0) return None
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (w + 1))
    var got = 0
    while (got < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, got, raw.length - got)
      if (n == 0 && inflater.needsInput()) { inflater.end(); return None }
      got += n
    }
    inflater.end()
    if (got != raw.length) return None
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      if (f > 4) return None
      var x = 0
      while (x < w) {
        val v = raw(y * (w + 1) + 1 + x) & 0xff
        val left = if (x > 0) px(y * w + x - 1) & 0xff else 0
        val up = if (y > 0) px((y - 1) * w + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
        val rec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case _ => v + paeth(left, up, ul)
        }
        px(y * w + x) = rec.toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit average perceptual hash (aHash): 8×8 box-mean grid over
    * the pixel raster, bit set where the cell mean exceeds the global
    * mean of cell means. Integer arithmetic only (cell value = sum×64
    * / count) — bit-stable across machines AND exactly invariant to a
    * global brightness shift (every cell and the mean move by the same
    * amount; asserted in spec). Requires w,h >= 8 so no cell is empty.
    * MSB = cell (0,0), row-major. */
  private[graft] def aHash(w: Int, h: Int, px: Array[Byte]): Long = {
    val cells = new Array[Long](64)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 8) {
        val x0 = gx * w / 8; val x1 = (gx + 1) * w / 8
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x) & 0xff; n += 1; x += 1 }
          y += 1
        }
        cells(gy * 8 + gx) = if (n == 0) 0L else s * 64 / n
        gx += 1
      }
      gy += 1
    }
    val mean = cells.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) bits |= (1L << (63 - i))
      i += 1
    }
    bits
  }

  // ---- JPEG (baseline SOF0, grayscale) --------------------------------
  // Real crawl corpora are overwhelmingly JPEG; this completes the
  // image codec story the zlib-IDAT PNG path started. The DECODER is
  // general baseline JPEG for one grayscale component: marker walk,
  // DQT/DHT table parsing (any canonical huffman tables, not just the
  // ones this encoder writes), byte-unstuffed entropy decode with
  // restart-marker tolerance, dequantization, separable float IDCT —
  // it reads ImageIO-written JPEGs (asserted in MediaPipelineSpec).
  // The ENCODER writes DC-only streams (every 8×8 block constant):
  // still a fully standard SOF0 JPEG any decoder reads, chosen because
  // a constant block survives the DCT round-trip EXACTLY (only the DC
  // coefficient is nonzero, quant 8 divides 8·(v−128) evenly), which
  // is what lets the image-dedup hash oracle reconstruct JPEG assets
  // closed-form the way it does PNG rasters — lossy-in-general,
  // lossless on these streams.

  /** Transmission (zigzag) order → natural (row·8+col) position. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** DC luminance huffman spec (JPEG Annex K): code counts per length
    * 1..16, then the category symbols 0..11. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Byte] = (0 to 11).map(_.toByte).toArray
  /** Minimal AC table: this encoder emits only EOB (symbol 0x00); a
    * one-symbol canonical table (single 1-bit code) is legal DHT. */
  private val AcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Byte] = Array(0x00)

  /** Canonical huffman assignment: symbol → (code, length). */
  private def huffCodes(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var code = 0; var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m(vals(k) & 0xff) = (code, len); code += 1; k += 1; i += 1
      }
      code <<= 1; len += 1
    }
    m.toMap
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); n += 1
        if (n == 8) flush()
        i -= 1
      }
    }
    private def flush(): Unit = {
      out.write(acc & 0xff)
      if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
      acc = 0; n = 0
    }
    def finish(): Array[Byte] = {
      if (n > 0) { acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1); n = 8; flush() }
      out.toByteArray
    }
  }

  private def jpegSeg(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    Array(0xff.toByte, marker.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
  }

  /** Per-block grayscale values from a cluster seed — the JPEG twin of
    * [[pixelPattern]], at 8×8-block granularity so the encoded stream
    * is DC-only (see the section comment). Same modulus/param family
    * as the PNG pattern, different mixing so the two format families
    * never hash-collide into one cluster. */
  private[graft] def blockPattern(seed: Long): Array[Int] = {
    val a = 3 + (seed % 5); val b = 2 + (seed % 7); val c = seed % 11
    Array.tabulate(64) { i =>
      val gx = i % 8; val gy = i / 8
      ((gx * a + gy * b + ((gx.toLong * gy) % 5) * c + seed * 37) % 229).toInt
    }
  }

  /** Encode a block-constant grayscale image as a REAL baseline JPEG:
    * SOI, DQT (DC quant 8 — divides every 8·(v−128) exactly), SOF0,
    * DHT ×2, SOS, huffman-coded DC diffs + EOB per block, EOI. */
  private[graft] def jpegBlockBytes(width: Int, height: Int,
                                    blockVals: Array[Int]): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "dims must be multiples of 8")
    val (bw, bh) = (width / 8, height / 8)
    require(blockVals.length == bw * bh, "block buffer/dims mismatch")
    val qt = new Array[Byte](64)
    qt(0) = 8 // DC slot (zigzag 0); AC slots irrelevant for DC-only
    java.util.Arrays.fill(qt, 1, 64, 16.toByte)
    val out = new java.io.ByteArrayOutputStream
    out.write(Array(0xff.toByte, 0xd8.toByte)) // SOI
    out.write(jpegSeg(0xdb, 0x00.toByte +: qt)) // DQT Pq=0 Tq=0
    out.write(jpegSeg(0xc0, Array[Byte](8, // SOF0: precision
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      1, 1, 0x11, 0))) // 1 component, id 1, 1×1 sampling, quant 0
    out.write(jpegSeg(0xc4, 0x00.toByte +: (DcBits.map(_.toByte) ++ DcVals)))
    out.write(jpegSeg(0xc4, 0x10.toByte +: (AcBits.map(_.toByte) ++ AcVals)))
    out.write(jpegSeg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))) // SOS
    val dcCodes = huffCodes(DcBits, DcVals)
    val (eobCode, eobLen) = huffCodes(AcBits, AcVals)(0x00)
    val bits = new BitWriter
    var prev = 0
    var i = 0
    while (i < blockVals.length) {
      val level = blockVals(i) - 128 // quantized DC: 8·(v−128) / q=8
      val diff = level - prev
      prev = level
      val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCodes(s)
      bits.put(c, l)
      if (s > 0) bits.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bits.put(eobCode, eobLen)
      i += 1
    }
    out.write(bits.finish())
    out.write(Array(0xff.toByte, 0xd9.toByte)) // EOI
    out.toByteArray
  }

  /** Entropy-segment reader: byte-unstuffs FF00, transparently skips
    * restart markers (resetting the bit accumulator; the caller resets
    * the DC predictor via [[restartSeen]]), stops at any other marker. */
  private final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0
    private var n = 0
    var restartSeen = false
    private def fill(): Boolean = {
      while (n <= 24) {
        if (pos >= bytes.length) return n > 0
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 >= bytes.length) return n > 0
          val m = bytes(pos + 1) & 0xff
          if (m == 0x00) { // stuffed: a literal FF data byte
            acc = (acc << 8) | 0xff; n += 8; pos += 2
          } else if (m >= 0xd0 && m <= 0xd7) { // RSTn: byte-align + reset
            pos += 2; acc = 0; n = 0; restartSeen = true
          } else return n > 0 // real marker: scan is over
        } else {
          acc = (acc << 8) | b; n += 8; pos += 1
        }
      }
      true
    }
    def bit(): Int = {
      if (n == 0 && !fill()) return -1
      if (n == 0) return -1
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { val b = bit(); if (b < 0) return -1; v = (v << 1) | b; i += 1 }
      v
    }
  }

  /** Canonical huffman decode tables per (class, id): for each code
    * length, the first code value and the index of its first symbol. */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1); k += bits(len - 1)
        maxCode(len) = if (bits(len - 1) > 0) code - 1 else -1
        code <<= 1; len += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = 0
      var len = 1
      while (len <= 16) {
        val b = r.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(len) >= 0 && code <= maxCode(len) && code >= minCode(len))
          return vals(valPtr(len) + code - minCode(len)) & 0xff
        len += 1
      }
      -1
    }
  }

  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val CScale: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Separable 2D IDCT-III of one dequantized block (natural order),
    * level-shifted and clamped to [0, 255]. */
  private def idctBlock(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: u → x
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CScale(u) * coef(y * 8 + u) * CosT(x)(u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var x = 0
    while (x < 8) { // cols: v → y
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CScale(v) * tmp(v * 8 + x) * CosT(yy)(v); v += 1 }
        val r = math.round(s / 4.0 + 128.0).toInt
        out(yy * 8 + x) = math.max(0, math.min(255, r))
        yy += 1
      }
      x += 1
    }
    out
  }

  private def extendJpeg(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** General baseline-JPEG decode of ONE grayscale component:
    * `(width, height, row-major pixels)`, None on anything malformed,
    * progressive (SOF2), multi-component, or 16-bit. */
  private[graft] def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = try {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var off = 2
    var w = 0; var h = 0
    var sofSeen = false
    var compQt = 0
    val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
    val dcTables = scala.collection.mutable.Map.empty[Int, HuffTable]
    val acTables = scala.collection.mutable.Map.empty[Int, HuffTable]
    var scanTd = 0; var scanTa = 0
    var scanStart = -1
    while (scanStart < 0) {
      if (off + 4 > bytes.length) return None
      if ((bytes(off) & 0xff) != 0xff) return None
      val marker = bytes(off + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS
      val len = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
      if (len < 2 || off + 2 + len > bytes.length) return None
      val p = off + 4
      marker match {
        case 0xdb => // DQT: one or more tables
          var q = p
          while (q < off + 2 + len) {
            val pq = (bytes(q) & 0xf0) >> 4
            val tq = bytes(q) & 0x0f
            if (pq != 0) return None // 16-bit tables unsupported
            if (q + 65 > off + 2 + len) return None
            quant(tq) = Array.tabulate(64)(i => bytes(q + 1 + i) & 0xff)
            q += 65
          }
        case 0xc0 => // SOF0 baseline
          if (bytes(p) != 8) return None
          h = ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) & 0xff)
          w = ((bytes(p + 3) & 0xff) << 8) | (bytes(p + 4) & 0xff)
          val ncomp = bytes(p + 5) & 0xff
          if (ncomp != 1 || w <= 0 || h <= 0 || w.toLong * h > (1L << 26))
            return None
          compQt = bytes(p + 8) & 0x0f // sampling irrelevant for 1 comp
          sofSeen = true
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive / extended / arithmetic
        case 0xc4 => // DHT: one or more tables
          var q = p
          while (q < off + 2 + len) {
            val tc = (bytes(q) & 0xf0) >> 4
            val th = bytes(q) & 0x0f
            val counts = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
            val nv = counts.sum
            if (q + 17 + nv > off + 2 + len) return None
            val vals = java.util.Arrays.copyOfRange(bytes, q + 17, q + 17 + nv)
            val t = new HuffTable(counts, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            q += 17 + nv
          }
        case 0xda => // SOS
          if (!sofSeen) return None
          if ((bytes(p) & 0xff) != 1) return None
          scanTd = (bytes(p + 2) & 0xf0) >> 4
          scanTa = bytes(p + 2) & 0x0f
          scanStart = off + 2 + len
        case _ => () // APPn / COM / DRI — skipped (RSTs handled inline)
      }
      off += 2 + len
    }
    val qt = quant.getOrElse(compQt, return None)
    val dcT = dcTables.getOrElse(scanTd, return None)
    val acT = acTables.getOrElse(scanTa, return None)
    val (bw, bh) = ((w + 7) / 8, (h + 7) / 8)
    val px = new Array[Byte](w * h)
    val r = new BitReader(bytes, scanStart)
    var dc = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (r.restartSeen) { dc = 0; r.restartSeen = false }
        val coef = new Array[Int](64)
        val s = dcT.decode(r)
        if (s < 0 || s > 15) return None
        val dv = if (s == 0) 0 else { val v = r.bits(s); if (v < 0) return None; extendJpeg(v, s) }
        dc += dv
        coef(0) = dc * qt(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = acT.decode(r)
          if (rs < 0) return None
          val run = rs >> 4
          val size = rs & 0x0f
          if (size == 0) {
            if (run == 15) k += 16 else eob = true // ZRL vs EOB
          } else {
            k += run
            if (k > 63) return None
            val v = r.bits(size)
            if (v < 0) return None
            coef(Zigzag(k)) = extendJpeg(v, size) * qt(k)
            k += 1
          }
        }
        val block = idctBlock(coef)
        var yy = 0
        while (yy < 8) {
          val py = by * 8 + yy
          if (py < h) {
            var xx = 0
            while (xx < 8) {
              val pxx = bx * 8 + xx
              if (pxx < w) px(py * w + pxx) = block(yy * 8 + xx).toByte
              xx += 1
            }
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    Some((w, h, px))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Format-sniffing image decode: JPEG by FFD8 magic, else PNG. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (bytes != null && bytes.length >= 2 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) decodeJpeg(bytes)
    else decodePixels(bytes)

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

  // ---- WAV with real PCM payload --------------------------------------

  /** Full WAV stream: canonical header with CORRECT RIFF/data sizes +
    * the 16-bit little-endian mono PCM samples. */
  private[graft] def wavPcmBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                   // PCM
    bb.putShort(1)                   // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)        // byte rate
    bb.putShort(2)                   // block align
    bb.putShort(16)                  // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** REAL PCM decode: verify RIFF/WAVE, walk sub-chunks to `fmt ` and
    * `data` (tolerating extra chunks in between, the way real WAV
    * files carry LIST/INFO), return (sampleRate, samples). None on
    * anything malformed or non-16-bit-mono-PCM — never throws. */
  private[graft] def decodeSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] = try {
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    if (bytes.length < 12 || ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    var off = 12
    var rate = -1
    var fmtOk = false
    while (off + 8 <= bytes.length) {
      val tpe = ascii(off, 4)
      val len = java.nio.ByteBuffer.wrap(bytes, off + 4, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      if (len < 0 || off + 8 + len > bytes.length) return None
      tpe match {
        case "fmt " =>
          if (len < 16) return None
          val f = java.nio.ByteBuffer.wrap(bytes, off + 8, 16)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val codec = f.getShort; val channels = f.getShort
          rate = f.getInt
          f.getInt; f.getShort // byte rate, block align
          val bits = f.getShort
          fmtOk = codec == 1 && channels == 1 && bits == 16 && rate > 0
        case "data" =>
          if (!fmtOk || len % 2 != 0) return None
          val out = new Array[Short](len / 2)
          val d = java.nio.ByteBuffer.wrap(bytes, off + 8, len)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < out.length) { out(i) = d.getShort; i += 1 }
          return Some((rate, out))
        case _ => () // skip LIST/INFO etc.
      }
      off += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic integer sawtooth test signal, closed-form enough
    * for a SQL oracle to reconstruct exactly: `pre` silent samples,
    * then `v(i) = ((i % period) * 2 * amp) / period - amp` (all
    * integer ops, floor division on non-negative operands — identical
    * in JVM and DuckDB). */
  private[graft] def sawtooth(n: Int, pre: Int, period: Int, amp: Int): Array[Short] = {
    val out = new Array[Short](n)
    var i = pre
    while (i < n) {
      out(i) = (((i % period) * 2 * amp) / period - amp).toShort
      i += 1
    }
    out
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

  /** Bytes per synthesized video frame (see frameByte). */
  private[graft] val FrameBytes = 32

  /** Closed-form frame payload byte: scene-structured so consecutive
    * frames within a 5-frame scene differ by exactly +3 per byte
    * (L1 = 96) while scene boundaries re-derive the base pattern — a
    * detectable jump. Values stay < 212, no byte wrap, so the SQL
    * oracle reproduces every byte with plain integer arithmetic. */
  private[graft] def frameByte(h: Long, f: Int, j: Int): Int =
    (((h + (f / 5) * 53 + j * 11) % 200) + (f % 5) * 3).toInt

  /** Real ISO-BMFF stream WITH an mdat payload: the structural boxes
    * of mp4Bytes plus nFrames × 32-byte frame blocks. */
  private[graft] def mp4BytesWithFrames(width: Int, height: Int,
                                        nFrames: Int, h: Long): Array[Byte] = {
    val frames = new Array[Byte](nFrames * FrameBytes)
    var f = 0
    while (f < nFrames) {
      var j = 0
      while (j < FrameBytes) {
        frames(f * FrameBytes + j) = frameByte(h, f, j).toByte
        j += 1
      }
      f += 1
    }
    mp4Bytes(width, height, nFrames) ++ box("mdat", frames)
  }

  /** REAL mdat decode: walk top-level boxes to `mdat`, slice the
    * payload into 32-byte frames. None on missing/ragged payloads. */
  private[graft] def decodeFrames(bytes: Array[Byte]): Option[Array[Array[Byte]]] = try {
    var off = 0
    while (off + 8 <= bytes.length) {
      val bb = java.nio.ByteBuffer.wrap(bytes, off, 8)
      val size = bb.getInt
      val tpe = { val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII") }
      if (size < 8 || off + size > bytes.length) return None
      if (tpe == "mdat") {
        val len = size - 8
        if (len % FrameBytes != 0) return None
        return Some(Array.tabulate(len / FrameBytes)(f =>
          java.util.Arrays.copyOfRange(bytes,
            off + 8 + f * FrameBytes, off + 8 + (f + 1) * FrameBytes)))
      }
      off += size
    }
    None
  } catch { case scala.util.control.NonFatal(_) => None }

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

  /** Decoded per-asset audio features — integers end to end so the
    * closed-form oracle matches bit-for-bit. */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Long,
      n_samples: Long,
      n_silent: Long,
      peak: Long,
      rms2: Long,
      zero_crossings: Long,
      decode_ok: Boolean)

  /** Synthesize per-doc WAV payloads with REAL PCM data: a silent
    * prefix + an integer sawtooth whose parameters derive from
    * md5(text) — every parameter (and therefore every decoded sample)
    * is predictable by the SQL oracle, while the Spark path must
    * round-trip the actual little-endian bytes to agree. */
  def attachAudio(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (docId, text) =>
        val h = contentHash(text.getBytes("UTF-8"))
        val sr = (8000L * (1L + h % 6L)).toInt
        val n = (2000L + (h / 7L) % 1000L).toInt
        val pre = ((h / 11L) % 400L).toInt
        val period = (20L + (h / 13L) % 50L).toInt
        val amp = (1000L + ((h / 17L) % 9L) * 1000L).toInt
        MediaAsset(docId, "audio", wavPcmBytes(sr, sawtooth(n, pre, period, amp)))
    }
  }

  /** PCM decode + one-pass integer feature extraction per partition:
    * silence count, peak, mean square (floor), and zero crossings
    * (sign products strictly negative — zeros break a crossing, the
    * convention the oracle mirrors). Failed decodes dead-letter. */
  def audioFeatures(spark: SparkSession, assets: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeSamples(a.content) match {
          case Some((rate, s)) =>
            var i = 0
            var silent = 0L; var peak = 0L; var sq = 0L; var zc = 0L
            while (i < s.length) {
              val v = s(i).toLong
              if (v == 0L) silent += 1
              val av = math.abs(v)
              if (av > peak) peak = av
              sq += v * v
              if (i > 0 && v * s(i - 1).toLong < 0L) zc += 1
              i += 1
            }
            val n = s.length.toLong
            AudioFeatures(a.doc_id, rate.toLong, n, silent, peak,
              if (n == 0) 0L else sq / n, zc, decode_ok = true)
          case None =>
            AudioFeatures(a.doc_id, 0L, 0L, 0L, 0L, 0L, 0L, decode_ok = false)
        }
      }
    }
  }

  /** Decoded per-asset video motion features — integers end to end. */
  final case class VideoFeatures(
      doc_id: Long,
      n_frames: Long,
      total_l1: Long,
      n_cuts: Long,
      max_frame_l1: Long,
      decode_ok: Boolean)

  /** Synthesize per-doc MP4s with REAL mdat frame payloads: scene-
    * structured 32-byte frames whose every byte the SQL oracle can
    * reconstruct (frameByte), 2-10 scenes of 5 frames each. */
  def attachVideo(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (docId, text) =>
        val h = contentHash(text.getBytes("UTF-8"))
        val n = (10L + (h / 19L) % 41L).toInt // 10..50 frames
        MediaAsset(docId, "video", mp4BytesWithFrames(64, 48, n, h))
    }
  }

  /** mdat decode + one-pass motion features per partition: per-frame
    * L1 distance to the previous frame, scene cuts where L1 > 200
    * (in-scene motion is exactly 96). Dead-letter on malformed. */
  def videoFeatures(spark: SparkSession, assets: Dataset[MediaAsset]): Dataset[VideoFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeFrames(a.content) match {
          case Some(frames) =>
            var total = 0L; var cuts = 0L; var mx = 0L
            var f = 1
            while (f < frames.length) {
              var l1 = 0L
              var j = 0
              while (j < FrameBytes) {
                l1 += math.abs((frames(f)(j) & 0xff) - (frames(f - 1)(j) & 0xff))
                j += 1
              }
              total += l1
              if (l1 > 200L) cuts += 1
              if (l1 > mx) mx = l1
              f += 1
            }
            VideoFeatures(a.doc_id, frames.length.toLong, total, cuts, mx,
              decode_ok = true)
          case None => VideoFeatures(a.doc_id, 0L, 0L, 0L, 0L, decode_ok = false)
        }
      }
    }
  }

  /** Synthesize per-doc grayscale images with PLANTED near-dup
    * structure, split across the two real codecs a crawl corpus mixes:
    * EVEN doc_ids get a PNG (per-pixel [[pixelPattern]] + ~10
    * single-pixel perturbations through genuine zlib IDAT + cycling
    * filters), ODD doc_ids get a baseline JPEG ([[blockPattern]] at
    * 8×8-block granularity + 2 block perturbations — DC-only, so the
    * lossy codec is exactly lossless on these streams and the dedup
    * oracle can reconstruct them closed-form). Perturbations are small
    * enough that aHash stays within a few bits of the cluster's hash.
    * Fully deterministic from doc_id (hash-oracle + spec gate need
    * replays to agree). */
  def attachPixelImages(docs: DataFrame, nClusters: Int = 40): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { docId =>
      if (docId % 2 == 1) {
        val bv = blockPattern(docId % nClusters)
        var i = 0
        while (i < 2) {
          val pos = (math.abs(docId * 2654435761L + i * 48271L) % 64).toInt
          bv(pos) = (bv(pos) + 7) % 229
          i += 1
        }
        MediaAsset(docId, "image", jpegBlockBytes(64, 64, bv))
      } else {
        val px = pixelPattern(64, 64, docId % nClusters)
        var i = 0
        while (i < 10) {
          val pos = (math.abs(docId * 2654435761L + i * 40503L) % px.length).toInt
          px(pos) = (((px(pos) & 0xff) + 7) % 229).toByte
          i += 1
        }
        MediaAsset(docId, "image", pngPixelBytes(64, 64, px))
      }
    }
  }

  /** Pixel decode + perceptual hash, one decoder per partition,
    * format-sniffed per asset (JPEG by magic, else PNG):
    * `(doc_id, ahash, decode_ok)`. Failed decodes dead-letter with
    * ahash 0 rather than killing the stage. */
  def imageHashes(spark: SparkSession, assets: Dataset[MediaAsset]): DataFrame = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        decodeImage(a.content) match {
          case Some((w, h, px)) => (a.doc_id, aHash(w, h, px), true)
          case None => (a.doc_id, 0L, false)
        }
      }
    }.toDF("doc_id", "ahash", "decode_ok")
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
