package graft

import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline.MediaAsset
import org.scalatest.funsuite.AnyFunSuite

/** Binary header parsing: PNG IHDR and WAV fmt round-trips, signature
  * verification, and the corrupt-payload dead-letter contract. */
class MediaPipelineSpec extends AnyFunSuite {

  test("PNG synthesis round-trips width/height through IHDR parsing") {
    for ((w, h) <- Seq((1, 1), (64, 64), (1279, 719), (800, 600))) {
      val bytes = MediaPipeline.pngBytes(w, h)
      assert(bytes.length == 45)
      assert(MediaPipeline.parsePng(bytes).contains((w.toLong, h.toLong)))
    }
  }

  test("PNG parser rejects bad signature, truncation, and non-IHDR chunks") {
    val good = MediaPipeline.pngBytes(100, 50)
    val badSig = good.clone(); badSig(0) = 0x00
    assert(MediaPipeline.parsePng(badSig).isEmpty)
    assert(MediaPipeline.parsePng(good.take(20)).isEmpty)
    val badChunk = good.clone()
    badChunk(12) = 'X'.toByte // corrupt the IHDR type tag
    assert(MediaPipeline.parsePng(badChunk).isEmpty)
    assert(MediaPipeline.parsePng(Array.emptyByteArray).isEmpty)
  }

  test("WAV synthesis round-trips the sample rate through the fmt chunk") {
    for (sr <- Seq(8000, 16000, 44100, 48000)) {
      val bytes = MediaPipeline.wavBytes(sr)
      assert(bytes.length == 44)
      assert(MediaPipeline.parseWav(bytes).contains(sr.toLong))
    }
  }

  test("WAV parser rejects non-RIFF payloads and truncation") {
    assert(MediaPipeline.parseWav("not a wav at all, just text".getBytes).isEmpty)
    assert(MediaPipeline.parseWav(MediaPipeline.wavBytes(8000).take(20)).isEmpty)
  }

  test("MP4 synthesis round-trips dims and frame count through the box walk") {
    for ((w, h, nf) <- Seq((64, 64, 1), (1279, 719, 30), (800, 600, 15))) {
      val bytes = MediaPipeline.mp4Bytes(w, h, nf)
      assert(bytes.length == 232)
      assert(MediaPipeline.parseMp4(bytes).contains((w.toLong, h.toLong, nf.toLong)))
    }
  }

  test("MP4 parser rejects non-BMFF payloads, truncation, missing boxes") {
    assert(MediaPipeline.parseMp4("plain text, no boxes here".getBytes).isEmpty)
    val good = MediaPipeline.mp4Bytes(100, 50, 10)
    assert(MediaPipeline.parseMp4(good.take(40)).isEmpty) // moov truncated
    val noFtyp = good.clone(); noFtyp(4) = 'X'.toByte
    assert(MediaPipeline.parseMp4(noFtyp).isEmpty)
  }

  test("MP4 parser returns None (never throws) on short payloads and zero timescale") {
    // structurally valid boxes but mvhd payload too short for the
    // fixed field offsets: must be None, not IndexOutOfBounds
    def mkBox(t: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(t.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = java.nio.ByteBuffer.allocate(16).putInt(16)
      .put("ftyp".getBytes).put("isom".getBytes).putInt(0).array()
    val shortMvhd = mkBox("moov", mkBox("mvhd", new Array[Byte](4)) ++
      mkBox("trak", mkBox("tkhd", new Array[Byte](84))))
    assert(MediaPipeline.parseMp4(ftyp ++ shortMvhd).isEmpty)
    // zero timescale: division guard → None, not ArithmeticException
    val zeroTs = mkBox("moov", mkBox("mvhd", new Array[Byte](100)) ++
      mkBox("trak", mkBox("tkhd", new Array[Byte](84))))
    assert(MediaPipeline.parseMp4(ftyp ++ zeroTs).isEmpty)
    // and decode() degrades to dead-letter either way
    val f = MediaPipeline.decode(
      MediaPipeline.MediaAsset(1L, "video", ftyp ++ shortMvhd))
    assert(!f.decode_ok)
  }

  test("corrupt payloads decode to zeroed features with decode_ok=false") {
    val corrupt = MediaPipeline.decode(
      MediaAsset(1L, "image", "garbage".getBytes))
    assert(!corrupt.decode_ok && corrupt.width == 0 && corrupt.height == 0)
    val ok = MediaPipeline.decode(
      MediaAsset(2L, "image", MediaPipeline.pngBytes(320, 240)))
    assert(ok.decode_ok && ok.width == 320 && ok.height == 240 && ok.n_bytes == 45)
    val wav = MediaPipeline.decode(
      MediaAsset(3L, "audio", MediaPipeline.wavBytes(16000)))
    assert(wav.decode_ok && wav.sample_rate == 16000 && wav.width == 0)
  }

  test("PNG pixel encode/decode round-trips exactly through all five filters") {
    // heights > 5 force every filter row type; non-square exercises
    // the stride arithmetic
    for ((w, h, seed) <- Seq((64, 64, 0L), (40, 24, 7L), (9, 13, 3L))) {
      val px = MediaPipeline.pixelPattern(w, h, seed)
      val png = MediaPipeline.pngPixelBytes(w, h, px)
      val got = MediaPipeline.decodePixels(png)
      assert(got.isDefined, s"decode failed for ${w}x$h seed=$seed")
      val (gw, gh, gpx) = got.get
      assert((gw, gh) == ((w, h)))
      assert(gpx.sameElements(px), s"pixel mismatch for ${w}x$h seed=$seed")
    }
  }

  test("in-repo PNG decoder agrees pixel-for-pixel with javax.imageio") {
    val px = MediaPipeline.pixelPattern(64, 64, 11L)
    val png = MediaPipeline.pngPixelBytes(64, 64, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not read the synthesized PNG")
    assert(img.getWidth == 64 && img.getHeight == 64)
    val raster = img.getRaster
    val (_, _, ours) = MediaPipeline.decodePixels(png).get
    var mismatches = 0
    for (y <- 0 until 64; x <- 0 until 64)
      if (raster.getSample(x, y, 0) != (ours(y * 64 + x) & 0xff)) mismatches += 1
    assert(mismatches == 0, s"$mismatches pixels differ from ImageIO")
  }

  test("pixel decoder dead-letters truncated IDAT and unsupported color types") {
    val px = MediaPipeline.pixelPattern(16, 16, 1L)
    val png = MediaPipeline.pngPixelBytes(16, 16, px)
    // truncating inside IDAT must yield None, not an exception
    assert(MediaPipeline.decodePixels(png.take(png.length - 20)).isEmpty)
    // the header-only truecolor PNG has no IDAT at all
    assert(MediaPipeline.decodePixels(MediaPipeline.pngBytes(32, 32)).isEmpty)
    assert(MediaPipeline.decodePixels("garbage".getBytes).isEmpty)
  }

  test("WAV PCM encode/decode round-trips samples, tolerating extra RIFF chunks") {
    val samples = MediaPipeline.sawtooth(n = 500, pre = 40, period = 33, amp = 5000)
    val wav = MediaPipeline.wavPcmBytes(22050, samples)
    val got = MediaPipeline.decodeSamples(wav)
    assert(got.isDefined)
    assert(got.get._1 == 22050)
    assert(got.get._2.sameElements(samples))
    // javax.sound reads the same bytes: header fields are honest
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate == 22050f)
    assert(ais.getFrameLength == samples.length)
    // decoder walks past an unknown LIST chunk injected before data
    val withList = {
      val head = wav.take(36) // RIFF..fmt chunk end
      val list = "LIST".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
      val out = new java.io.ByteArrayOutputStream
      out.write(head); out.write(list); out.write(wav.drop(36))
      out.toByteArray
    }
    val got2 = MediaPipeline.decodeSamples(withList)
    assert(got2.isDefined && got2.get._2.sameElements(samples))
    // truncated data chunk and stereo/8-bit formats dead-letter
    assert(MediaPipeline.decodeSamples(wav.take(wav.length - 3)).isEmpty)
    assert(MediaPipeline.decodeSamples("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("audio features match a direct computation on the raw signal") {
    val s = MediaPipeline.sawtooth(n = 1000, pre = 100, period = 25, amp = 3000)
    val spark = SparkTestSession.spark
    import spark.implicits._
    val asset = MediaAsset(7L, "audio", MediaPipeline.wavPcmBytes(8000, s))
    val f = MediaPipeline.audioFeatures(spark, Seq(asset).toDS()).head()
    assert(f.decode_ok && f.doc_id == 7L && f.sample_rate == 8000)
    assert(f.n_samples == 1000)
    assert(f.n_silent == s.count(_ == 0))
    assert(f.peak == s.map(v => math.abs(v.toInt)).max)
    assert(f.rms2 == s.map(v => v.toLong * v).sum / 1000)
    assert(f.zero_crossings ==
      s.sliding(2).count(p => p(0).toInt * p(1) < 0))
  }

  test("mdat frame decode round-trips; motion features match the raw frames") {
    val h = 123456789L
    val mp4 = MediaPipeline.mp4BytesWithFrames(64, 48, nFrames = 17, h)
    // the structural parse still reads the header boxes
    assert(MediaPipeline.parseMp4(mp4).exists { case (w, ht, _) => w == 64 && ht == 48 })
    val frames = MediaPipeline.decodeFrames(mp4)
    assert(frames.isDefined && frames.get.length == 17)
    for (f <- 0 until 17; j <- 0 until MediaPipeline.FrameBytes)
      assert((frames.get(f)(j) & 0xff) == MediaPipeline.frameByte(h, f, j))
    // in-scene consecutive frames differ by exactly +3 per byte
    val l1 = (0 until MediaPipeline.FrameBytes)
      .map(j => math.abs((frames.get(1)(j) & 0xff) - (frames.get(0)(j) & 0xff))).sum
    assert(l1 == 3 * MediaPipeline.FrameBytes)
    // ragged mdat and headers-only streams dead-letter
    assert(MediaPipeline.decodeFrames(mp4.take(mp4.length - 5)).isEmpty)
    assert(MediaPipeline.decodeFrames(MediaPipeline.mp4Bytes(64, 48, 5)).isEmpty)
    val spark = SparkTestSession.spark
    import spark.implicits._
    val vf = MediaPipeline.videoFeatures(spark,
      Seq(MediaPipeline.MediaAsset(9L, "video", mp4)).toDS()).head()
    assert(vf.decode_ok && vf.n_frames == 17)
    // 17 frames = scenes of 5: cuts at f=5,10,15 unless the re-derived
    // base coincides; in-scene transitions contribute exactly 96 each
    assert(vf.n_cuts <= 3 && vf.total_l1 >= 96L * (16 - vf.n_cuts))
    assert(vf.max_frame_l1 >= 96)
  }

  test("aHash is exactly invariant to a global brightness shift") {
    val px = MediaPipeline.pixelPattern(64, 64, 5L)
    val brighter = px.map(b => ((b & 0xff) + 20).toByte) // pattern < 229, no clamp
    assert(MediaPipeline.aHash(64, 64, px) ==
      MediaPipeline.aHash(64, 64, brighter))
  }

  test("baseline JPEG encode/decode round-trips block-constant images exactly") {
    // DC-only streams survive the lossy codec losslessly (quant 8
    // divides 8·(v−128) exactly) — the property the dedup hash oracle
    // relies on
    for (seed <- Seq(0L, 7L, 23L, 39L)) {
      val bv = MediaPipeline.blockPattern(seed)
      val jpg = MediaPipeline.jpegBlockBytes(64, 64, bv)
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8, "not a JPEG")
      val got = MediaPipeline.decodeJpeg(jpg)
      assert(got.isDefined, s"decode failed for seed=$seed")
      val (w, h, px) = got.get
      assert((w, h) == ((64, 64)))
      for (gy <- 0 until 8; gx <- 0 until 8; y <- 0 until 8; x <- 0 until 8)
        assert((px((gy * 8 + y) * 64 + gx * 8 + x) & 0xff) == bv(gy * 8 + gx),
          s"block ($gx,$gy) pixel ($x,$y) wrong for seed=$seed")
    }
  }

  test("javax.imageio reads our baseline JPEG to the same pixels") {
    val bv = MediaPipeline.blockPattern(11L)
    val jpg = MediaPipeline.jpegBlockBytes(64, 64, bv)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO could not read the synthesized JPEG")
    assert(img.getWidth == 64 && img.getHeight == 64)
    val raster = img.getRaster
    val (_, _, ours) = MediaPipeline.decodeJpeg(jpg).get
    var worst = 0
    for (y <- 0 until 64; x <- 0 until 64)
      worst = math.max(worst,
        math.abs(raster.getSample(x, y, 0) - (ours(y * 64 + x) & 0xff)))
    // both IDCTs are exact on DC-only blocks; allow ±1 for any
    // implementation's final-descale rounding
    assert(worst <= 1, s"ImageIO disagrees by $worst")
  }

  test("in-repo JPEG decoder reads an ImageIO-WRITTEN jpeg (real huffman + AC)") {
    // a stream this code did not produce: full standard tables, AC
    // coefficients, APPn segments — the generality test
    val px = MediaPipeline.pixelPattern(48, 32, 5L)
    val img = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 48)
      img.getRaster.setSample(x, y, 0, px(y * 48 + x) & 0xff)
    val baos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", baos), "no jpeg writer")
    val jpg = baos.toByteArray
    val got = MediaPipeline.decodeJpeg(jpg)
    assert(got.isDefined, "decoder rejected a standard baseline stream")
    val (w, h, ours) = got.get
    assert((w, h) == ((48, 32)))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var worst = 0
    for (y <- 0 until 32; x <- 0 until 48)
      worst = math.max(worst,
        math.abs(ref.getRaster.getSample(x, y, 0) - (ours(y * 48 + x) & 0xff)))
    // same coefficients, independent IDCTs: only rounding may differ
    assert(worst <= 1, s"decoders disagree by $worst")
  }

  test("JPEG decoder dead-letters truncation, progressive, and junk") {
    val jpg = MediaPipeline.jpegBlockBytes(64, 64, MediaPipeline.blockPattern(3L))
    assert(MediaPipeline.decodeJpeg(jpg.take(jpg.length / 2)).isEmpty,
      "truncated stream must dead-letter")
    assert(MediaPipeline.decodeJpeg("not a jpeg".getBytes).isEmpty)
    // flip SOF0 to SOF2 (progressive) — must refuse, not mis-decode
    val prog = jpg.clone()
    val sof = prog.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    prog(sof + 1) = 0xc2.toByte
    assert(MediaPipeline.decodeJpeg(prog).isEmpty, "progressive must dead-letter")
  }

  test("banded candidate search is COMPLETE for Hamming <= 6 on planted clusters") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    val hs = MediaPipeline.imageHashes(spark,
      MediaPipeline.attachPixelImages(docs, nClusters = 12))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(hs.forall(_._3), "every synthesized image must decode")
    val byId = hs.map(t => t._1 -> t._2).toMap
    // brute-force ground truth of near-dup pairs
    val close = for {
      a <- byId.keys.toSeq; b <- byId.keys.toSeq if a < b
      if java.lang.Long.bitCount(byId(a) ^ byId(b)) <= 6
    } yield (a, b)
    assert(close.nonEmpty, "fixture must contain near-dup image pairs")
    // pigeonhole: <= 6 differing bits over 8 disjoint 8-bit bands
    // leaves at least one band identical — every close pair collides
    close.foreach { case (a, b) =>
      val shared = (0 until 8).exists(k =>
        ((byId(a) >>> (k * 8)) & 0xffL) == ((byId(b) >>> (k * 8)) & 0xffL))
      assert(shared, s"pair ($a,$b) within Hamming 6 shares no band")
    }
    // same-cluster docs hash close: noise is 10 perturbed pixels
    val sameCluster = for {
      a <- 0L until 120L; b <- (a + 1) until 120L if a % 12 == b % 12
    } yield java.lang.Long.bitCount(byId(a) ^ byId(b))
    assert(sameCluster.max <= 6,
      s"same-pattern images drifted ${sameCluster.max} bits apart")
  }

  test("randomized payload geometry: codecs round-trip and agree with the JDK decoders") {
    // VERDICT r20 #5 / r21 #7: the codec paths were pinned on a
    // handful of handcrafted geometries; these trials randomize dims,
    // filter phase (PNG heights cycle all five filters), block values,
    // PCM shapes and frame counts, with a fixed seed so failures
    // reproduce. Every PNG/JPEG trial is also cross-checked against
    // javax.imageio pixel-for-pixel, WAV headers against javax.sound.
    val rnd = new scala.util.Random(20260819L)
    for (trial <- 1 to 12) {
      // PNG: arbitrary dims and arbitrary byte content
      val w = 1 + rnd.nextInt(90); val h = 1 + rnd.nextInt(70)
      val px = Array.fill[Byte](w * h)((rnd.nextInt(256) - 128).toByte)
      val png = MediaPipeline.pngPixelBytes(w, h, px)
      val dec = MediaPipeline.decodePixels(png)
      assert(dec.isDefined, s"trial $trial: png decode failed (${w}x$h)")
      val (gw, gh, gpx) = dec.get
      assert((gw, gh) == ((w, h)) && gpx.sameElements(px),
        s"trial $trial: png round-trip mismatch (${w}x$h)")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"trial $trial: ImageIO rejected the synthesized PNG")
      val raster = img.getRaster
      var bad = 0
      for (y <- 0 until h; x <- 0 until w)
        if (raster.getSample(x, y, 0) != (gpx(y * w + x) & 0xff)) bad += 1
      assert(bad == 0, s"trial $trial: $bad PNG pixels differ from ImageIO")

      // JPEG: random block grid, random DC-only block values
      val bw = 1 + rnd.nextInt(6); val bh = 1 + rnd.nextInt(6)
      val blocks = Array.fill(bw * bh)(rnd.nextInt(229))
      val jpg = MediaPipeline.jpegBlockBytes(bw * 8, bh * 8, blocks)
      val jdec = MediaPipeline.decodeJpeg(jpg)
      assert(jdec.isDefined, s"trial $trial: jpeg decode failed (${bw}x$bh blocks)")
      val (jw, jh, jpx) = jdec.get
      assert((jw, jh) == ((bw * 8, bh * 8)))
      var jbad = 0
      for (y <- 0 until jh; x <- 0 until jw) {
        val want = blocks((y / 8) * bw + (x / 8))
        if ((jpx(y * jw + x) & 0xff) != want) jbad += 1
      }
      assert(jbad == 0,
        s"trial $trial: $jbad JPEG pixels differ from the block values")
      val jimg = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpg))
      assert(jimg != null && jimg.getWidth == jw && jimg.getHeight == jh,
        s"trial $trial: ImageIO rejected the synthesized JPEG")
      val jraster = jimg.getRaster
      var jioBad = 0
      for (y <- 0 until jh; x <- 0 until jw)
        if (jraster.getSample(x, y, 0) != (jpx(y * jw + x) & 0xff)) jioBad += 1
      assert(jioBad == 0,
        s"trial $trial: $jioBad JPEG pixels differ from ImageIO")

      // WAV: random rate and arbitrary 16-bit PCM content
      val n = 1 + rnd.nextInt(900)
      val samples = Array.fill[Short](n)((rnd.nextInt(65536) - 32768).toShort)
      val rate = 8000 * (1 + rnd.nextInt(6))
      val wav = MediaPipeline.wavPcmBytes(rate, samples)
      val wdec = MediaPipeline.decodeSamples(wav)
      assert(wdec.isDefined && wdec.get._1 == rate &&
        wdec.get._2.sameElements(samples),
        s"trial $trial: wav round-trip mismatch (rate=$rate n=$n)")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      assert(ais.getFormat.getSampleRate == rate.toFloat &&
        ais.getFrameLength == n.toLong,
        s"trial $trial: javax.sound header mismatch")

      // MP4: random dims / frame counts through the box walk
      val (vw, vh, nf) = (1 + rnd.nextInt(1900), 1 + rnd.nextInt(1000),
        1 + rnd.nextInt(60))
      assert(MediaPipeline.parseMp4(MediaPipeline.mp4Bytes(vw, vh, nf))
        .contains((vw.toLong, vh.toLong, nf.toLong)),
        s"trial $trial: mp4 round-trip mismatch (${vw}x$vh, $nf frames)")
    }
  }
}
