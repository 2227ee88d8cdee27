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
}
