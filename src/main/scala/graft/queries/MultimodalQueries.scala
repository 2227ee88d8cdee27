package graft.queries

import graft.multimodal.MediaPipeline
import graft.sources.Tables

/** Oracle-checked coverage for the multimodal pipeline: the typed
  * Dataset → mapPartitions decode path must produce exactly what the
  * closed-form SQL predicts. Image/audio payloads are REAL PNG/WAV
  * streams round-tripped through genuine header parsing — the oracle
  * can still predict the result because the dims/rate embedded at
  * synthesis time derive from md5(text); the parse itself is binary
  * (IHDR big-endian, fmt-chunk little-endian), exercised further in
  * MediaPipelineSpec with corrupt-payload cases.
  */
object MultimodalQueries extends QueryModule {

  /** `h` = the 60-bit md5-prefix content hash of the document text —
    * the seed both the synthesizer and the oracle derive dims from. */
  private val hashSql = "('0x' || substr(md5(text), 1, 15))::BIGINT"

  val all: Seq[Q] = Seq(
    Q("multimodal_features",
      (s, dir) => {
        val assets = MediaPipeline.attachBinary(Tables.documents(s, dir))
        MediaPipeline.extractFeatures(s, assets).toDF()
      },
      Some(s"""SELECT doc_id,
             |       ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
             |       CASE (doc_id % 3) WHEN 0 THEN 45 WHEN 1 THEN 44
             |            ELSE 232 END AS n_bytes,
             |       CASE (doc_id % 3) WHEN 1 THEN 0
             |            ELSE 64 + ($hashSql % 1216) END AS width,
             |       CASE (doc_id % 3) WHEN 1 THEN 0
             |            ELSE 64 + (($hashSql // 1216) % 656) END AS height,
             |       CASE (doc_id % 3) WHEN 2
             |            THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END AS n_frames,
             |       CASE (doc_id % 3) WHEN 1 THEN 8000 * (1 + $hashSql % 6)
             |            ELSE 0 END AS sample_rate,
             |       TRUE AS decode_ok
             |FROM documents""".stripMargin)),

    // Frame sampling + aspect-preserving resize over video assets:
    // every 5th frame to one row with its 256-cap target dims and a
    // per-frame fingerprint — the video→frame-level-training-rows
    // fan-out with the decode stubbed and the plumbing (generator,
    // schema, arithmetic) real and oracle-checked.
    Q("multimodal_frames",
      (s, dir) => {
        val feats = MediaPipeline.extractFeatures(s,
          MediaPipeline.attachBinary(Tables.documents(s, dir))).toDF()
        MediaPipeline.sampleFrames(feats, everyK = 5, maxDim = 256L)
      },
      Some(s"""WITH f AS (
             |  SELECT doc_id,
             |         64 + ($hashSql % 1216) AS width,
             |         64 + (($hashSql // 1216) % 656) AS height,
             |         1 + octet_length(encode(text)) % 30 AS n_frames
             |  FROM documents WHERE (doc_id % 3) = 2),
             |v AS (SELECT doc_id, width, height,
             |             unnest(range(0, n_frames, 5)) AS frame_idx
             |      FROM f)
             |SELECT doc_id, frame_idx,
             |       (width * 131 + height) * 1000003 + frame_idx * 97 AS frame_fp,
             |       CASE WHEN greatest(width, height) <= 256 THEN width
             |            WHEN width >= height THEN 256
             |            ELSE greatest(1, (width * 256) // height) END AS out_width,
             |       CASE WHEN greatest(width, height) <= 256 THEN height
             |            WHEN width >= height THEN greatest(1, (height * 256) // width)
             |            ELSE 256 END AS out_height
             |FROM v""".stripMargin))
  )
}
