package graft.queries

import graft.multimodal.MediaPipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked coverage for the multimodal plumbing: the typed
  * Dataset → mapPartitions decode path must produce exactly what the
  * closed-form SQL predicts (the stub decode is deliberately
  * SQL-expressible so the Spark-side plumbing — encoders, partition
  * batching, schema — is what's actually under test).
  */
object MultimodalQueries extends QueryModule {

  val all: Seq[Q] = Seq(
    Q("multimodal_features",
      (s, dir) => {
        val assets = MediaPipeline.attachBinary(Tables.documents(s, dir))
        MediaPipeline.extractFeatures(s, assets).toDF()
      },
      Some("""SELECT doc_id,
             |       ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
             |       octet_length(encode(text)) AS n_bytes,
             |       64 + (('0x' || substr(md5(text), 1, 15))::BIGINT % 1216) AS width,
             |       64 + ((('0x' || substr(md5(text), 1, 15))::BIGINT // 1216) % 656) AS height,
             |       CASE WHEN ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] = 'video'
             |            THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END AS n_frames
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
      Some("""WITH f AS (
             |  SELECT doc_id,
             |         ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
             |         64 + (('0x' || substr(md5(text), 1, 15))::BIGINT % 1216) AS width,
             |         64 + ((('0x' || substr(md5(text), 1, 15))::BIGINT // 1216) % 656) AS height,
             |         CASE WHEN ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] = 'video'
             |              THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END AS n_frames
             |  FROM documents),
             |v AS (SELECT doc_id, width, height,
             |             unnest(range(0, n_frames, 5)) AS frame_idx
             |      FROM f WHERE media_type = 'video')
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
