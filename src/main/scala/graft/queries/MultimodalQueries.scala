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
             |FROM documents""".stripMargin))
  )
}
