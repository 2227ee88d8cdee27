package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline, and a
  * sign-bit LSH-bucketed variant as the scale path (bucket first, rank
  * within bucket — candidate set shrinks ~2^bits-fold, turning the
  * all-pairs O(N·M) scan into per-bucket joins that parallelize by
  * bucket key at 100 TB).
  *
  * All vector math is codegen'd Catalyst (`zip_with` + `aggregate`
  * folds in element order), cast to double so Spark and the DuckDB
  * oracle run identical IEEE sequences.
  */
object EmbeddingQueries extends QueryModule {

  /** Native codegen'd expression (CosineSimilarity); semantically
    * identical to the HOF formulation
    * `aggregate(zip_with(a,b,_*_),0,_+_) / (√·√)` but fused into one
    * generated loop. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.CosineSimilarity(a, b)

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  /** Sign-bit LSH bucket: Σ 2^i · [emb_i > 0] over the first 8 dims —
    * axis-aligned random-hyperplane LSH with deterministic planes. */
  private val LshBits = 8
  private def bucketCol(emb: Column): Column =
    (0 until LshBits).map(i =>
      when(element_at(emb, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  private val bucketSql: String =
    (0 until LshBits).map(i =>
      s"(CASE WHEN emb[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")

  val all: Seq[Q] = Seq(

    // Brute-force cosine top-5 for a fixed query set — the exact ANN
    // baseline every approximate variant is measured against
    Q("embed_cosine_topk",
      (s, dir) => {
        val e = vecs(s, dir)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))
        q.crossJoin(e.select(col("vec_id").as("neighbor_id"), col("emb")))
          .filter(col("neighbor_id") =!= col("query_id"))
          .withColumn("sim", cosine(col("qemb"), col("emb")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("query_id"), col("neighbor_id"), col("rnk"),
            round(col("sim"), 5).as("sim"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
             |p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             |             list_dot_product(q.emb, n.emb)
             |               / (sqrt(list_dot_product(q.emb, q.emb))
             |                  * sqrt(list_dot_product(n.emb, n.emb))) AS sim
             |      FROM e q JOIN e n ON n.vec_id <> q.vec_id
             |      WHERE q.vec_id < 5),
             |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
             |                                   ORDER BY sim DESC, neighbor_id) AS rnk
             |      FROM p)
             |SELECT query_id, neighbor_id, rnk, round(sim, 5) AS sim
             |FROM r WHERE rnk <= 5""".stripMargin)),

    // LSH bucket histogram — the partition layout of the scale path
    Q("embed_lsh_buckets",
      (s, dir) => vecs(s, dir)
        .select(bucketCol(col("emb")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_vecs")),
      Some(s"""WITH e AS (SELECT embedding::DOUBLE[] AS emb FROM embeddings)
              |SELECT $bucketSql AS bucket, count(*) AS n_vecs
              |FROM e GROUP BY 1""".stripMargin)),

    // Embedding-cosine near-dup (the dedup-variant framing of ANN):
    // LSH-bucketed candidate pairs, exact cosine, threshold. At 100 TB
    // the bucket join bounds the quadratic step exactly like MinHash
    // banding does for text.
    Q("dedup_embedding_cosine",
      (s, dir) => {
        val e = vecs(s, dir).withColumn("bucket", bucketCol(col("emb")))
        val a = e.select(col("bucket"), col("vec_id").as("v1"), col("emb").as("e1"))
        val b = e.select(col("bucket"), col("vec_id").as("v2"), col("emb").as("e2"))
        a.join(b, Seq("bucket"))
          .filter(col("v1") < col("v2"))
          .withColumn("sim", cosine(col("e1"), col("e2")))
          .filter(col("sim") >= 0.3)
          .select(col("v1"), col("v2"), round(col("sim"), 5).as("sim"))
      },
      Some(s"""WITH e AS (SELECT vec_id, emb, $bucketSql AS bucket
              |           FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) t),
              |p AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
              |             list_dot_product(a.emb, b.emb)
              |               / (sqrt(list_dot_product(a.emb, a.emb))
              |                  * sqrt(list_dot_product(b.emb, b.emb))) AS sim
              |      FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
              |SELECT v1, v2, round(sim, 5) AS sim
              |FROM p WHERE sim >= 0.3""".stripMargin)),

    // Bucketed ANN: rank only within the query's bucket — approximate
    // (recall < 1) but join-pruned; the plan that survives scale-out
    Q("embed_ann_bucketed",
      (s, dir) => {
        val e = vecs(s, dir).withColumn("bucket", bucketCol(col("emb")))
        val q = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("emb").as("qemb"), col("bucket"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))
        q.join(e.select(col("vec_id").as("neighbor_id"), col("emb"), col("bucket")),
            Seq("bucket"))
          .filter(col("neighbor_id") =!= col("query_id"))
          .withColumn("sim", cosine(col("qemb"), col("emb")))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("query_id"), col("neighbor_id"), col("rnk"),
            round(col("sim"), 5).as("sim"))
      },
      Some(s"""WITH e AS (SELECT vec_id, emb, $bucketSql AS bucket
              |           FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) t),
              |p AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
              |             list_dot_product(q.emb, n.emb)
              |               / (sqrt(list_dot_product(q.emb, q.emb))
              |                  * sqrt(list_dot_product(n.emb, n.emb))) AS sim
              |      FROM e q JOIN e n ON q.bucket = n.bucket AND n.vec_id <> q.vec_id
              |      WHERE q.vec_id < 20),
              |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
              |                                   ORDER BY sim DESC, neighbor_id) AS rnk
              |      FROM p)
              |SELECT query_id, neighbor_id, rnk, round(sim, 5) AS sim
              |FROM r WHERE rnk <= 3""".stripMargin))
  )
}
