package graft.queries

import graft.functions.FixedPointOps._
import graft.operators.NgramLm
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Count-based language-model scoring as corpus-curation queries (the
  * CCNet move: an n-gram LM trained on a trusted slice scores every
  * candidate document; high mean surprisal ⇒ boilerplate / gibberish /
  * wrong-language, filtered or down-weighted before training). Engine
  * side is [[graft.operators.NgramLm]]; everything is integer fixed
  * point under the exact hash gate — DuckDB replays train AND score.
  */
object LmQueries extends QueryModule {

  /** Keep threshold for the filter column: docs whose mean bigram
    * surprisal is below ≈4.89 bits (5130000 at 2^20 scale) are
    * "kept". Calibrated so the fixture corpus splits both ways at
    * sf0.01 AND sf0.1 (medians 5145662 / 5126322 — the QualityQueries
    * discipline: a filter that only ever says yes tests nothing). */
  private val KeptBelowBitsFp = 5130000L

  override def all: Seq[Q] = Seq(

    // Stupid-backoff bigram LM, trained on the doc_id % 5 != 0 slice,
    // scoring the held-out % 5 == 0 slice — the quality-filter serve
    // shape. Mean per-doc surprisal in 2^20 fixed point: counts are
    // BIGINT, the log is the exact bin()-based linear-log2 surrogate
    // (FixedPointOps.log2LinFp), the backoff constant is a power of
    // two, so the whole pipeline is deterministic integer arithmetic —
    // hash-gated from birth. Plan shape: two count aggregations
    // (map-side combined), three equi-joins on token keys, a one-row
    // broadcast of N, an order-free integer per-doc sum. No windows,
    // no floats, no driver state — holds at 100 TB where the count
    // frames persist once (BucketedUpsert by token key) and scoring
    // probes them per batch.
    Q("lm_perplexity_fp",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val c = NgramLm.train(d.filter(col("doc_id") % 5 =!= 0))
        NgramLm.score(d.filter(col("doc_id") % 5 === 0), c)
          .withColumn("kept", col("bits_fp") < lit(KeptBelowBitsFp))
      },
      Some {
        def lg(x: String) = log2LinFpSql(x)
        s"""WITH tok AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
           |bg AS (SELECT doc_id,
           |              unnest(list_transform(range(1, len(t)),
           |                     i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS bg
           |       FROM tok WHERE len(t) >= 2),
           |w AS (SELECT doc_id, split_part(bg, ' ', 1) AS w1,
           |             split_part(bg, ' ', 2) AS w2 FROM bg),
           |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           |        FROM w WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
           |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
           |uni AS (SELECT unnest(t) AS token FROM tok WHERE doc_id % 5 <> 0),
           |c2 AS (SELECT token, CAST(count(*) AS BIGINT) AS c2 FROM uni GROUP BY 1),
           |tot AS (SELECT CAST(sum(c2) AS BIGINT) AS n_tok FROM c2),
           |sc AS (SELECT e.doc_id,
           |              CASE WHEN c12.c12 IS NOT NULL
           |                     THEN ${lg("c1.c1")} - ${lg("c12.c12")}
           |                   WHEN c2.c2 IS NOT NULL
           |                     THEN ${lg("4 * t.n_tok")} - ${lg("c2.c2")}
           |                   ELSE ${NgramLm.OovBitsFp} END AS s
           |       FROM w e
           |       LEFT JOIN c12 ON e.w1 = c12.w1 AND e.w2 = c12.w2
           |       LEFT JOIN c1 ON e.w1 = c1.w1
           |       LEFT JOIN c2 ON e.w2 = c2.token
           |       CROSS JOIN tot t
           |       WHERE e.doc_id % 5 = 0),
           |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |             CAST(sum(s) // count(*) AS BIGINT) AS bits_fp
           |      FROM sc GROUP BY doc_id)
           |SELECT doc_id, n_bigrams, bits_fp,
           |       bits_fp < $KeptBelowBitsFp AS kept FROM p""".stripMargin
      })
  )
}
