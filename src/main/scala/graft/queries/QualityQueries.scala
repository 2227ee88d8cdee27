package graft.queries

import graft.functions.TextOps._
import graft.operators.{Expectation, Expectations}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Data-quality gates as oracled queries: the [[Expectations]] operator
  * driven over the fixture tables with checks calibrated so both
  * outcomes appear (some pass clean, some catch real rows) — a report
  * that can only say "all good" tests nothing.
  *
  * All three are single-scan by construction (see Expectations scaladoc);
  * the DuckDB oracles mirror the not-TRUE-fails null semantics with
  * `NOT coalesce(pred, FALSE)`.
  */
object QualityQueries extends QueryModule {

  private def orderChecks = Seq(
    Expectation("totalprice_positive", col("o_totalprice") > 0),
    Expectation("totalprice_cap_400k", col("o_totalprice") <= 400000.0),
    Expectation("status_domain", col("o_orderstatus").isin("O", "F", "P")),
    Expectation("custkey_present", col("o_custkey").isNotNull),
    Expectation("orderdate_range",
      col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("2002-01-01"))))

  /** Shared by the quarantine query and its oracle: fails ~2% of fixture
    * docs (short or extremely long ones), passes the rest. */
  private[graft] def docChecks = Seq(
    Expectation("text_nonempty", length(trim(col("text"))) > 0),
    Expectation("min_tokens_12", size(tokens(col("text"))) >= 12),
    Expectation("max_chars_500", col("n_chars") <= 500),
    Expectation("chars_consistent", col("n_chars") === length(col("text"))),
    Expectation("lang_known", col("lang").isin("en", "de", "zh", "fr", "es")))

  override def all: Seq[Q] = Seq(

    Q("expectations_audit",
      (s, dir) => Expectations.audit(Tables.orders(s, dir), orderChecks),
      Some("""
        WITH a AS (SELECT count(*) AS n_rows,
          CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f0,
          CAST(sum(CASE WHEN NOT coalesce(o_totalprice <= 400000.0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS f2,
          CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS f3,
          CAST(sum(CASE WHEN NOT coalesce(o_orderdate >= TIMESTAMP '1995-01-01'
                                      AND o_orderdate <  TIMESTAMP '2002-01-01', FALSE)
                   THEN 1 ELSE 0 END) AS BIGINT) AS f4
          FROM orders)
        SELECT 'totalprice_positive' AS expectation, n_rows, f0 AS n_failed FROM a
        UNION ALL SELECT 'totalprice_cap_400k', n_rows, f1 FROM a
        UNION ALL SELECT 'status_domain',       n_rows, f2 FROM a
        UNION ALL SELECT 'custkey_present',     n_rows, f3 FROM a
        UNION ALL SELECT 'orderdate_range',     n_rows, f4 FROM a
      """)),

    // quarantined rows only, violations as a CSV in declaration order
    // (a portable rendering of the array column — both engines skip the
    // NULL slots of passing checks in concat_ws)
    Q("expectations_quarantine",
      (s, dir) => {
        val tagged = Expectations.annotate(Tables.documents(s, dir), docChecks)
        tagged.filter(size(col("violations")) > 0)
          .select(col("doc_id"),
            concat_ws(",", col("violations")).as("violations_csv"))
      },
      Some("""
        SELECT doc_id,
               concat_ws(',',
                 CASE WHEN NOT coalesce(len(trim(text)) > 0, FALSE) THEN 'text_nonempty' END,
                 CASE WHEN NOT coalesce(len(string_split(trim(text), ' ')) >= 12, FALSE) THEN 'min_tokens_12' END,
                 CASE WHEN NOT coalesce(n_chars <= 500, FALSE) THEN 'max_chars_500' END,
                 CASE WHEN NOT coalesce(n_chars = len(text), FALSE) THEN 'chars_consistent' END,
                 CASE WHEN NOT coalesce(lang IN ('en','de','zh','fr','es'), FALSE) THEN 'lang_known' END
               ) AS violations_csv
        FROM documents
        WHERE NOT coalesce(len(trim(text)) > 0, FALSE)
           OR NOT coalesce(len(string_split(trim(text), ' ')) >= 12, FALSE)
           OR NOT coalesce(n_chars <= 500, FALSE)
           OR NOT coalesce(n_chars = len(text), FALSE)
           OR NOT coalesce(lang IN ('en','de','zh','fr','es'), FALSE)
      """)),

    Q("data_profile",
      (s, dir) => Expectations.profile(Tables.orders(s, dir),
        Seq("o_custkey", "o_orderstatus", "o_orderpriority")),
      Some("""
        WITH a AS (SELECT count(*) AS n_rows,
          count(o_custkey) AS nn0, count(DISTINCT o_custkey) AS nd0,
          count(o_orderstatus) AS nn1, count(DISTINCT o_orderstatus) AS nd1,
          count(o_orderpriority) AS nn2, count(DISTINCT o_orderpriority) AS nd2
          FROM orders)
        SELECT 'o_custkey' AS "column", n_rows, n_rows - nn0 AS n_nulls, nd0 AS n_distinct FROM a
        UNION ALL SELECT 'o_orderstatus',   n_rows, n_rows - nn1, nd1 FROM a
        UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - nn2, nd2 FROM a
      """)),

    // Shannon token entropy per document, exact integer fixed point:
    // H_fp = log2fp(n) − (Σ c·log2fp(c)) div n over the doc's token
    // counts — low entropy ⇒ repetitive/templated text (the
    // compression-ratio quality signal without a codec; used alongside
    // repetition_stats by the C4/Gopher-style filter stack). The log
    // is the bin()-based surrogate (FixedPointOps), counts are BIGINT,
    // the per-doc reduction is an order-free integer sum — hash-gated.
    // kept threshold 4.0 bits ≈ 4194304 fp splits the fixtures both
    // ways at sf0.01 AND sf0.1 (p10≈3.9e6 < cut < median≈4.65e6).
    // Plan: one explode + one (doc, token) count + one per-doc sum —
    // all map-side combinable; no joins, no windows.
    Q("token_entropy_fp",
      (s, dir) => {
        import graft.functions.FixedPointOps._
        val tc = Tables.documents(s, dir)
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("c"))
        tc.groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n"),
            sum(col("c") * log2LinFp(col("c"))).as("s"))
          .select(col("doc_id"), col("n").as("n_tokens"),
            (log2LinFp(col("n")) - expr("s div n")).as("entropy_fp"))
          .withColumn("kept", col("entropy_fp") >= lit(4194304L))
      },
      Some {
        import graft.functions.FixedPointOps.log2LinFpSql
        s"""WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
           |            FROM documents),
           |tc AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
           |       FROM tok GROUP BY 1, 2),
           |h AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
           |             CAST(sum(c * ${log2LinFpSql("c")}) AS BIGINT) AS s
           |      FROM tc GROUP BY doc_id)
           |SELECT doc_id, n AS n_tokens,
           |       ${log2LinFpSql("n")} - s // n AS entropy_fp,
           |       ${log2LinFpSql("n")} - s // n >= 4194304 AS kept
           |FROM h""".stripMargin
      }))
}
