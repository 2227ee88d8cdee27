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
      """)))
}
