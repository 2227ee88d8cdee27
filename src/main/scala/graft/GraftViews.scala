package graft

import graft.config.{DefaultConfig, EngineConfig}
import graft.operators.{AccessService, EventAggregates, Grants, Windowed}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** SQL surface: registers the source tables AND the engine's derived
  * frames as temp views, so the whole library is drivable from
  * `spark.sql(...)` — the Spark-native analogue of the reference's
  * HTTP serving routes (reference `app.py`): what the reference
  * exposes as `GET /user/{id}/features`, a SQL user reads as
  * `SELECT * FROM grants WHERE user_id = ...`.
  *
  * Views are lazy logical plans, not materializations: registering
  * costs nothing until a query runs, every registered view composes
  * with the session's optimizer (predicate pushdown through the view
  * into the parquet scan), and the same names work from JDBC/Thrift
  * on a real deployment. Combined with [[GraftExtensions]]'s SQL
  * function registrations (cosine_sim, hll_*, simhash, bloom_*,
  * misra_gries), SQL-only users get the full operator surface.
  */
object GraftViews {

  /** The raw parquet-backed tables (`events` through its
    * nanosecond-safe reader, `documents` through the fanout
    * rebalance). */
  private val sourceTables: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    Seq(
      "region" -> Tables.region _,
      "nation" -> Tables.nation _,
      "customer" -> Tables.customer _,
      "supplier" -> Tables.supplier _,
      "part" -> Tables.part _,
      "orders" -> Tables.orders _,
      "lineitem" -> Tables.lineitem _,
      "events" -> Tables.events _,
      "documents" -> Tables.documents _,
      "embeddings" -> Tables.embeddings _)

  /** Register every source table and derived view against `dir`.
    * Derived views: `user_aggregates` (the per-user aggregate spine),
    * `grants_wide` / `grants` (feature grants, one row per user vs one
    * row per user×feature), `access_attempts` (the serve-path attempt
    * log), `feature_circuits` (latest breaker state per feature). */
  def register(spark: SparkSession, dir: String,
               cfg: EngineConfig = DefaultConfig.config): Unit = {
    sourceTables.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
    val events = Tables.events(spark, dir)
    val userAggs = EventAggregates.perUser(events, cfg.aggregates)
    userAggs.createOrReplaceTempView("user_aggregates")
    val wide = Grants.wide(userAggs, cfg)
    wide.createOrReplaceTempView("grants_wide")
    Grants.longFromWide(wide, cfg).createOrReplaceTempView("grants")
    val attempts = AccessService.attempts(events, wide, cfg)
    attempts.createOrReplaceTempView("access_attempts")
    Windowed.latestFeatureCircuit(attempts)
      .createOrReplaceTempView("feature_circuits")
    // training-data assembly surface: the chunked corpus (RAG/indexing
    // reads `doc_chunks` like a table), the packed-sequence occupancy
    // map, and the PII-masked corpus (same regex pair as the
    // pii_redaction gate query, applied to the raw text)
    SparkEntry.queries("doc_chunks")(spark, dir)
      .createOrReplaceTempView("doc_chunks")
    SparkEntry.queries("pack_sequences")(spark, dir)
      .createOrReplaceTempView("packed_sequences")
    locally {
      import org.apache.spark.sql.functions._
      val emailRe = graft.queries.PackingQueries.EmailRe
      val phoneRe = graft.queries.PackingQueries.PhoneRe
      Tables.documents(spark, dir)
        .withColumn("text",
          regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"))
        .createOrReplaceTempView("documents_redacted")
    }
    // curation surface (round 7): the budget-selected corpus prefix,
    // the per-source-capped corpus, and the fully-assembled training
    // selection — a SQL user reads the curated corpus as a table
    Seq("token_budget_select" -> "corpus_budget",
      "source_cap" -> "corpus_source_capped",
      "corpus_assemble" -> "corpus_assembled").foreach { case (q, view) =>
      SparkEntry.queries(q)(spark, dir).createOrReplaceTempView(view)
    }
    // training-shard + audit surface (round 7): the per-epoch shard
    // assignment a training job reads its shards from, the per-doc
    // curation verdicts (GROUP BY stage = the attrition report), and
    // the purchase-graph centrality frame
    Seq("corpus_shard" -> "corpus_shards",
      "assemble_provenance" -> "corpus_provenance",
      "pagerank_suppliers" -> "trade_centrality").foreach { case (q, view) =>
      SparkEntry.queries(q)(spark, dir).createOrReplaceTempView(view)
    }
    // selection + modality surface (round 7 cont.): per-doc DSIR
    // importance weights, similarity-graph cohesion, perceptual image
    // dedup labels, and decoded audio features — each a table a SQL
    // user joins against `documents` by doc_id
    Seq("importance_weights" -> "doc_importance",
      "similarity_triangles" -> "doc_similarity_cohesion",
      "image_dedup_ahash" -> "image_dedup_labels",
      "audio_features" -> "audio_features").foreach { case (q, view) =>
      SparkEntry.queries(q)(spark, dir).createOrReplaceTempView(view)
    }
    // decontamination + sampling surface (round 9): the per-train-doc
    // semantic contamination verdict (join against `documents` by id,
    // WHERE contaminated to exclude) and the quality-weighted sample's
    // stratum accounting
    Seq("decontaminate_semantic" -> "semantic_contamination",
      "corpus_sample_weighted" -> "corpus_sample_strata").foreach { case (q, view) =>
      SparkEntry.queries(q)(spark, dir).createOrReplaceTempView(view)
    }
    // data-quality surface: the corpus with its expectation violations
    // (empty array = clean row) plus the two split views — SQL users
    // triage the quarantine with a WHERE, not a re-ingest. Same checks
    // as the expectations_* gate queries.
    locally {
      import org.apache.spark.sql.functions._
      val annotated = graft.operators.Expectations.annotate(
        Tables.documents(spark, dir), graft.queries.QualityQueries.docChecks)
      annotated.createOrReplaceTempView("documents_annotated")
      annotated.filter(graft.operators.Expectations.isClean)
        .createOrReplaceTempView("documents_clean")
      annotated.filter(!graft.operators.Expectations.isClean)
        .createOrReplaceTempView("documents_quarantined")
    }
    // telemetry-analytics surface (round 10 cont.): the funnel report,
    // the retention triangle, the gap-filled daily series with anomaly
    // flags, and the behavioral motif frequencies — the dashboards a
    // pipeline operator reads as plain tables
    Seq("funnel_conversion" -> "funnel_report",
      "cohort_retention" -> "retention_triangle",
      "timeseries_gapfill" -> "daily_series",
      "revenue_anomaly_mad" -> "daily_anomalies",
      "event_motifs" -> "behavior_motifs",
      // the leak-free supervised export: PIT features + forward label
      "training_set" -> "training_examples").foreach { case (q, view) =>
      SparkEntry.queries(q)(spark, dir).createOrReplaceTempView(view)
    }
  }
}
