package graft

import org.apache.spark.sql.functions._

/** End-to-end walkthrough of the TRAINING-DATA side of the engine, the
  * companion to [[Demo]]'s feature-store path — the curation chain a
  * pretraining pipeline runs, each stage a registered (oracle-gated)
  * query or store operation:
  *
  *   quality gate → exact + near-dup dedup → n-gram AND embedding
  *   decontamination → quality-weighted subsample → token-budget
  *   selection → packed sequences → epoch shards → provenance report →
  *   run-level pin (GRAFT PIN RUN) → retrieval spot-check (BM25 +
  *   hybrid RRF over the curated corpus).
  *
  * Usage: runMain graft.CurateDemo [sfDir]
  */
object CurateDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

    println("== 1. quality gate (expectations audit) ==")
    q("expectations_audit").show(false)

    println("== 2. dedup: exact clusters + semantic (embedding) ==")
    println(s"near-dup clusters: ${q("dedup_clusters").count()}; " +
      s"semantic dups dropped: ${q("dedup_semantic").filter(!col("kept")).count()}")

    println("== 3. decontamination: n-gram overlap AND embedding space ==")
    println(s"n-gram contaminated: ${q("decontaminate_overlap").filter(col("contaminated")).count()}; " +
      s"semantic contaminated: ${q("decontaminate_semantic").filter(col("contaminated")).count()}")

    println("== 4. quality-weighted subsample (per-stratum rates) ==")
    q("corpus_sample_weighted").orderBy("lang", "tier").show(30, false)

    println("== 5. token budget → packed sequences → epoch shards ==")
    println(s"budget-selected docs: ${q("token_budget_select").count()}; " +
      s"packed chunks: ${q("pack_sequences").count()}; " +
      s"shard assignments: ${q("corpus_shard").count()}")

    println("== 6. provenance (per-doc verdict; the attrition report) ==")
    q("assemble_provenance").groupBy("stage").count().orderBy("stage").show(false)

    println("== 7. retrieval spot-check over the corpus ==")
    q("bm25_search").show(5, false)
    q("hybrid_rrf").show(5, false)

    println("== 8. pin the run (SQL surface) ==")
    // pin the serve-tier stores a training job reads, as one run record
    val runDir = java.nio.file.Files.createTempDirectory("curate_demo")
      .resolve("run1").toString
    graft.sources.GrantStore.materialize(
      graft.operators.Grants.longFromWide(
        graft.operators.Grants.wide(
          graft.operators.EventAggregates.perUser(
            graft.sources.Tables.events(spark, sfDir),
            graft.config.DefaultConfig.config.aggregates),
          graft.config.DefaultConfig.config),
        graft.config.DefaultConfig.config)
        .select(col("user_id"), col("feature"), col("has_grant")))
    spark.sql(s"GRAFT PIN RUN '$runDir' TABLES graft_grants").show(false)
    println(s"pinned tables: ${graft.sources.RunManifest.tables(runDir).mkString(", ")}")
    spark.stop()
  }
}
