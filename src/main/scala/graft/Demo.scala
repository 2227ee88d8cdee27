package graft

import graft.config.DefaultConfig
import graft.operators.{AccessService, EventAggregates, Grants, Windowed}
import graft.sources.{AggStore, EventIngest, GrantStore, Tables}
import org.apache.spark.sql.functions._

/** End-to-end walkthrough of the engine as a reference user would run
  * it — the full write path and read path against one sf dir:
  *
  *   ingest classify → per-user aggregates → rule/feature grants →
  *   materialized grant + aggregate stores → serve-path access checks
  *   (with the per-feature breaker fed by the derived attempt log) →
  *   grant-flip CDC.
  *
  * Usage: runMain graft.Demo [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = DefaultConfig.config

    // 1. ingest with schema-registry classification (dead letters stay)
    val classified = EventIngest.classify(Tables.events(spark, sfDir))
    println("== ingest ==")
    classified.groupBy("ingest_status").count().show()
    val events = classified.filter(col("ingest_status") === "valid")
      .drop("ingest_status", "props_parsed")

    // 2. per-user aggregates (one shuffle for every configured agg)
    val aggs = EventAggregates.perUser(events, cfg.aggregates)
    println("== aggregates ==")
    aggs.orderBy("user_id").show(5)

    // 3. rules → features → grants
    val grants = Grants.long(aggs, cfg)
    println("== grants ==")
    grants.groupBy("feature", "has_grant").count().orderBy("feature").show()

    // 4. persist: grants table (bucketed serve layout) + aggregate
    //    snapshots (additive + sketch columns)
    GrantStore.materialize(grants, "demo_grants", buckets = 8)
    AggStore.materialize(events, cfg.aggregates, "demo_aggs", buckets = 8)
    println("== stored ==")
    println(s"grants rows:     ${GrantStore.read(spark, "demo_grants").count()}")
    println(s"agg snapshots:   ${AggStore.read(spark, "demo_aggs").count()}")

    // 5. serve path: point lookups + per-feature breaker over the
    //    derived access-attempt log
    val svc = AccessService.fromEvents(spark, events, cfg)
    println("== serve ==")
    val sample = events.select("user_id").distinct().limit(3)
      .collect().map(_.getLong(0))
    sample.foreach { u =>
      cfg.features.foreach { f =>
        println(s"  can user $u access ${f.name}? " + svc.canAccess(u, f.name))
      }
    }
    println("== breaker (latest window per feature) ==")
    Windowed.latestFeatureCircuit(
      AccessService.attemptsFromEvents(events, cfg)).show()

    // 6. grant-flip CDC (batch form of the streaming pipeline)
    println("== grant flips ==")
    println(s"flips: ${Windowed.grantFlips(events).count()}")

    // 7. the training-data pipeline surface over documents/embeddings
    val docs = Tables.documents(spark, sfDir)
    println("== corpus ops ==")
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
    println(s"minhash near-dup pairs:  ${pairs.count()}")
    println(s"winnow candidate pairs:  ${SparkEntry.queries("winnow_candidates")(spark, sfDir).count()}")
    println(s"dedup clusters:          ${SparkEntry.queries("dedup_clusters")(spark, sfDir).select("canonical_id").distinct().count()}")
    println("== embeddings ==")
    println(s"ANN rows (multi-probe):  ${SparkEntry.queries("embed_ann_multiprobe")(spark, sfDir).count()}")
    println("== multimodal ==")
    graft.multimodal.MediaPipeline.extractFeatures(spark,
      graft.multimodal.MediaPipeline.attachBinary(docs))
      .groupBy("media_type").count().show()

    GrantStore.drop(spark, "demo_grants")
    AggStore.drop(spark, "demo_aggs")
    spark.stop()
  }
}
