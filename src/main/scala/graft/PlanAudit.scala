package graft

import org.apache.spark.sql.SparkSession

/** Formatted-physical-plan audit flagging scale smells: cartesian
  * products, missing whole-stage codegen, unexpected
  * broadcast-nested-loop joins. `audit` is the reusable check
  * (PlanAuditSpec enforces an empty smell list in CI); the main dumps
  * the full plans for eyeballing.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {

  /** Queries deliberately NOT plan-audited, each with its
    * justification. The audited set is derived as registry ∖ this
    * map, so coverage is structural: a new registry query is audited
    * automatically unless an exclusion (with a reason) is added here
    * — PlanAuditSpec asserts audited ∪ excluded == SparkEntry.queries
    * exactly. */
  val Excluded: Map[String, String] = Map(
    "bpe_merges" -> ("the trained merge table is assembled on the " +
      "driver (bounded iterative pair-merge loop) and returned as a " +
      "LocalTableScan — there is no distributed scan/compute " +
      "pipeline to codegen, so the no-WholeStageCodegen smell is " +
      "structural, not a regression; the distributed encode path " +
      "over the trained table is audited as bpe_encode/token_count_bpe"))

  /** Every registry query not explicitly excluded above — the full
    * audited surface (178-query registry as of round 13). */
  lazy val DefaultNames: Seq[String] =
    (SparkEntry.queries.keySet -- Excluded.keySet).toSeq.sorted


  // BNLJ is by design in exactly these: embed_cosine_topk's exact
  // baseline crosses against a FIXED 5-query set, the IVF assignment
  // (pivot and k-means-trained variants) crosses each vector against
  // <=16 broadcast centroids (no equi-key exists; bounded O(N·C)
  // work), tfidf_top_terms crosses against the ONE-ROW broadcast
  // corpus-count frame (the lazy alternative to an eager count()),
  // and q22_idle_balances compares every customer against the
  // ONE-ROW broadcast scalar-average frame (no equi-key in
  // `c_acctbal > avg_bal`). q11_important_parts is the same shape:
  // every part value against the ONE-ROW broadcast 1.5×-average cut.
  // heavy_hitter_tokens likewise rides ONE-ROW broadcasts (the
  // candidate array / the corpus count). bloom_semi_join does NOT:
  // its bloom is a driver-materialized literal, so the plan is a
  // plain filtered join (audited in DefaultNames).
  // embed_ann_indexed's BNLJ is the QUERY side only (20 queries × ≤16
  // broadcast pivots, ranking probe cells) — the data side reads the
  // persisted cell store's bucket files, never a corpus re-assignment
  // (file-pruning asserted in IvfIndexStoreSpec).
  // negative_samples rides the ONE-ROW broadcast keyspace frame
  // (max part key) — same scalar shape as q15/q22.
  // source_overlap_kmv pairs the #sources-row sketch frame against
  // itself on source_a < source_b (no equi-key by construction;
  // bounded O(sources²) over a broadcast of O(sources·k) bytes).
  // pagerank_suppliers rides the ONE-ROW broadcast node-count frame
  // in every Jacobi round (the tfidf scalar shape).
  // token_freq_cms joins candidates against the ONE-ROW broadcast
  // sketch frame (8 KiB binary scalar — the tfidf shape again).
  // embed_ann_recall composes embed_ann_ivf (≤16 broadcast pivots)
  // with embed_cosine_topk's exact side (20 broadcast queries × the
  // corpus — ground truth for a SAMPLED query set, by design).
  val ExpectedBnlj: Set[String] = Set(
    "embed_ann_ivf", "embed_ann_ivf_kmeans", "embed_cosine_topk",
    "tfidf_top_terms", "q22_idle_balances", "heavy_hitter_tokens",
    "q11_important_parts", "corpus_drift", "embed_ann_indexed",
    "negative_samples", "source_overlap_kmv", "pagerank_suppliers",
    "dedup_semantic", "token_freq_cms", "embed_ann_recall",
    // the fixed-point ANN pair crosses each (sub)vector against ≤16
    // broadcast integer centroids (the IVF-assignment shape); the
    // retrieval pair rides ONE-ROW broadcasts (corpus stats / the
    // query embedding)
    "embed_ann_ivf_fp", "embed_ann_pq_fp", "bm25_search", "hybrid_rrf",
    // round 10: the indexed/fp BM25 pair rides the same ONE-ROW
    // broadcast corpus-stats frame; source_overlap_kmv_md5 pairs the
    // #sources-row sketch frame against itself on source_a < source_b
    // (no equi-key by construction) like its xxhash64 twin
    "bm25_indexed", "bm25_search_fp", "source_overlap_kmv_md5",
    // hybrid_rrf_indexed composes bm25_indexed (one-row stats
    // broadcast) with embed_ann_indexed's query-side pivot ranking
    // (1 query × ≤16 broadcast pivots)
    "hybrid_rrf_indexed",
    // lm_perplexity_fp rides the ONE-ROW broadcast total-token frame
    // (the bm25 corpus-stats shape); dedup_incremental the ONE-ROW
    // broadcast delta threshold; corpus_cluster_balance and
    // embed_hard_negatives the ≤16 broadcast integer centroids (the
    // IVF-assignment shape — hard-negative anchors rank probe cells
    // against the broadcast centroid frame)
    "lm_perplexity_fp", "dedup_incremental", "corpus_cluster_balance",
    "embed_hard_negatives",
    // corpus_curriculum scores through the same ONE-ROW broadcast
    // total-token frame as lm_perplexity_fp
    "corpus_curriculum",
    // collocations_pmi_fp rides the same ONE-ROW broadcast
    // total-token frame (everything else is token-keyed equi-joins);
    // embed_knn_label_fp ranks query vectors against the ≤16
    // broadcast integer centroids (the IVF-assignment shape);
    // ppr_suppliers rides the ONE-ROW broadcast seed-count frame
    // (the pagerank_suppliers node-count shape);
    // embed_mmr_topk_fp crosses the corpus against the ONE-ROW
    // broadcast query vector (the embed_cosine_topk shape) and then
    // ≤12-row shortlist frames against the ≤5-row selected set
    "collocations_pmi_fp", "embed_knn_label_fp", "ppr_suppliers",
    "embed_mmr_topk_fp",
    // basket_rules rides the ONE-ROW broadcast basket-count frame
    // (the tfidf scalar shape); basket_rec_recall's final summary
    // crosses two ONE-ROW count frames
    "basket_rules", "basket_rec_recall",
    // bm25_prf_fp and bm25_known_item_fp ride the same ONE-ROW
    // broadcast corpus-stats frame as the bm25 family (per scoring
    // pass)
    "bm25_prf_fp", "bm25_known_item_fp",
    // passage_search_fp: the same ONE-ROW broadcast stats frame, at
    // chunk granularity; rfm_segments rides the ONE-ROW broadcast
    // corpus-horizon frame (max purchase day)
    "passage_search_fp", "rfm_segments",
    // revenue_pareto rides the ONE-ROW broadcast total-spend frame
    "revenue_pareto",
    // round 18: embed_ann_pq's gated recall check carries the same
    // exact ground-truth side as embed_ann_recall (20 broadcast
    // queries × the corpus — truth for a SAMPLED query set by
    // design; the PQ/ADC leg itself stays broadcast equi-joins)
    "embed_ann_pq")

  /** Queries whose partition-less Window is over a PROVABLY bounded
    * frame for a reason the plan itself cannot show (no LIMIT below
    * it), each with the bound that protects it. Everything else in
    * the registry must either have no bare window at all or stamp
    * ranks below a LIMIT (the top-k shape — TakeOrdered feeds a ≤k-row
    * window). Kept tiny on purpose: an unbounded bare window is the
    * single-partition-sort scale cliff r13 flagged on
    * pack_sequences_bpe, and rfm_segments / revenue_pareto now ride
    * TwoPhase.withNtile instead of one. */
  val BoundedBareWindow: Map[String, String] = Map(
    "monthly_revenue" -> ("cumulative revenue over the month-granularity " +
      "aggregate — the window input is #months rows, bounded by the " +
      "calendar horizon, not the data volume"),
    "corpus_mix" -> ("the feasible-total/quota windows ride the per-" +
      "language count frame (#langs rows — the mixture spec's own " +
      "cardinality, 5 here); the per-doc stratum rank is the two-phase " +
      "64-cell recipe, never a bare window over documents"),
    "corpus_mix_temperature" -> ("the mass/largest-remainder quota " +
      "windows ride the per-source aggregate (#sources rows — a " +
      "catalog-bounded cardinality); the per-doc rank is the same " +
      "two-phase 64-cell recipe as corpus_mix"))

  /** Partition-less Window nodes in the optimized logical plan whose
    * INPUT cardinality is not bounded by a LIMIT — each one is a
    * whole-frame single-partition sort at scale. The bound must sit on
    * the window's own input chain (through cardinality-preserving /
    * -reducing unary nodes only): a GlobalLimit elsewhere in the
    * subtree — e.g. on the small side of a join feeding the window —
    * bounds nothing about the window's input and must not suppress
    * the smell. */
  def unboundedBareWindows(
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    // Chain cases: nodes through which a LIMIT below still bounds the
    // window's input — cardinality-preserving unaries (Project/Filter/
    // Sort/alias/repartition, Window itself) and bounded-in-implies-
    // bounded-out ones (Aggregate/Distinct: |out| ≤ |in|). Anything
    // else (a join, a generator/explode, a union) can re-inflate
    // cardinality and stops the walk (ADVICE r15: the conservative
    // version false-positived on stacked windows over limited inputs).
    @annotation.tailrec
    def boundedInput(p: LogicalPlan): Boolean = p match {
      case _: GlobalLimit => true
      case n @ (_: Project | _: Filter | _: Sort | _: SubqueryAlias |
                _: RepartitionOperation | _: Window | _: Aggregate |
                _: Distinct) => boundedInput(n.children.head)
      case _ => false
    }
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty && !boundedInput(w.child) =>
        w.windowExpressions.map(_.sql).mkString(",")
    }
  }

  /** Run `name` at `sfDir`, return (formatted plan, smells). */
  def audit(spark: SparkSession, sfDir: String,
            name: String): (String, Seq[String]) = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // materialize so AQE finalizes and codegen stages appear
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val smells = Seq(
      "CartesianProduct" -> plan.contains("CartesianProduct"),
      "no-WholeStageCodegen" -> !plan.contains("codegen id"),
      "BroadcastNestedLoop" -> (plan.contains("BroadcastNestedLoopJoin")
        && !ExpectedBnlj.contains(name)),
      "unbounded-bare-window" -> (!BoundedBareWindow.contains(name)
        && unboundedBareWindows(df).nonEmpty)
    ).collect { case (s, true) => s }
    (plan, smells)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else DefaultNames
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // match the bench/GraftSession runtime-bloom cap so audited
      // plans are the shipped plans
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val (plan, smells) = audit(spark, sfDir, name)
      println(s"\n===== $name =====")
      println(plan)
      println(if (smells.nonEmpty) s"[audit] $name SMELLS: ${smells.mkString(", ")}"
        else if (plan.contains("BroadcastNestedLoopJoin"))
          s"[audit] $name clean (BNLJ expected: bounded broadcast side)"
        else s"[audit] $name clean")
    }
    spark.stop()
  }
}
