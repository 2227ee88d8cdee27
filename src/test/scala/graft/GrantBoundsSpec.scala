package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EXECUTABLE plan-audit grants (VERDICT r20 #2): every grant in
  * [[PlanAudit]] claims a concrete row bound in prose; these tests
  * MEASURE the granted query's actual executed-plan row counts (SQL
  * metrics after a noop-sink run, AQE stages unwrapped) on the real
  * fixtures and assert them against the claimed formula — so a grant
  * whose constant silently drifts (a carve rate rounding to zero, a
  * cell count pinned back to a constant, a delta frame growing with
  * the corpus) fails the suite instead of the next sf10 sweep.
  *
  * Coverage is the r21 optimization surface — the three bounds the
  * round's rewrites introduced or re-derived:
  *   - embed_hard_negatives' BoundedConstDomainJoin (candidates ≤
  *     anchors × probed cells × cell size, anchors O(AnchorTarget)),
  *   - a6_circuit_breaker_ref's BoundedBareWindow (running-sum input
  *     is window-horizon-sized, never event-volume-sized),
  *   - dedup_semantic's BoundedRangeResidual (within-cell pairs under
  *     the √-balanced budget N²/ncells with ncells = ⌊∛(N/4)⌋²).
  */
class GrantBoundsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Run `df` through the noop sink, then return every operator of the
    * FINAL (post-AQE) executed plan, stages and subqueries unwrapped. */
  private def executedNodes(df: DataFrame): Seq[SparkPlan] = {
    df.write.format("noop").mode("overwrite").save()
    val buf = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    val seen = scala.collection.mutable.HashSet[Int]()
    def walk(p: SparkPlan): Unit =
      if (seen.add(System.identityHashCode(p))) p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case other =>
          buf += other
          other.children.foreach(walk)
          other.subqueries.foreach(walk)
      }
    walk(df.queryExecution.executedPlan)
    buf.toSeq
  }

  private def outputRows(p: SparkPlan): Long =
    p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)

  private def maxJoinRows(nodes: Seq[SparkPlan]): Long =
    nodes.filter(_.nodeName.contains("Join")).map(outputRows).max

  test("embed_hard_negatives: every join stays under anchors × probed-cell candidates (the carve grant's formula)") {
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val n = sources.Tables.embeddings(spark, sf).count()
      // cell sizes come from corpus_cluster_balance's OUTPUT — the same
      // fpLloydCells quantizer, so maxCell is the real probed-cell cap
      val maxCell = SparkEntry.queries("corpus_cluster_balance")(spark, sf)
        .agg(max(col("n_vecs"))).head().getLong(0)
      val t = queries.EmbeddingQueries.AnchorTarget
      val nodes = executedNodes(
        SparkEntry.queries("embed_hard_negatives")(spark, sf))
      val worst = maxJoinRows(nodes)
      // anchors ≤ 2T (GatedBoundsRandomSpec's 7σ window), 2 probed
      // cells of ≤ maxCell rows each, ×2 slack for the label-attach
      // join riding the candidate frame; the N-proportional
      // cell/label attach joins are covered by the 4N term. A carve
      // regression back to O(N) anchors blows this bound immediately.
      val bound = math.max(4L * n, 2L * t * 2 * maxCell * 2)
      assert(worst >= 0, "no join metrics found")
      assert(worst <= bound,
        s"$sf: join output $worst exceeds the granted candidate bound " +
          s"$bound (n=$n, maxCell=$maxCell, T=$t)")
    }
  }

  test("a6_circuit_breaker_ref: the bare running-sum window is horizon-sized, never event-sized") {
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val ev = sources.Tables.events(spark, sf)
      val nEvents = ev.count()
      val tumbles = ev
        .select(expr("(unix_micros(ts) div 15000000) * 15000000").as("t"))
        .distinct().count()
      val nodes = executedNodes(
        SparkEntry.queries("a6_circuit_breaker_ref")(spark, sf))
      val bare = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => outputRows(w)
      }
      assert(bare.nonEmpty, "the granted bare window must exist (grant-live)")
      // delta positions ≤ one per window start (40·tumbles) plus one
      // trailing −1 slide per tumble: 41·tumbles, +41 slack for
      // horizon-edge starts. NOT a function of event count.
      val bound = 41L * tumbles + 41
      assert(bare.max <= bound,
        s"$sf: bare-window input ${bare.max} exceeds horizon bound $bound " +
          s"(tumbles=$tumbles)")
      // and the bound itself is far below the event volume the r20
      // expand plan shuffled (40 rows per TU pair), so the grant is
      // meaningful, not vacuous
      assert(bound < 40L * nEvents,
        s"$sf: horizon bound $bound not below the expand volume")
    }
  }

  // ---- r22 additions (VERDICT r21 #3): the remaining prose grants
  // made executable — the 5 const-domain ANN/retrieval serving shapes,
  // bm25_indexed's Σ df bound, and the three memo-riding residuals
  // (dedup_containment, corpus_split_leakage_safe, basket_rec_recall).

  /** Σ df over the fixed BM25 query terms — the serving bound both
    * bm25_indexed and hybrid_rrf_indexed's lexical leg claim. */
  private def sumDfBm25(sf: String): Long = {
    val t = split(trim(col("text")), " ")
    sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(t).as("token"))
      .filter(col("token").isin("join", "scan", "filter"))
      .select(col("doc_id"), col("token")).distinct().count()
  }

  test("bm25_indexed: every join stays under Σ df(query terms) — the postings serving bound") {
    val sf = "/root/testdata/sf0.01"
    val sumDf = sumDfBm25(sf)
    val worst = maxJoinRows(executedNodes(
      SparkEntry.queries("bm25_indexed")(spark, sf)))
    // each scoring join emits one row per (query term, matching doc);
    // ×3 covers the df/dl/stats attach joins riding the same frame
    val bound = 3L * sumDf + 100
    assert(worst >= 0 && worst <= bound,
      s"join output $worst exceeds Σdf bound $bound (sumDf=$sumDf)")
    // non-vacuous: the bound is far below corpus × terms
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(bound < 3L * nDocs * 3, s"bound $bound not below corpus×terms")
  }

  /** The PQ/ADC linear-scan grant shared by all three PQ variants:
    * every join's output stays ≤ ~(queries × m codes per vector) —
    * one linear ADC pass over the code frame per query batch, never a
    * second corpus blow-up. 100·N covers the 20-query × 4-subspace
    * ADC join (80N) plus the training/encode joins (≤ 64N) with
    * headroom; a broken shape (code join keyed only on the constant
    * domain) lands at N²-ish and trips this at sf0.1 immediately. */
  private def assertPqLinear(name: String, sf: String): Unit = {
    val n = sources.Tables.embeddings(spark, sf).count()
    val worst = maxJoinRows(executedNodes(SparkEntry.queries(name)(spark, sf)))
    val bound = 100L * n
    assert(worst >= 0 && worst <= bound,
      s"$name@$sf: join output $worst exceeds the linear ADC bound $bound (n=$n)")
    assert(bound < n * n / 8,
      s"$name@$sf: bound $bound not meaningfully below all-pairs")
  }

  test("embed_ann_pq: ADC + recall-gate joins stay linear in the corpus (20-query serving bound)") {
    assertPqLinear("embed_ann_pq", "/root/testdata/sf0.1")
  }

  test("embed_ann_pq_fp: fixed-point twin keeps the same linear ADC bound") {
    assertPqLinear("embed_ann_pq_fp", "/root/testdata/sf0.1")
  }

  test("embed_ann_pq_indexed: store-served codes keep the same linear ADC bound") {
    assertPqLinear("embed_ann_pq_indexed", "/root/testdata/sf0.1")
  }

  test("hybrid_rrf_indexed: both legs stay query-bounded (Σ df lexical, probed-cell vector)") {
    val sf = "/root/testdata/sf0.01"
    val sumDf = sumDfBm25(sf)
    val p = queries.EmbeddingQueries.ivfIndexPrefix(spark, sf)
    val maxCell = sources.IvfIndexStore.read(spark, p)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    val worst = maxJoinRows(executedNodes(
      SparkEntry.queries("hybrid_rrf_indexed")(spark, sf)))
    // lexical leg ≤ 3·Σdf (bm25_indexed's bound), vector leg ≤ 1 query
    // × 2 probed cells × maxCell (×2 slack for the candidate rank
    // attach), fusion ≤ 40 rows
    val bound = 3L * sumDf + 4L * maxCell + 100
    assert(worst >= 0 && worst <= bound,
      s"join output $worst exceeds the two-leg bound $bound " +
        s"(sumDf=$sumDf, maxCell=$maxCell)")
  }

  /** Distinct per-doc 3-gram shingle frame re-derived independently of
    * TextQueries (same tokens/shingle definition), for the df-capped
    * pair-bound formulas below. */
  private def shingleDf(sf: String): DataFrame = {
    val t = split(trim(col("text")), " ")
    sources.Tables.documents(spark, sf)
      .filter(size(t) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(1, size(split(trim(text), ' ')) - 2), " +
          "i -> concat_ws(' ', slice(split(trim(text), ' '), i, 3)))"))).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
  }

  test("dedup_containment: pair join stays under Σ C(min(df,50),2) — the df-capped shingle bound") {
    val sf = "/root/testdata/sf0.01"
    val cap = queries.TextQueries.JaccardMaxDf
    val sumPairs = shingleDf(sf)
      .select(sum(least(col("df"), lit(cap.toLong)) *
        (least(col("df"), lit(cap.toLong)) - 1) / 2)).head().getDouble(0).toLong
    val abRows = shingleDf(sf)
      .filter(col("df") <= cap)
      .select(sum(col("df"))).head().getLong(0)
    val worst = maxJoinRows(executedNodes(
      SparkEntry.queries("dedup_containment")(spark, sf)))
    // the inverted-index pair join emits ≤ Σ C(df∧50, 2); the size/
    // containment attach joins ride ≤ ab rows each
    val bound = 2L * sumPairs + 4L * abRows + 100
    assert(worst >= 0 && worst <= bound,
      s"join output $worst exceeds df-capped pair bound $bound " +
        s"(ΣC=$sumPairs, ab=$abRows)")
  }

  test("corpus_split_leakage_safe: the banded pair join stays linear in docs, never all-pairs") {
    val sf = "/root/testdata/sf0.01"
    val nDocs = sources.Tables.documents(spark, sf).count()
    val worst = maxJoinRows(executedNodes(
      SparkEntry.queries("corpus_split_leakage_safe")(spark, sf)))
    // the grant's exact formula is Σ_buckets C(size,2) over the minhash
    // (band, signature) buckets — bucket membership is content-set, so
    // candidates grow ~linearly with docs (measured: a small multiple
    // of n_docs on every fixture). 64·n catches the failure mode the
    // grant exists for: an unbanded all-pairs join is C(n,2) ≈ n²/2,
    // ~4× this bound at sf0.01 already and two decades past it at sf1.
    val bound = 64L * nDocs
    assert(worst >= 0 && worst <= bound,
      s"join output $worst exceeds the banded-candidate bound $bound (n=$nDocs)")
    assert(bound < nDocs * (nDocs - 1) / 2,
      s"bound $bound not below all-pairs — fixture too small to discriminate")
  }

  test("basket_rec_recall: candidate joins stay under the capped-basket / top-M-neighbor formulas") {
    val sf = "/root/testdata/sf0.01"
    val bi = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("i")).distinct()
    val cap = queries.AnalyticsQueries.BasketItemCap.toLong
    val sizes = bi.groupBy(col("o")).agg(count(lit(1)).as("sz"))
      .select(least(col("sz"), lit(cap)).as("sz"))
    val sumPairs = sizes.select(sum(col("sz") * (col("sz") - 1) / 2))
      .head().getDouble(0).toLong
    val nCtx = sizes.filter(col("sz") >= 2)
      .select(sum(col("sz") - 1)).head().getLong(0)
    val m = queries.AnalyticsQueries.RecTopNeighbors.toLong
    val worst = maxJoinRows(executedNodes(
      SparkEntry.queries("basket_rec_recall")(spark, sf)))
    // pair memo ≤ Σ C(sz∧64, 2) per the capBasketItems carve; the
    // recommender's ctx × sim fan-out ≤ M per context item
    val bound = math.max(3L * sumPairs, 3L * m * nCtx) + 100
    assert(worst >= 0 && worst <= bound,
      s"join output $worst exceeds the basket bound $bound " +
        s"(ΣC=$sumPairs, ctx=$nCtx, M=$m)")
  }

  test("dedup_semantic: within-cell pair join stays under the ∛-balanced N²/ncells budget") {
    val sf = "/root/testdata/sf0.1"
    val n = sources.Tables.embeddings(spark, sf).count()
    // the spec recomputes the DECLARED cell-count formula: c = max(4,
    // ⌊∛(N div 4)⌋), ncells = c² — a regression that pins the cell
    // count back to a constant multiplies the real pair volume past
    // this budget at sf0.1 already
    val c = math.max(4L, math.cbrt((n / 4).toDouble).toLong)
    val ncells = c * c
    val out = SparkEntry.queries("dedup_semantic")(spark, sf).cache()
    try {
      val distinctCells = out.select(col("cell")).distinct().count()
      // the assignment actually uses the scaled cell count (a fixed-16
      // regression would collapse this to ≤16 occupied cells)
      assert(distinctCells > ncells / 2,
        s"occupied cells $distinctCells vs expected ~$ncells")
      val nodes = executedNodes(SparkEntry.queries("dedup_semantic")(spark, sf))
      val worst = maxJoinRows(nodes)
      // balanced pair volume is N²/ncells; ×3 covers fixture skew
      // (measured ≈1.5× at sf10). The fixed-16 shape (≈N²/16) would
      // exceed this at sf0.1 by ~1.8×.
      val bound = 3L * n * n / ncells
      assert(worst >= 0 && worst <= bound,
        s"pair-join output $worst exceeds the balanced budget $bound " +
          s"(n=$n, ncells=$ncells)")
    } finally out.unpersist()
  }
}
