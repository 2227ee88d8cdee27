package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank over a directed edge list — the classic link-quality
  * signal a web-scale corpus curation pass weighs documents by (crawl
  * frontiers and quality filters both rank hosts/pages this way;
  * reference scope: the engine's generic graph-centrality extension,
  * like ConnectedComponents for the dedup family).
  *
  * Numerics: INTEGER FIXED-POINT on purpose. Ranks are BIGINTs scaled
  * by `Scale`; each Jacobi round is
  *   r'(v) = (15·(Scale div N)) div 100 + (85·Σ_{u→v} r(u) div d(u)) div 100
  * — every operation is an exact integer op, so the result is
  * bit-identical under ANY partitioning, execution order, or engine
  * (a floating-point PageRank sums contributions in nondeterministic
  * order and can't be hash-gated). The floor-div remainders leak a few
  * trillionths of mass per round — irrelevant for ranking, essential
  * for determinism. Dangling mass is not redistributed (callers
  * passing both edge directions have none).
  *
  * Scale shape: per round, one hash join of edges against the rank
  * frame on src (shuffle on src), one groupBy(dst) partial-aggregated
  * sum, one left join back to the node set, and a ONE-ROW broadcast of
  * the node count (the tfidf scalar shape — lazy alternative to a
  * driver count()). Plan depth grows LINEARLY with iters (each round
  * referenced once — no exponential persist-chain nesting). `run`
  * localCheckpoints the edge list itself (same lineage lesson as
  * Triangles): the edge derivation — often the most expensive join in
  * the caller's query — would otherwise be re-scanned ~(iters+2)×
  * (per-round contribution join, plus nodes and degrees).
  */
object PageRank {

  /** Fixed-point scale: ranks sum to ~1e12 (initial mass exactly
    * N·(Scale div N)). */
  val Scale = 1000000000000L

  /** Materialize the caller's edge frame once, HASH-PARTITIONED by
    * `src`. An input that already carries that partitioning (the
    * memoized trade-edge frame goes through
    * [[graft.PlanUtil.partitionedCheckpoint]]) is reused as-is —
    * re-checkpointing it would throw the partitioning away (under AQE
    * a checkpoint snapshots UnknownPartitioning) and put one exchange
    * per Jacobi round back into every consumer. */
  private def materializeEdges(edges: DataFrame): DataFrame = {
    val proj = edges.select(col("src"), col("dst"))
    if (graft.PlanUtil.isHashPartitionedBy(edges, "src")) proj
    else graft.PlanUtil.partitionedCheckpoint(proj, col("src"))
  }

  /** Run `iters` rounds over directed `edges` with columns (src, dst).
    * For an undirected graph pass both directions. Returns
    * (node, rank_fp). */
  def run(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20], got $iters")
    // eager: cut the caller's edge-derivation lineage once (keeping —
    // or establishing — the src hash partitioning); every round then
    // rescans a materialized LogicalRDD, not the upstream joins
    val e = materializeEdges(edges)
    // node set and out-degrees are loop constants — materialize each
    // ONCE instead of leaving their union/distinct/groupBy subtrees to
    // be re-planned (and re-executed unless ReusedExchange happens to
    // fire) inside every round's plan. The degree column is folded
    // into the edge frame, so each Jacobi round pays exactly one join
    // against the rank frame plus the groupBy(dst) shuffle. Both loop
    // constants keep their natural hash partitioning through the
    // checkpoint (nodes by `node` from the distinct, ed by `src` from
    // e): the per-round contribution join and the rank rebuild join
    // then need NO exchange on these sides — only the groupBy(dst)
    // vote shuffle remains, which is fundamental to the operation.
    val nodes = graft.PlanUtil.checkpointKeepPartitioning(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val nn = broadcast(nodes.agg(count(lit(1)).as("n")))
    val ed = graft.PlanUtil.checkpointKeepPartitioning(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("d")), Seq("src")))
    var rank = nodes.crossJoin(nn)
      .select(col("node"), expr(s"$Scale div n").as("r"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r div d").as("c"))
      val sums = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(sums, Seq("node"), "left").crossJoin(nn)
        .select(col("node"),
          expr(s"(15 * ($Scale div n)) div 100 + (85 * coalesce(s, 0L)) div 100")
            .as("r"))
    }
    rank.select(col("node"), col("r").as("rank_fp"))
  }

  /** Personalized PageRank (random walk with restart): the 15% restart
    * mass lands ONLY on `seeds` (a one-column `node` frame) instead of
    * uniformly — ranks measure proximity to the seed set, the standard
    * graph-expansion signal for seed-based data selection (grow a
    * labeled "good documents/hosts" set along the link structure).
    * Same exact integer fixed point as [[run]]: seed share is
    * `Scale div |S∩V|`, zero elsewhere; initial rank = the restart
    * vector. Seeds outside the graph are ignored (mass normalizes over
    * present seeds). Nodes unreachable from every seed converge to
    * exactly 0 — integer arithmetic has no epsilon tail. Plan shape
    * identical to [[run]] plus one semi-join deriving the seed mass
    * (computed once, localCheckpointed alongside the edges). */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters must be in [1,20], got $iters")
    val e = materializeEdges(edges)
    // same loop-constant treatment as [[run]]: nodes and the
    // degree-carrying edge frame materialize once, keeping their
    // natural hash partitioning (node / src) through the checkpoint
    val nodes = graft.PlanUtil.checkpointKeepPartitioning(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct())
    val sd = nodes.join(seeds.select(col("node")), Seq("node"), "left_semi")
    val ns = broadcast(sd.agg(count(lit(1)).as("n")))
    // restart vector: Scale div |S| on seeds, 0 elsewhere — one
    // nodes-sized frame reused every round, so cut its lineage once
    val base = graft.PlanUtil.checkpointKeepPartitioning(nodes
      .join(sd.withColumn("is_seed", lit(1L)), Seq("node"), "left")
      .crossJoin(ns)
      .select(col("node"),
        when(col("is_seed").isNotNull, expr(s"$Scale div n"))
          .otherwise(lit(0L)).as("b")))
    val ed = graft.PlanUtil.checkpointKeepPartitioning(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("d")), Seq("src")))
    var rank = base.select(col("node"), col("b").as("r"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r div d").as("c"))
      val sums = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = base.join(sums, Seq("node"), "left")
        .select(col("node"),
          expr("(15 * b) div 100 + (85 * coalesce(s, 0L)) div 100").as("r"))
    }
    rank.select(col("node"), col("r").as("rank_fp"))
  }
}
