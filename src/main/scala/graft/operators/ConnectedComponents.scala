package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * ACM SoCC 2014) — the dedup clustering step: near-dup PAIRS (from
  * MinHash/Jaccard/SimHash) become canonical GROUPS.
  *
  * Each round is two join+aggregate steps (all shuffles on the node
  * key), and the round count is O(log²·n) worst-case / 2-4 in practice
  * — independent of graph diameter, unlike min-label propagation whose
  * round count IS the diameter (a 50-doc near-dup chain took 25+
  * rounds; the star algorithm collapses it in a handful). Lineage is
  * truncated every round: `checkpoint` to the configured reliable
  * checkpoint dir when one is set (the cluster deployment), else
  * `localCheckpoint` (local/test).
  */
object ConnectedComponents {

  /** Large-star: for every node u, hang each STRICTLY LARGER neighbor
    * off the minimum of u's neighborhood (including u). Halves long
    * chains while never re-orienting an edge upward.
    *
    * One window (min over the neighborhood) replaces the round-1
    * groupBy+self-join formulation — one shuffle per star instead of
    * two, and intra-round duplicates ride through to the round-final
    * distinct (they cannot change any neighborhood min). */
  private def largeStar(e: DataFrame): DataFrame = {
    val byU = org.apache.spark.sql.expressions.Window.partitionBy("u")
    e.select(col("u"), col("v"))
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .withColumn("m", least(min(col("v")).over(byU), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
  }

  /** Small-star: on the smaller-pointing orientation (u > v for every
    * edge), connect u and all its smaller neighbors to the minimum of
    * that neighborhood. */
  private def smallStar(e: DataFrame): DataFrame = {
    val byU = org.apache.spark.sql.expressions.Window.partitionBy("u")
    val withMin = e.withColumn("m", min(col("v")).over(byU))
    withMin
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(withMin.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Order-independent edge-set fingerprint for the convergence check:
    * one scalar row to the driver per round (no full-frame comparison
    * join). XOR cannot overflow (sum would, under ANSI mode). */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** @param edges undirected edges, columns (a, b), LongType
    * @return (node, component) — component = min node id reachable */
  def components(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    // lazy: the fingerprint action right after each checkpoint call
    // materializes it — eager would run a SECOND job per round
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(false) else df.localCheckpoint(false)

    // every input node, including ones whose only edges are self-loops
    // — those are singleton components and must appear in the output
    // (the star iteration below drops self-loops entirely)
    val nodes = edges
      .select(explode(array(col("a"), col("b"))).as("node")).distinct()
    // canonical smaller-pointing orientation, self-loops dropped
    var e = ckpt(edges.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct())
    var prev = fingerprint(e)
    // no real edges (self-loop-only input) → every node is its own
    // singleton; skip the star rounds entirely
    var converged = prev._1 == 0L
    var i = 0
    while (!converged && i < maxIter) {
      e = ckpt(smallStar(largeStar(e)))
      val fp = fingerprint(e)
      converged = fp == prev
      prev = fp
      i += 1
    }
    // Partially-converged labels are WRONG component ids, not degraded
    // ones — never return them silently. The star algorithm converges
    // in O(log² n) rounds, so hitting this means a bug or a pathological
    // maxIter.
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge after $maxIter rounds")
    // Converged state is a set of stars rooted at each component's min:
    // children from the edges, roots label themselves; nodes untouched
    // by any real edge (self-loop-only) are their own singleton.
    val starLabels = e.select(col("u").as("node"), col("v").as("component"))
      .unionByName(
        e.select(col("v").as("node"), col("v").as("component")))
      .distinct()
    nodes.join(starLabels, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }
}
