package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the dedup
  * clustering step: near-dup PAIRS (from MinHash/Jaccard/SimHash)
  * become canonical GROUPS (keep one document per component).
  *
  * Each iteration is one join + aggregate (all shuffles on the node
  * key); iterations needed = graph diameter, which for dedup graphs is
  * tiny (clusters are near-cliques). `localCheckpoint` truncates the
  * growing lineage each round — on a cluster this would be
  * `checkpoint` to reliable storage.
  */
object ConnectedComponents {

  /** @param edges undirected edges, columns (a, b), LongType
    * @return (node, component) — component = min node id reachable */
  def components(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct().cache()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("component", col("node"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels, sym("b") === labels("node"))
        .groupBy(sym("a").as("n2")).agg(min(col("component")).as("nmin"))
      // carry old + new label through one checkpoint so the
      // convergence check is a cheap filter over materialized data,
      // not a second join
      val step = labels
        .join(neighborMin, labels("node") === neighborMin("n2"), "left_outer")
        .select(col("node"), col("component").as("prev"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      converged = step.filter(col("component") =!= col("prev")).isEmpty
      labels = step.select(col("node"), col("component"))
      i += 1
    }
    labels
  }
}
