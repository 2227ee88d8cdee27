package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase distributed total-order recipe, factored out of
  * PackingQueries so every global ordering in the repo — prefix sums,
  * global ranks, exact ntile quantiles — shares one implementation.
  *
  * The problem: a bare `Window.orderBy(...)` (no partitionBy) moves
  * the ENTIRE frame through one partition — the `WindowExec: No
  * Partition Defined` warning, and a single-node sort of the corpus
  * at 100 TB. The classic fix is the two-phase shape every parallel
  * prefix-sum uses: range-partition on the order key (disjoint
  * ordered key ranges), compute the partition-LOCAL window keyed on
  * the partition id, then add each partition's "everything before
  * me" offset from a #partitions-row broadcast frame whose running
  * sum is computed on the driver. Every distributed stage is
  * O(rows/partitions); the only sequential step is the #partitions-row
  * driver scan — the same boundary exchange Spark's own
  * RangePartitioner performs at every range shuffle.
  */
object TwoPhase {

  /** Range-partition `df` by `orderCols` into disjoint ordered key
    * ranges, stamp `pid`, and FREEZE the result (`localCheckpoint`).
    * Every two-phase computation branches this frame twice — a
    * partition-local window stage and a per-partition totals stage —
    * and without the freeze each branch re-executes the range
    * exchange independently, so `spark_partition_id()` need not mean
    * the same partitioning in both (AQE can coalesce the two
    * executions differently; boundary sampling is re-run). The
    * mismatch silently corrupts every downstream offset while
    * preserving row counts — caught at the 10× sweep, where
    * `pack_sequences_bpe` packed 27,590 sequences of the correct
    * 28,061. The checkpoint materializes the exchange ONCE so both
    * branches read the same partitions. Callers must pass the NARROW
    * per-item frame (keys + weight), never an array-carrying one —
    * the checkpoint stores it.
    *
    * Fault-tolerance trade (ADVICE r13): localCheckpoint blocks live
    * in EXECUTOR-LOCAL storage — losing an executor after the
    * checkpoint fails the query (no lineage to recompute) rather
    * than recovering. On a long-lived cluster run prefer reliable
    * `checkpoint()` to an HDFS dir, or persist+count with
    * deterministic partition ids — the recipe is unchanged, only the
    * freeze primitive swaps. */
  /** Column names the recipe stamps on caller frames (`pid` is part
    * of the caller contract — prefixFrame offsets join back on it;
    * the rest are internal to one helper). A caller frame already
    * carrying one would be silently clobbered or make the offset join
    * ambiguous, so the helpers refuse it loudly instead. */
  private val ReservedCols = Seq("pid", "before", "__rl", "__r")

  private def requireFree(df: DataFrame, cols: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(cols.toSet)
    require(clash.isEmpty,
      s"TwoPhase reserves column name(s) ${clash.mkString(", ")} — rename them in the input frame")
  }

  private[graft] def rangeParted(df: DataFrame, orderCols: Column*): DataFrame = {
    requireFree(df, ReservedCols)
    val nParts = math.max(1,
      df.sparkSession.sparkContext.defaultParallelism / 4)
    df.repartitionByRange(nParts, orderCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
  }

  /** The `(pid, before)` offset frame of a two-phase prefix sum: per-
    * partition totals of `weight` over the FROZEN range-parted frame,
    * prefix-summed on the DRIVER. The totals are #partitions rows (32
    * locally, ~10^5 at 100 TB / 1 GB partitions) — the same driver-
    * side boundary exchange Spark's own RangePartitioner performs at
    * every range shuffle, so collecting them is the canonical shape,
    * not a scale hazard; it also retires the partition-less
    * WindowExec these pipelines used to have (the totals-frame
    * running sum), which r13 flagged via its `No Partition Defined`
    * warnings. Callers broadcast-join the result back on `pid`. */
  private[graft] def prefixFrame(parted: DataFrame, weight: Column): DataFrame = {
    val s = parted.sparkSession
    import s.implicits._
    val totals = parted.groupBy(col("pid")).agg(weight.cast("long").as("ptot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    totals.map(_._1)
      .zip(totals.scanLeft(0L)(_ + _._2).init)
      .toSeq.toDF("pid", "before")
  }

  /** Add the exact global `row_number()` over `orderCols` as
    * `rankCol` without a partition-less window: partition-local
    * row_number keyed on the frozen range partition, plus the
    * broadcast per-partition row-count offsets. `orderCols` must be a
    * TOTAL order (tie-break on a key) or the rank is
    * nondeterministic. Returns (ranked frame, total row count — free,
    * from the same driver-side totals scan). */
  private[graft] def globalRank(df: DataFrame, rankCol: String,
                                orderCols: Column*): (DataFrame, Long) = {
    val parted = rangeParted(df, orderCols: _*)
    val s = parted.sparkSession
    import s.implicits._
    // one driver-side totals scan yields both the offsets and the
    // total count (prefixFrame's shape, plus the grand total)
    val totals = parted.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offs = totals.map(_._1)
      .zip(totals.scanLeft(0L)(_ + _._2).init)
      .toSeq.toDF("pid", "before")
    val ranked = parted
      .withColumn("__rl", row_number().over(
        Window.partitionBy(col("pid")).orderBy(orderCols: _*)))
      .join(broadcast(offs), Seq("pid"))
      .withColumn(rankCol, col("before") + col("__rl"))
      .drop("pid", "__rl", "before")
    (ranked, totals.map(_._2).sum)
  }

  /** Exact distributed `ntile(n) OVER (ORDER BY orderCols)`: the SQL-
    * standard tile assignment (first `c mod n` tiles get one extra
    * row) computed in closed form from the two-phase global rank and
    * the driver-known total count — bit-identical to the engine's
    * `ntile`, with no single-partition sort. The per-user RFM and
    * Pareto frames ride this: at 10^9 users a bare `ntile` window is
    * a 10^9-row single-node sort; this shape is a range shuffle.
    * `orderCols` must be a total order (tie-break on a key) for the
    * assignment to be engine-identical. */
  private[graft] def withNtile(df: DataFrame, tileCol: String, n: Int,
                               orderCols: Column*): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val (ranked, c) = globalRank(df, "__r", orderCols: _*)
    val q = c / n
    val m = c % n
    // ranks 1..m*(q+1) fall in the first m (larger) tiles; the else
    // branch only evaluates when q >= 1, but keep the literal
    // positive so ANSI mode cannot see a div-by-zero.
    val qSafe = math.max(q, 1L)
    ranked.withColumn(tileCol,
        when(col("__r") <= lit(m * (q + 1)),
          expr(s"((__r - 1) div ${q + 1}) + 1"))
          .otherwise(expr(s"${m} + ((__r - 1 - ${m * (q + 1)}) div $qSafe) + 1"))
          .cast("int"))
      .drop("__r")
  }
}
