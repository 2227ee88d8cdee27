package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gate-checkable query: a Spark plan plus (usually) an equivalent
  * DuckDB SQL oracle over the same parquet tables. Column names must
  * match exactly between the two (the driver sorts columns by name and
  * hash-compares values). `oracle = None` → the driver records a weaker
  * rows-only check (reserved for ops whose SQL form is impractical).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def all: Seq[Q]

  /** Named session-memo builders for the bench warm-up phase. Each
    * thunk forces one memoized frame to its steady serving state, so
    * per-query bench times measure serving cost and the artifact
    * bills the first-touch build to an explicit `memo_builds` row
    * instead of whichever query happens to run first. Names are
    * stable artifact keys; builders must be idempotent (re-invoking
    * on a warm memo is a no-op count). */
  def memoWarmers: Seq[(String, (SparkSession, String) => Unit)] = Nil
}
