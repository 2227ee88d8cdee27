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
}
