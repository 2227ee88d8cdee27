package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets parquet
  * footer stats, predicate pushdown and column pruning for free. At
  * cluster scale these would be external-catalog tables (possibly
  * bucketed by the join keys); the loader is the single seam where that
  * swap happens.
  */
object Tables {
  private def p(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as a long (nanosAsLong) and floor-convert to a
    * microsecond TimestampType — integer `div`, not double division
    * (epoch-nanos exceed double's 53-bit mantissa). DuckDB's oracle
    * reads the same column as TIMESTAMP_NS and `epoch_us` floors
    * identically, so window bucketing and ordering agree. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(p(dir, "events"))
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(p(dir, "lineitem"))
  def orders(spark: SparkSession, dir: String): DataFrame     = spark.read.parquet(p(dir, "orders"))
  def customer(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(p(dir, "customer"))
  def supplier(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(p(dir, "supplier"))
  def part(spark: SparkSession, dir: String): DataFrame       = spark.read.parquet(p(dir, "part"))
  def nation(spark: SparkSession, dir: String): DataFrame     = spark.read.parquet(p(dir, "nation"))
  def region(spark: SparkSession, dir: String): DataFrame     = spark.read.parquet(p(dir, "region"))
  def documents(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(p(dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(p(dir, "embeddings"))
}
