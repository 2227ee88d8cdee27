package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table write/read path: pre-shuffling fact tables into
  * bucket files by their join key so repeated joins and aggregations
  * on that key run WITHOUT an exchange (the classic warehouse layout
  * for a 100 TB fact table joined every day on the same key).
  *
  * `bucketBy` requires a catalog table (`saveAsTable`) — bucket
  * metadata lives in the catalog, not the parquet footer. With the
  * in-memory/derby catalog this lands under spark.sql.warehouse.dir;
  * on a cluster the same call against a shared metastore produces
  * co-located scans for every reader.
  */
object Bucketed {

  /** Write `df` bucketed (and sorted) by `key` into catalog table
    * `table`. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
