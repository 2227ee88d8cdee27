package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval joins (SURVEY.md §2.9 extension): the
  * streaming form of the click→purchase attribution that `AsOf` /
  * `AsOfNative` answer in batch. Both sides carry watermarks, so the
  * join state for each side is bounded by watermark + lookback — the
  * two knobs that decide state size at 100 TB/day stream rates — and
  * Spark hash-partitions both streams on the key, so each micro-batch
  * joins co-located state without extra shuffles.
  *
  * Batch/stream parity: running the same frames through this operator
  * in batch mode plans an ordinary range join with identical output
  * (asserted in StreamJoinsSpec).
  */
object StreamJoins {

  /** Each left row pairs with right rows of the same `key` whose
    * `rightTs` falls in `[leftTs - lookback, leftTs]`. Column names on
    * the two sides must be disjoint apart from `key` (rename upstream);
    * the joined key column comes out once. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lookback: String = "30 minutes",
                   watermark: String = "15 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        col(rightTs) <= col(leftTs) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback"))
      .drop(r(key))
  }
}
