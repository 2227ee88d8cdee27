package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (builder scale rules: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin.enabled, on
  * by default here) splits oversized sort-merge partitions at runtime
  * and is the first line of defense. Salting is the explicit fallback
  * for the cases AQE cannot fix — e.g. a single hot key inside a hash
  * aggregation or a broadcast-ineligible dimension join — and for
  * engines/settings where AQE is off (stateful streaming disables it).
  *
  * Mechanics: the skewed (large) side gets a deterministic salt from
  * a uniformly-distributed existing expression (NOT rand(): benchmarks
  * and retries must reproduce); the other side is replicated
  * `saltBuckets` times via explode. The join key becomes
  * (key, salt) — one hot key now spreads over `saltBuckets` tasks.
  */
object SkewJoin {

  /** Inner-join `big ⨝ small` on `key`, spreading each big-side key
    * over `saltBuckets` partitions. `saltExpr` must be a deterministic
    * uniformly-ish expression over big's columns (e.g.
    * `pmod(xxhash64(col("event_id")), lit(n))`). */
  def salted(big: DataFrame, small: DataFrame, key: String,
             saltBuckets: Int, saltExpr: org.apache.spark.sql.Column): DataFrame = {
    val bigSalted = big.withColumn("_salt", saltExpr % saltBuckets)
    val smallExploded = small
      .withColumn("_salt0", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("_salt", col("_salt0").cast(bigSalted.schema("_salt").dataType))
      .drop("_salt0")
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }
}
