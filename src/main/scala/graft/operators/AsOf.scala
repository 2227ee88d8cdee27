package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the classic offline-feature-store join
  * (SURVEY.md §2.5 extension surface; not present in the reference,
  * which only does hash lookups).
  *
  * Implementation: union-then-window. Tag both sides, union them into
  * one keyed stream, sort per key by (time, side, tie) with build rows
  * ordered BEFORE probe rows at equal timestamps, and carry the latest
  * build-side attributes forward with `last(_, ignoreNulls = true)`.
  *
  * Scale rationale: ONE shuffle + sort on the key — no range explosion,
  * no per-probe scans, no broadcast requirement on either side. This is
  * the plan a dedicated as-of SparkStrategy would produce, composed
  * from built-ins (preference order (a) of the build rules).
  */
object AsOf {

  /** For each probe row, attach the most recent build row with the same
    * key and time <= probe time (inclusive; pre-shift buildTime for
    * strict semantics).
    *
    * @param probe     left side (keeps all rows)
    * @param build     right side (latest-at-time attrs are attached)
    * @param key       join key column name (same name both sides)
    * @param probeTime probe-side event-time column
    * @param buildTime build-side event-time column
    * @param probeTie  unique probe column breaking equal-time ties
    * @param buildTie  unique build column breaking equal-time ties —
    *                  REQUIRED for determinism: with duplicate
    *                  (key, time) pairs on the build side, "the" most
    *                  recent row is otherwise engine-dependent
    * @param carry     build-side columns to carry (renamed `asof_<c>`)
    */
  def join(probe: DataFrame, build: DataFrame, key: String,
           probeTime: String, buildTime: String,
           probeTie: String, buildTie: String,
           carry: Seq[String]): DataFrame = {
    val probeCols = probe.columns
    val pTagged = probe
      .withColumn("_t", col(probeTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", col(probeTie).cast("long"))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side"), col("_tie")) ++
        probeCols.map(c => col(c).as(s"_p_$c")) ++
        carry.map(c => lit(null).cast(build.schema(c).dataType).as(s"_b_$c")): _*)
    val bTagged = build
      .withColumn("_t", col(buildTime))
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(buildTie).cast("long"))
      .select(Seq(col(key).as("_k"), col("_t"), col("_side"), col("_tie")) ++
        probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(s"_p_$c")) ++
        carry.map(c => col(c).as(s"_b_$c")): _*)

    // build rows (side=0) sort before probe rows at the same timestamp,
    // so a probe at t sees a build at exactly t (inclusive as-of).
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried: Seq[Column] =
      carry.map(c => last(col(s"_b_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))

    pTagged.unionByName(bTagged)
      .select(col("*") +: carried: _*)
      .filter(col("_side") === 1)
      .select(probeCols.map(c => col(s"_p_$c").as(c)) ++
        carry.map(c => col(s"asof_$c")): _*)
  }
}
