package graft.operators

import graft.plans.{AsOfJoin, AsOfJoinStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.types.{LongType, TimestampType}

/** User API over the native as-of join plan node (graft.plans).
  * Same semantics as AsOf.join (inclusive, deterministic ties); the
  * physical plan is a co-partitioned linear merge instead of a
  * union+window.
  *
  * Column name collisions between the two sides must be resolved by
  * the caller (rename before joining), like any Spark join.
  */
object AsOfNative {

  private def attr(df: DataFrame, name: String): Attribute =
    df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not found in [${df.columns.mkString(", ")}]"))

  def join(probe0: DataFrame, build0: DataFrame, key: String,
           probeTime: String, buildTime: String,
           probeTie: String, buildTie: String): DataFrame = {
    val spark = probe0.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // Re-alias every output column: when both sides share a base
    // relation, DeduplicateRelations regenerates the right subtree's
    // exprIds during analysis of the combined plan; attributes stored
    // in the AsOfJoin node would dangle. Alias exprIds are unique per
    // side, survive the dedup substitution, and stay bindable.
    import org.apache.spark.sql.functions.col
    val probe = probe0.select(probe0.columns.map(c => col(c).as(c)).toSeq: _*)
    val build = build0.select(build0.columns.map(c => col(c).as(c)).toSeq: _*)
    val (lp, rp) = (probe.queryExecution.analyzed, build.queryExecution.analyzed)
    val (lk, rk) = (attr(probe, key), attr(build, key))
    val (lt, rt) = (attr(probe, probeTime), attr(build, buildTime))
    val (ltie, rtie) = (attr(probe, probeTie), attr(build, buildTie))
    require(lk.dataType == LongType && rk.dataType == LongType,
      s"as-of key must be LongType, got ${lk.dataType}/${rk.dataType}")
    Seq(lt, rt).foreach(a => require(
      a.dataType == TimestampType || a.dataType == LongType,
      s"as-of time must be TimestampType/LongType, got ${a.dataType}"))
    require(ltie.dataType == LongType && rtie.dataType == LongType,
      s"as-of tie must be LongType, got ${ltie.dataType}/${rtie.dataType}")
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      AsOfJoin(lp, rp, lk, rk, lt, rt, ltie, rtie))
  }
}
