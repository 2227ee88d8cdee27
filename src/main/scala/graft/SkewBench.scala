package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: measure the skew toolbox on a synthetic hot key —
  * evidence for the "skewed keys → salting or AQE skew-join" scale
  * rule rather than an assertion of it. Not part of the driver
  * contract.
  *
  * Workload: `rows` fact rows over `nKeys` join keys where ONE key
  * owns `hotPct`% of all rows (the power-law tenant/null-bucket
  * shape), aggregated per key after an inner join against a
  * `nKeys`-row dimension that is forced OUT of broadcast range (the
  * regime where a shuffle join is genuinely required — with the dim
  * broadcast the skew never materializes, which is why broadcast is
  * always the first escape). Three plans over identical data:
  *
  *   plain : sort-merge join, AQE skew splitting OFF
  *   aqe   : sort-merge join, AQE skew splitting ON (runtime split)
  *   salted: SkewJoin.salted, AQE OFF (explicit (key, salt) spread)
  *
  *   SPARK_GRAFT_SKEW_ROWS=20000000 SPARK_GRAFT_SKEW_HOT=50
  *   sbt "runMain graft.SkewBench"
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    val hotPct = sys.env.getOrElse("SPARK_GRAFT_SKEW_HOT", "50").toInt
    val nKeys = 100000L
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force the real shuffle-join regime: no broadcast escape
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hotPct% of rows on key 0, the rest uniform over the key space;
    // payload is arithmetic so time measures join+agg, not generation
    val fact = spark.range(rows).selectExpr(
      s"CASE WHEN id % 100 < $hotPct THEN 0 ELSE id % $nKeys END AS k",
      "id AS v")
    val dim = spark.range(nKeys).selectExpr("id AS k", "id % 7 AS grp")

    def time(label: String, aqe: Boolean)(plan: () => org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        plan().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[skewbench] $label%-6s rows=$rows hot=$hotPct%%: " +
        times.map(t => f"$t%.2f").mkString(", ") + " s")
    }

    time("plain", aqe = false)(() =>
      fact.join(dim, "k").groupBy("grp").agg(sum("v")))
    time("aqe", aqe = true)(() =>
      fact.join(dim, "k").groupBy("grp").agg(sum("v")))
    time("salted", aqe = false)(() =>
      graft.operators.SkewJoin
        .salted(fact, dim, "k", 32, pmod(xxhash64(col("v")), lit(32)))
        .groupBy("grp").agg(sum("v")))
    spark.stop()
  }
}
