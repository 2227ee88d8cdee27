package graft

import graft.functions.expressions.{QSketchQuantile, QSketchUnion, QuantileOps, QuantileSketchAgg, QuantileSketchBuild}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantile-sketch family: relative-error accuracy against exact
  * rank values, BIT-exact mergeability (the property that makes the
  * bytes a persistable, incrementally-maintainable column), sign/zero
  * handling, and the SQL surface. */
class QuantileSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val Alpha = 0.01

  /** Exact value at the sketch's rank convention: 0-indexed rank
    * floor(q * (n-1)) of the sorted values. */
  private def exactQ(sorted: Array[Double], q: Double): Double =
    sorted(math.min((q * (sorted.length - 1)).toLong, sorted.length - 1L).toInt)

  test("relative error within alpha on a skewed distribution") {
    import spark.implicits._
    // deterministic heavy-tailed values spanning 5 orders of magnitude
    val vals = (1 to 50000).map(i => math.exp((i % 997).toDouble / 86.0))
    val df = vals.toDF("v").repartition(8)
    val sorted = vals.toArray.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99)) {
      val est = df.agg(QuantileSketchAgg(col("v"), q, Alpha).as("e"))
        .head().getDouble(0)
      val exact = exactQ(sorted, q)
      assert(math.abs(est - exact) / exact <= Alpha * 1.05,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("negatives, zeros and nulls") {
    import spark.implicits._
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](-100.0, -10.0, -1.0, 0.0, 0.0, null, 1.0, 10.0, 100.0)
    val df = vals.toDF("v")
    val p50 = df.agg(QuantileSketchAgg(col("v"), 0.5).as("e")).head().getDouble(0)
    // 8 non-null values, rank floor(0.5*7)=3 -> the first 0.0
    assert(p50 == 0.0, s"p50 was $p50")
    val p0 = df.agg(QuantileSketchAgg(col("v"), 0.0).as("e")).head().getDouble(0)
    assert(math.abs(p0 - (-100.0)) / 100.0 <= Alpha * 1.05, s"p0 was $p0")
    val p1 = df.agg(QuantileSketchAgg(col("v"), 1.0).as("e")).head().getDouble(0)
    assert(math.abs(p1 - 100.0) / 100.0 <= Alpha * 1.05, s"p1 was $p1")
  }

  test("sketch bytes are bit-deterministic across partitionings") {
    import spark.implicits._
    val vals = (1 to 20000).map(i => ((i * 2654435761L) % 100000).toDouble)
    val one = vals.toDF("v").repartition(1)
      .agg(QuantileSketchBuild(col("v")).as("s")).head().getAs[Array[Byte]](0)
    val many = vals.toDF("v").repartition(13)
      .agg(QuantileSketchBuild(col("v")).as("s")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many),
      "merge order changed the serialized sketch")
  }

  test("scalar union of per-half sketches equals the whole-set sketch") {
    import spark.implicits._
    val df = spark.range(10000)
      .selectExpr("CAST(id % 3331 AS DOUBLE) AS v", "id % 2 AS half")
    val halves = df.groupBy("half").agg(QuantileSketchBuild(col("v")).as("s"))
      .agg(first(when(col("half") === 0, col("s")), ignoreNulls = true).as("s0"),
        first(when(col("half") === 1, col("s")), ignoreNulls = true).as("s1"))
      .select(QSketchUnion(col("s0"), col("s1")).as("u"))
      .head().getAs[Array[Byte]](0)
    val whole = df.agg(QuantileSketchBuild(col("v")).as("s"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(halves, whole),
      "union of half-sketches != whole-set sketch")
  }

  test("qsketch_value reads a persisted column; empty sketch is NULL") {
    import spark.implicits._
    val bytes = spark.range(1000).selectExpr("CAST(id + 1 AS DOUBLE) AS v")
      .agg(QuantileSketchBuild(col("v")).as("s")).head().getAs[Array[Byte]](0)
    val est = Seq(bytes).toDF("s")
      .select(QSketchQuantile(col("s"), 0.5).as("e")).head().getDouble(0)
    assert(math.abs(est - 500.0) / 500.0 <= Alpha * 1.05, s"p50 was $est")

    val empty = new QuantileOps.State(Alpha).serialize()
    val row = Seq(empty).toDF("s")
      .select(QSketchQuantile(col("s"), 0.5).as("e")).head()
    assert(row.isNullAt(0), "empty sketch should read as NULL")
  }

  test("SQL surface: qsketch_quantile / qsketch / qsketch_union / qsketch_value") {
    spark.range(10000).selectExpr("CAST(id AS DOUBLE) AS v", "id % 4 AS g")
      .createOrReplaceTempView("qs_vals")
    val direct = spark.sql(
      "SELECT qsketch_quantile(v, 0.5, 0.01) AS p50 FROM qs_vals")
      .head().getDouble(0)
    assert(math.abs(direct - 4999.0) / 4999.0 <= Alpha * 1.05, s"p50 was $direct")
    val viaCol = spark.sql(
      """SELECT qsketch_value(u, 0.9) AS p90 FROM (
        |  SELECT qsketch_union(
        |           qsketch(CASE WHEN g < 2 THEN v END),
        |           qsketch(CASE WHEN g >= 2 THEN v END)) AS u
        |  FROM qs_vals)""".stripMargin).head().getDouble(0)
    assert(math.abs(viaCol - 8999.0) / 8999.0 <= Alpha * 1.05, s"p90 was $viaCol")
  }

  test("plan-time validation carries the usage string") {
    // analysis failures may arrive wrapped; search the cause chain
    def chainMessage(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val m1 = chainMessage(intercept[Exception] {
      spark.sql("SELECT qsketch_quantile(1.0, 1.5) AS x").collect()
    })
    assert(m1.contains("qsketch_quantile(value, q[, alpha])"), s"message was: $m1")
    val m2 = chainMessage(intercept[Exception] {
      spark.sql("SELECT qsketch(1.0, 0.7) AS x").collect()
    })
    assert(m2.contains("alpha must be in (0,0.5)"), s"message was: $m2")
  }

  test("registry query percentiles_qsketch holds its bound (the driver's rows-check +)") {
    val rows = SparkEntry.queries("percentiles_qsketch")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(r.fieldIndex("within_bound")),
      s"bound violated: $r"))
  }

  test("bucket-cap collapse keeps the count exact and high quantiles accurate") {
    // alpha small enough that a wide dynamic range overflows MaxBuckets
    val a = 0.001
    val st = new QuantileOps.State(a)
    val n = 12001
    (0 until n).foreach(k => st.insert(math.exp(k * 0.01))) // ~12k buckets
    // accumulation is pure addition — the cap is enforced only at the
    // read/serialize boundary so the fold is merge-order-independent
    assert(st.pos.size > QuantileOps.MaxBuckets, "cap fired mid-insert")
    st.canonicalize()
    assert(st.pos.size <= QuantileOps.MaxBuckets,
      s"store not collapsed: ${st.pos.size}")
    assert(st.total == n, "collapse lost counts")
    // order-independence in the OVERFLOW regime (the fix's contract):
    // reversed insertion order serializes bit-identically
    val st2 = new QuantileOps.State(a)
    (n - 1 to 0 by -1).foreach(k => st2.insert(math.exp(k * 0.01)))
    assert(java.util.Arrays.equals(st.serialize(), st2.serialize()),
      "overflow fold depends on insertion order")
    // the folded buckets are the LOWEST ones; p99 keeps full accuracy
    val exact99 = math.exp((0.99 * (n - 1)).toLong * 0.01)
    val est99 = st.quantile(0.99)
    assert(math.abs(est99 - exact99) / exact99 <= a * 1.05,
      s"p99 est=$est99 exact=$exact99")
  }

  test("negative-dominated collapse folds the extreme tail, keeping high quantiles accurate") {
    // mirror of the positive collapse test: overflow on the NEG store
    // must fold the most-negative buckets (the distribution's LOW
    // quantiles), never the near-zero ones p99 reads
    val a = 0.001
    val st = new QuantileOps.State(a)
    val n = 12001
    (0 until n).foreach(k => st.insert(-math.exp(k * 0.01)))
    st.canonicalize()
    assert(st.neg.size <= QuantileOps.MaxBuckets,
      s"store not collapsed: ${st.neg.size}")
    assert(st.total == n, "collapse lost counts")
    // p99 of all-negative data is near zero: rank 0.99*(n-1) in
    // ascending order = the (n-1-that)-th largest magnitude
    val exact99 = -math.exp((n - 1 - (0.99 * (n - 1)).toLong) * 0.01)
    val est99 = st.quantile(0.99)
    assert(math.abs(est99 - exact99) / math.abs(exact99) <= a * 1.05,
      s"p99 est=$est99 exact=$exact99")
  }

  test("union rejects sketches of different alpha with a clear error") {
    val a = new QuantileOps.State(0.01)
    val b = new QuantileOps.State(0.02)
    a.insert(1.0); b.insert(2.0)
    val e = intercept[IllegalArgumentException] {
      QuantileOps.union(a.serialize(), b.serialize())
    }
    assert(e.getMessage.contains("different alpha"))
  }

  test("octave-histogram quantiles stay within 2% of the exact percentiles") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val est = SparkEntry.queries("percentiles_octave_fp")(spark, sf)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val exact = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.5) * 100").as("p50"),
        expr("percentile(o_totalprice, 0.95) * 100").as("p95"))
      .collect().map(r =>
        r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (st, (e50, e95)) =>
      val (x50, x95) = exact(st)
      assert(math.abs(e50 - x50) <= 0.02 * x50,
        s"$st p50 est $e50 vs exact $x50")
      assert(math.abs(e95 - x95) <= 0.02 * x95,
        s"$st p95 est $e95 vs exact $x95")
    }
  }
}
