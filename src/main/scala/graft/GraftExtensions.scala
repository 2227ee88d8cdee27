package graft

import graft.functions.expressions.{BloomFilterAgg, BloomMightContain, CmsEstimate, CmsUnion, CosineSimilarity, CountMinAgg, HllEstimate, HllSketchAgg, HllSketchBuild, HllUnion, KmvEstimate, KmvIntersect, KmvSketchBuild, KmvUnion, L2DistanceFp, MisraGriesAgg, QSketchQuantile, QSketchUnion, QuantileSketchAgg, QuantileSketchBuild, SimHash, ZOrderCode}
import graft.plans.AsOfJoinStrategy
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions (SQL: cosine_sim, hll_distinct) and the as-of join
  * planner strategy. Attach with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Evaluate a foldable argument expression to an Int, failing with
    * the calling function's usage string. A bare
    * `eval().asInstanceOf[Number]` NPEs on a NULL literal and throws a
    * context-free ClassCastException on a foldable string/decimal —
    * neither tells the user which function or argument was wrong. */
  private def litInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      usage: String, name: String): Int = {
    require(e.foldable, s"$usage: $name must be an integer literal")
    def fit(l: Long): Int = {
      // intValue() alone would wrap: bloom_agg(k, 4294967304) silently
      // becomes an 8-BIT filter whose every probe answers true
      require(l >= Int.MinValue && l <= Int.MaxValue,
        s"$usage: $name is out of Int range: $l")
      l.toInt
    }
    e.eval() match {
      case d: java.lang.Double =>
        // longValue() would silently truncate lit(65536.5); hold
        // floating literals to the same integral rule as Decimal
        require(d.doubleValue() == Math.rint(d.doubleValue()) && !d.isInfinite && !d.isNaN,
          s"$usage: $name must be an integral value, got $d")
        fit(d.longValue())
      case f: java.lang.Float =>
        require(f.floatValue() == Math.rint(f.floatValue()).toFloat && !f.isInfinite && !f.isNaN,
          s"$usage: $name must be an integral value, got $f")
        fit(f.longValue())
      case n: java.lang.Number => fit(n.longValue())
      case d: org.apache.spark.sql.types.Decimal =>
        // via BigDecimal: Decimal.toLong itself wraps past Long range,
        // and isValidInt additionally rejects fractional literals
        val bd = d.toBigDecimal
        require(bd.isValidInt, s"$usage: $name is out of Int range: $bd")
        bd.toInt
      case other =>
        val got = if (other == null) "NULL" else s"$other (${e.dataType.sql})"
        throw new IllegalArgumentException(
          s"$usage: $name must be an integer literal, got $got")
    }
  }

  /** Foldable fractional literal (quantile q, sketch alpha) with the
    * same plan-time, usage-carrying failure mode as [[litInt]]. */
  private def litDouble(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      usage: String, name: String): Double = {
    require(e.foldable, s"$usage: $name must be a numeric literal")
    e.eval() match {
      case n: java.lang.Number =>
        val d = n.doubleValue()
        require(!d.isNaN && !d.isInfinite, s"$usage: $name must be finite, got $d")
        d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other =>
        val got = if (other == null) "NULL" else s"$other (${e.dataType.sql})"
        throw new IllegalArgumentException(
          s"$usage: $name must be a numeric literal, got $got")
    }
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("l2_fp"),
      new ExpressionInfo(classOf[L2DistanceFp].getName, "l2_fp"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2DistanceFp(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, "hll_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HllSketchAgg(exprs.head).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("hll_sketch"),
      new ExpressionInfo(classOf[HllSketchBuild].getName, "hll_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, s"hll_sketch takes 1 argument, got ${exprs.length}")
        HllSketchBuild(exprs.head).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("hll_union"),
      new ExpressionInfo(classOf[HllUnion].getName, "hll_union"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, s"hll_union takes 2 arguments, got ${exprs.length}")
        HllUnion(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("hll_estimate"),
      new ExpressionInfo(classOf[HllEstimate].getName, "hll_estimate"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, s"hll_estimate takes 1 argument, got ${exprs.length}")
        HllEstimate(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "cms_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, s"cms_sketch takes 1 argument, got ${exprs.length}")
        CountMinAgg(exprs.head).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("cms_union"),
      new ExpressionInfo(classOf[CmsUnion].getName, "cms_union"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, s"cms_union takes 2 arguments, got ${exprs.length}")
        CmsUnion(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, s"cms_estimate takes 2 arguments, got ${exprs.length}")
        CmsEstimate(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 2,
          s"simhash takes 1 or 2 arguments, got ${exprs.length}")
        val bits =
          if (exprs.length > 1) litInt(exprs(1), "simhash(arr[, bits])", "bits")
          else 32
        SimHash(exprs.head, bits)
      }))
    e.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 3,
          s"bloom_agg(key[, numBits, numHashes]) takes 1-3 arguments, got ${exprs.length}")
        val usage = "bloom_agg(key[, numBits, numHashes])"
        val numBits = if (exprs.length > 1) litInt(exprs(1), usage, "numBits") else 1 << 20
        val numHashes = if (exprs.length > 2) litInt(exprs(2), usage, "numHashes") else 5
        // the header stores k in 5 bits capped at 16; rejecting here at
        // plan time carries the usage string instead of failing deep in
        // aggregation finalization with a context-free message
        require(numHashes >= 1 && numHashes <= 16,
          s"$usage: numHashes must be in [1,16], got $numHashes")
        require(numBits >= 8, s"$usage: numBits must be >= 8, got $numBits")
        // the chosen k travels in the filter's header byte, so the
        // probe side needs no matching argument
        BloomFilterAgg(exprs.head, numBits, numHashes).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"bloom_might_contain takes 2 arguments, got ${exprs.length}")
        BloomMightContain(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 2,
          s"misra_gries takes 1 or 2 arguments, got ${exprs.length}")
        val cap =
          if (exprs.length > 1) litInt(exprs(1), "misra_gries(item[, capacity])", "capacity")
          else 200
        MisraGriesAgg(exprs.head, cap).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("qsketch_quantile"),
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, "qsketch_quantile"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val usage = "qsketch_quantile(value, q[, alpha])"
        require(exprs.length == 2 || exprs.length == 3,
          s"$usage takes 2 or 3 arguments, got ${exprs.length}")
        val q = litDouble(exprs(1), usage, "q")
        val alpha = if (exprs.length > 2) litDouble(exprs(2), usage, "alpha") else 0.01
        require(q >= 0.0 && q <= 1.0, s"$usage: q must be in [0,1], got $q")
        require(alpha > 0.0 && alpha < 0.5,
          s"$usage: alpha must be in (0,0.5), got $alpha")
        QuantileSketchAgg(exprs.head, q, alpha).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("qsketch"),
      new ExpressionInfo(classOf[QuantileSketchBuild].getName, "qsketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val usage = "qsketch(value[, alpha])"
        require(exprs.nonEmpty && exprs.length <= 2,
          s"$usage takes 1 or 2 arguments, got ${exprs.length}")
        val alpha = if (exprs.length > 1) litDouble(exprs(1), usage, "alpha") else 0.01
        require(alpha > 0.0 && alpha < 0.5,
          s"$usage: alpha must be in (0,0.5), got $alpha")
        QuantileSketchBuild(exprs.head, alpha).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("qsketch_union"),
      new ExpressionInfo(classOf[QSketchUnion].getName, "qsketch_union"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"qsketch_union takes 2 arguments, got ${exprs.length}")
        QSketchUnion(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("qsketch_value"),
      new ExpressionInfo(classOf[QSketchQuantile].getName, "qsketch_value"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val usage = "qsketch_value(sketch, q)"
        require(exprs.length == 2, s"$usage takes 2 arguments, got ${exprs.length}")
        val q = litDouble(exprs(1), usage, "q")
        require(q >= 0.0 && q <= 1.0, s"$usage: q must be in [0,1], got $q")
        QSketchQuantile(exprs.head, q)
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchBuild].getName, "kmv_sketch"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val usage = "kmv_sketch(key[, k])"
        require(exprs.nonEmpty && exprs.length <= 2,
          s"$usage takes 1 or 2 arguments, got ${exprs.length}")
        val k = if (exprs.length > 1) litInt(exprs(1), usage, "k") else 1024
        require(k >= 8 && k <= (1 << 20),
          s"$usage: k must be in [8, 2^20], got $k")
        KmvSketchBuild(exprs.head, k).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_union"),
      new ExpressionInfo(classOf[KmvUnion].getName, "kmv_union"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, s"kmv_union takes 2 arguments, got ${exprs.length}")
        KmvUnion(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_estimate"),
      new ExpressionInfo(classOf[KmvEstimate].getName, "kmv_estimate"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, s"kmv_estimate takes 1 argument, got ${exprs.length}")
        KmvEstimate(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("kmv_intersect"),
      new ExpressionInfo(classOf[KmvIntersect].getName, "kmv_intersect"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"kmv_intersect takes 2 arguments, got ${exprs.length}")
        KmvIntersect(exprs(0), exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("zorder_code"),
      new ExpressionInfo(classOf[ZOrderCode].getName, "zorder_code"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length >= 2 && exprs.length <= 4,
          s"zorder_code(lane1, lane2[, lane3[, lane4]]) takes 2-4 arguments, got ${exprs.length}")
        ZOrderCode(exprs)
      }))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // store-operation statements (GRAFT SNAPSHOT/ROLLBACK) — the
    // training-run pin and the bad-publish escape hatch as plain SQL
    e.injectParser((_, parser) => new graft.plans.GraftSqlParser(parser))
  }
}
