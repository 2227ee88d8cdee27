package graft

import java.security.MessageDigest

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The per-basket item cap ([[AnalyticsQueries.capBasketItems]]):
  * the one guard that bounds the co-purchase self-join's quadratic
  * fan-out. Three pins:
  *
  *   1. on fixture data (max basket 17 distinct items ≪ the cap of
  *      64) the carve is a bit-exact no-op — so every existing
  *      basket oracle stays hash-green;
  *   2. a PLANTED mega-basket is actually bounded: 5,000 items in,
  *      exactly [[AnalyticsQueries.BasketItemCap]] survive, and the
  *      pair join emits C(64, 2) rows for that order, not
  *      C(5000, 2) ≈ 12.5M;
  *   3. randomized parity: the kept subset equals an independent
  *      Scala re-derivation of the md5 hash-rank (sort by
  *      (md5hex("o:i"), i), keep the first 64) across random basket
  *      mixes spanning the cap — the same trial style the
  *      SubstringDedup/JaccardPrefix rewrites are pinned with, and
  *      the in-JVM twin of the oracle CTE's row_number carve.
  */
class BasketCapSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val Cap = AnalyticsQueries.BasketItemCap

  private def keyOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def rawBi: DataFrame =
    graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))

  test("cap is a bit-exact no-op on fixture baskets (all below the cap)") {
    val uncapped = rawBi.distinct()
    val capped = AnalyticsQueries.capBasketItems(rawBi)
    val maxBasket = uncapped.groupBy(col("o")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxBasket < Cap,
      s"fixture grew a basket ($maxBasket) >= cap ($Cap): re-pick the cap")
    assert(keyOf(capped) == keyOf(uncapped))
  }

  test("planted mega-basket: items and pair fan-out are hard-bounded") {
    import spark.implicits._
    val mega = (1L to 5000L).map(i => (999999L, i))
    val small = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L))
    val lines = (mega ++ small).toDF("o", "i")
    val bi = AnalyticsQueries.capBasketItems(lines).cache()
    try {
      val perOrder = bi.groupBy(col("o")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perOrder(999999L) == Cap.toLong)
      assert(perOrder(1L) == 2L && perOrder(2L) == 3L)
      // the self-join shape basketPairs uses, pre-support-floor
      val pairs = bi.select(col("o"), col("i").as("i1"))
        .join(bi.select(col("o"), col("i").as("i2")), Seq("o"))
        .filter(col("i1") < col("i2"))
      val megaPairs = pairs.filter(col("o") === 999999L).count()
      assert(megaPairs == Cap.toLong * (Cap - 1) / 2,
        s"mega-basket fanned into $megaPairs pairs")
      assert(pairs.count() == Cap.toLong * (Cap - 1) / 2 + 1 + 3)
    } finally bi.unpersist()
  }

  test("randomized parity: kept subset == independent md5 hash-rank re-derivation") {
    import spark.implicits._
    val md = MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rnd = new Random(181)
    (1 to 3).foreach { trial =>
      // basket sizes straddle the cap: 1 .. 3*Cap distinct items
      val lines = (1 to 40).flatMap { o =>
        val size = 1 + rnd.nextInt(3 * Cap)
        rnd.shuffle((1 to 10000).toList).take(size)
          .map(i => (o.toLong, i.toLong))
      }
      val expected = lines.groupBy(_._1).toSeq.flatMap { case (o, items) =>
        items.map(_._2).distinct
          .sortBy(i => (md5hex(s"$o:$i"), i))
          .take(Cap).map(i => (o, i))
      }.toSet
      val got = keyOf(AnalyticsQueries.capBasketItems(lines.toDF("o", "i")))
      assert(got == expected, s"trial $trial diverged")
    }
  }
}
