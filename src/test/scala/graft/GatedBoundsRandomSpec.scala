package graft

import graft.functions.expressions.{HllSketchAgg, KmvEstimateFp, KmvSketchBuildMd5, QuantileSketchAgg}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized parity trials for the r18 gated-verdict scaffolds
  * (VERDICT r18 #6; GatedChecksSpec covers the fixture wiring, this
  * spec drives the SAME sketch expressions and the SAME bound
  * predicates the registered queries inline — copied verbatim below —
  * across random planted frames, so the bound constants are validated
  * against cardinalities and distributions the fixtures never reach).
  * All seeds are fixed and every sketch here is deterministic
  * (HLL++ register maxes and the md5 KMV are merge-order free; the
  * log-bucketed quantile sketch is count-additive), so the trials are
  * stable, not flaky. The ANN recall scaffolds are deliberately NOT
  * randomized: k-means codebook nondeterminism is exactly why their
  * floors are calibrated against measured bands (BENCHNOTES), and a
  * random-data trial would re-litigate the calibration, not test the
  * wiring. */
class GatedBoundsRandomSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Random per-group long-key frame: group g has `card(g)` distinct
    * keys, each duplicated 1-3x in shuffled order. */
  private def keyFrame(rnd: Random, cards: Seq[Int]): DataFrame = {
    import spark.implicits._
    val rows = cards.zipWithIndex.flatMap { case (card, g) =>
      val keys = Seq.fill(card)(rnd.nextLong())
      rnd.shuffle(keys.flatMap(k => Seq.fill(1 + rnd.nextInt(3))((g.toLong, k))))
    }
    rows.toDF("g", "k")
  }

  test("HLL gate bound (a2_distinct_hll shape) holds across random cardinalities") {
    val rnd = new Random(1901)
    // decades the fixture never reaches (per-user fixture max ~40)
    val cards = Seq(1, 2, 3, 7, 10, 25, 60, 150, 400, 1000, 3000, 8000)
    val got = keyFrame(rnd, cards)
      .groupBy(col("g"))
      .agg(countDistinct(col("k")).as("exact_keys"),
        HllSketchAgg(col("k")).as("hll_keys"))
      .select(col("g"), col("exact_keys"),
        // verbatim a2_distinct_hll bound
        (abs(col("exact_keys") - col("hll_keys"))
          <= greatest(lit(3.0), col("exact_keys") * 0.1)).as("within_bound"))
      .collect()
    assert(got.length == cards.size)
    got.foreach(r => assert(r.getBoolean(2),
      s"HLL bound violated at exact=${r.getLong(1)}"))
  }

  test("approx_count_distinct gate bound (a2_distinct_approx shape) holds across random cardinalities") {
    val rnd = new Random(1902)
    val cards = Seq(1, 5, 12, 40, 90, 250, 700, 2000, 6000)
    val got = keyFrame(rnd, cards)
      .groupBy(col("g"))
      .agg(countDistinct(col("k")).as("distinct_click_keys"),
        approx_count_distinct(col("k"), 0.02).as("approx_click_keys"))
      .select(col("g"), col("distinct_click_keys"),
        // verbatim a2_distinct_approx bound
        (abs(col("distinct_click_keys") - col("approx_click_keys"))
          <= greatest(lit(2.0), col("distinct_click_keys") * 0.1))
          .as("within_bound"))
      .collect()
    got.foreach(r => assert(r.getBoolean(2),
      s"approx bound violated at exact=${r.getLong(1)}"))
  }

  test("KMV-md5 gate (a2_distinct_kmv_md5 shape): exact below capacity on random keysets, graceful above") {
    import spark.implicits._
    val rnd = new Random(1903)
    // below k=256: the sketch holds every distinct hash — estimate is
    // EXACT by construction (the query's exact_below_capacity claim),
    // whatever the key material
    val below = (0 until 12).flatMap { g =>
      val card = 1 + rnd.nextInt(255)
      val keys = Seq.fill(card)(rnd.alphanumeric.take(8 + rnd.nextInt(8)).mkString)
      rnd.shuffle(keys.flatMap(k => Seq.fill(1 + rnd.nextInt(2))((g.toLong, k))))
    }
    val gotBelow = below.toDF("g", "ks")
      .groupBy(col("g"))
      .agg(countDistinct(col("ks")).as("exact_keys"),
        KmvEstimateFp(KmvSketchBuildMd5(col("ks"), 256)).as("kmv_keys"))
      .collect()
    gotBelow.foreach { r =>
      assert(r.getLong(1) < 256)
      assert(r.getLong(1) == r.getLong(2),
        s"KMV below capacity must be exact: ${r.getLong(1)} vs ${r.getLong(2)}")
    }
    // above capacity the estimator takes over: k/th scaling, std err
    // ~1/sqrt(256) ~ 6% — hold random 2k/20k-key groups to 20%
    // (deterministic md5, so this is a pin, not a flake)
    val above = Seq(2000, 20000).zipWithIndex.flatMap { case (card, g) =>
      (0 until card).map(i => (g.toLong, s"key-$g-$i-${rnd.nextInt()}"))
    }
    val gotAbove = above.toDF("g", "ks")
      .groupBy(col("g"))
      .agg(countDistinct(col("ks")).as("exact_keys"),
        KmvEstimateFp(KmvSketchBuildMd5(col("ks"), 256)).as("kmv_keys"))
      .collect()
    gotAbove.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - exact) <= exact * 0.2,
        s"KMV above capacity drifted: exact=$exact est=$est")
    }
  }

  test("quantile-sketch gate bound (percentiles_qsketch shape) holds across random distributions") {
    import spark.implicits._
    val rnd = new Random(1904)
    // price-scaled continuous-ish shapes: uniform, exponential-tailed,
    // integer-cents with duplicates — the regimes where the query's
    // max(10, 2%) claim must hold (adversarial two-point gaps are an
    // interpolation artifact, not a sketch property, and no fixture
    // column has them)
    val rows =
      (0 until 4000).map(_ => (0L, 1000.0 + rnd.nextDouble() * 499000.0)) ++
      (0 until 4000).map(_ => (1L, 1000.0 * math.exp(rnd.nextDouble() * 6.0))) ++
      (0 until 4000).map(_ => (2L, (100000 + rnd.nextInt(400000)) / 100.0 * 100))
    val got = rows.toDF("g", "v")
      .groupBy(col("g"))
      .agg(
        round(expr("percentile(v, 0.5)"), 4).as("exact_p50"),
        round(expr("percentile(v, 0.95)"), 4).as("exact_p95"),
        QuantileSketchAgg(col("v"), 0.5).as("sk_p50"),
        QuantileSketchAgg(col("v"), 0.95).as("sk_p95"))
      .select(col("g"),
        // verbatim percentiles_qsketch bound
        ((abs(col("sk_p50") - col("exact_p50"))
          <= greatest(lit(10.0), col("exact_p50") * 0.02)) &&
         (abs(col("sk_p95") - col("exact_p95"))
          <= greatest(lit(10.0), col("exact_p95") * 0.02))).as("within_bound"),
        col("exact_p50"), col("sk_p50"), col("exact_p95"), col("sk_p95"))
      .collect()
    assert(got.length == 3)
    got.foreach(r => assert(r.getBoolean(1), s"qsketch bound violated: $r"))
    // and approx_percentile under percentiles_approx's bound, same frames
    val gotA = rows.toDF("g", "v")
      .groupBy(col("g"))
      .agg(round(expr("percentile(v, 0.5)"), 4).as("exact_p50"),
        round(expr("approx_percentile(v, 0.5, 1000)"), 4).as("approx_p50"))
      .select((abs(col("approx_p50") - col("exact_p50"))
        <= greatest(lit(10.0), col("exact_p50") * 0.02)).as("within_bound"),
        col("exact_p50"), col("approx_p50"))
      .collect()
    gotA.foreach(r => assert(r.getBoolean(0), s"approx_percentile bound violated: $r"))
  }

  test("constant-count anchor carve (embed_hard_negatives shape) concentrates at AnchorTarget across corpus decades") {
    // the r20 rewrite's statistical contract: anchors = rows whose
    // portable hash lands under rate_pb = least(10⁹, T·10⁹ div N)
    // per BILLION (r21: per-mille rounded to ZERO past n > T·1000 —
    // the sweep now crosses that cliff at n=250k, which the old rate
    // failed with carved=0). Below the target the carve must keep
    // EVERYTHING (rate saturates at 10⁹); above it the count is
    // Binomial(N, ~T/N) — mean ≤ T with std ≈ √T, so a [T/2, 2T]
    // window is ≈ 7σ: a pin, not a flake. Random SPARSE id sets (not
    // the fixtures' contiguous 0..N-1) so the md5 carve is validated
    // on id shapes the corpus never has. What this pins at 100 TB:
    // the anchor set — and with it the mining join's candidate side —
    // stays O(T), never O(N), for ANY corpus size.
    import spark.implicits._
    val rnd = new Random(2007)
    val T = graft.queries.EmbeddingQueries.AnchorTarget
    for (n <- Seq(50, T, 1000, 10000, 60000, 250000)) {
      val ids = Iterator.continually(math.abs(rnd.nextLong()))
        .distinct.take(n).toSeq
      val carved = ids.toDF("vec_id")
        .select(graft.functions.TextOps.portableHash(
          col("vec_id").cast("string")).as("h"))
        // verbatim carve: integer per-billion rate over the corpus count
        .filter(col("h") % 1000000000L <
          least(lit(1000000000L), lit((T * 1000000000L) / n)))
        .count()
      if (n <= T) assert(carved == n,
        s"below the target the carve must keep all $n rows, kept $carved")
      else assert(carved >= T / 2 && carved <= 2L * T,
        s"n=$n: carve kept $carved, expected ~$T (O(T), never O(N))")
    }
  }
}
