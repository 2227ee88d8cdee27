package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank contract on a hand-computed graph plus the structural
  * invariants the oracle hash would not explain on failure: exact
  * fixed-point values per round, centrality ordering, near-conservation
  * of mass (floor-div leakage only), and rerun determinism.
  */
class PageRankSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // star: hub h cited by a, b, c; one chain edge a -> b
  private def star = Seq(
    ("a", "h"), ("b", "h"), ("c", "h"), ("a", "b")).toDF("src", "dst")

  test("one round matches the hand-computed fixed-point values") {
    // N=4, init r = 250000000000 each; d(a)=2, d(b)=1, d(c)=1
    // contrib: h <- r/2 + r + r = 625000000000, b <- r/2 = 125000000000
    // base = (15 * 250000000000) div 100 = 37500000000
    // r1(h) = base + (85 * 625000000000) div 100 = 568750000000
    // r1(b) = base + (85 * 125000000000) div 100 = 143750000000
    // r1(a) = r1(c) = base
    val got = PageRank.run(star, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "h" -> 568750000000L, "b" -> 143750000000L,
      "a" -> 37500000000L, "c" -> 37500000000L))
  }

  test("mass is conserved up to floor-div leakage; hub stays on top") {
    val n = 4L
    val r3 = PageRank.run(star, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = r3.values.sum
    // dangling h never redistributes its mass: after round 1 all
    // non-teleport mass parked on h leaks each round; bound loosely
    assert(total <= n * (PageRank.Scale / n))
    assert(total > 0)
    assert(r3("h") > r3("b") && r3("b") > r3("a"),
      s"centrality order must hold: $r3")
    assert(r3("a") == r3("c"), "symmetric nodes must tie exactly")
  }

  test("bidirectional edges conserve mass exactly up to remainders and rerun identically") {
    val both = star.union(star.select(col("dst").as("src"), col("src").as("dst")))
    val r5a = PageRank.run(both, 5).collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val r5b = PageRank.run(both, 5).collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(r5a.sameElements(r5b), "integer fixed-point must be rerun-identical")
    val total = r5a.map(_._2).sum
    // no dangling nodes: only floor-div remainders leak (< 1 per
    // node+edge per round — bound generously)
    val init = 4L * (PageRank.Scale / 4L)
    assert(total <= init && total >= init - 5 * 100, s"total=$total")
    val m = r5a.toMap
    assert(m("h") > m("a") && m("a") > m("c"),
      s"degree order h(3) > a(2) > c(1): $m")
  }

  test("iters bounds validated") {
    intercept[IllegalArgumentException] { PageRank.run(star, 0) }
    intercept[IllegalArgumentException] { PageRank.run(star, 21) }
  }

  test("personalized: restart mass stays near seeds; unreachable nodes are exactly 0") {
    // two components: a<->b<->c (seeded at a) and x<->y (unseeded);
    // plus a phantom seed 'zz' not in the graph (must be ignored)
    val comp = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("x", "y"), ("y", "x")).toDF("src", "dst")
    val seeds = Seq("a", "zz").toDF("node")
    val got = PageRank.personalized(comp, seeds, 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("a", "b", "c", "x", "y"))
    // |S ∩ V| = 1 → all restart mass on a
    assert(got("x") == 0L && got("y") == 0L,
      s"unseeded component must rank exactly 0: $got")
    // the whole seeded component accumulates mass (the walk reaches
    // every node within the 4 rounds); exact per-round ordering on a
    // path graph oscillates, so assert reachability + conservation
    assert(got("a") > 0L && got("b") > 0L && got("c") > 0L)
    assert(got.values.sum <= PageRank.Scale,
      "restart mass Scale bounds the total")
    // round 1 hand-check: b(a)=Scale, b(b)=b(c)=0; d(a)=1
    // r1(a) = (15*Scale)/100; r1(b) = (85*Scale)/100; r1(c) = 0
    val r1 = PageRank.personalized(comp, seeds, 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1("a") == 15L * PageRank.Scale / 100L)
    assert(r1("b") == 85L * PageRank.Scale / 100L)
    assert(r1("c") == 0L)
  }

  test("personalized with the full node set as seeds equals uniform pagerank") {
    val both = star.union(star.select(col("dst").as("src"), col("src").as("dst")))
    val allNodes = both.select(col("src").as("node")).distinct()
    val uni = PageRank.run(both, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    val per = PageRank.personalized(both, allNodes, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(uni.sameElements(per),
      "uniform seeds must reduce personalized PPR to plain PageRank")
  }
}
