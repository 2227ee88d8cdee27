package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** Alternating large-star/small-star CC: label-propagation needed
  * diameter rounds (a long chain was the worst case); the star
  * algorithm must collapse the same graphs in a handful. */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("a", "b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 60-node chain collapses to one component in few rounds") {
    // diameter 59 — label propagation would need ~59 rounds; the star
    // algorithm must finish well inside 10
    val chain = (1L to 59L).map(i => (i, i + 1))
    val labels = cc(chain, maxIter = 10)
    assert(labels.size == 60)
    assert(labels.values.toSet == Set(1L))
  }

  test("disjoint clusters keep distinct min-id labels; self-loop-only node is its own singleton") {
    val edges = Seq((5L, 3L), (3L, 9L), (20L, 21L), (21L, 20L), (7L, 7L))
    val labels = cc(edges)
    assert(labels == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L,
      21L -> 20L, 7L -> 7L))
  }

  test("transitive near-dup pairs merge (a-b, b-c => one group)") {
    val labels = cc(Seq((10L, 11L), (11L, 12L), (100L, 12L)))
    assert(labels.values.toSet == Set(10L))
    assert(labels.keySet == Set(10L, 11L, 12L, 100L))
  }

  /** In-test reference: path-compressed union-find over the same
    * edges, labeled by component minimum. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }
  }

  test("random graphs match a union-find reference (seeded property sweep)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(60)
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }
      val expect = unionFind(edges)
      val got = cc(edges)
      assert(got == expect, s"trial $trial mismatch on ${edges.take(10)}...")
    }
  }
}
