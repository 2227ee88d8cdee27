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
}
