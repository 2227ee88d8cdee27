package graft

import graft.operators.Triangles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Triangle census on closed-form graphs, a brute-force sweep, and
  * partitioning invariance. */
class TrianglesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def censusMap(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    Triangles.census(edges.toDF("d1", "d2"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("complete graph K4: every vertex deg 3, 3 triangles, lcc 1") {
    val k4 = for (a <- 0L until 4L; b <- (a + 1) until 4L) yield (a, b)
    val got = censusMap(k4)
    assert(got.keySet == (0L until 4L).toSet)
    got.values.foreach { case (deg, tri, lcc) =>
      assert((deg, tri, lcc) == ((3L, 3L, 1.0)))
    }
  }

  test("cycle C5: deg 2, no triangles, lcc 0") {
    val c5 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L))
    censusMap(c5).values.foreach { case (deg, tri, lcc) =>
      assert((deg, tri, lcc) == ((2L, 0L, 0.0)))
    }
  }

  test("star: hub triangle-free with lcc 0, leaves deg 1") {
    val star = (1L to 5L).map(i => (0L, i))
    val got = censusMap(star)
    assert(got(0L) == ((5L, 0L, 0.0)))
    (1L to 5L).foreach(i => assert(got(i) == ((1L, 0L, 0.0))))
  }

  test("bowtie: two triangles sharing one edge") {
    // a-b-c triangle + a-b-d triangle: a,b in both (deg 3, lcc 2/3)
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L))
    val got = censusMap(e)
    assert(got(0L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(1L) == ((3L, 2L, 2.0 / 3.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((2L, 1L, 1.0)))
  }

  test("matches brute-force three-join count on a pseudo-random graph") {
    import spark.implicits._
    // deterministic graph: edge (a, b) present iff md5-ish mix is
    // small — ~120 edges over 40 vertices, plenty of triangles
    val n = 40L
    val edges = (for {
      a <- 0L until n; b <- (a + 1) until n
      if ((a * 2654435761L + b * 40503L) % 13) < 2
    } yield (a, b)).toSeq
    val e = edges.toDF("d1", "d2")
    val brute = e.as("e1")
      .join(e.as("e2"), col("e1.d2") === col("e2.d1"))
      .join(e.as("e3"),
        col("e3.d1") === col("e1.d1") && col("e3.d2") === col("e2.d2"))
      .count()
    val got = Triangles.census(e)
    val total = got.agg(sum(col("n_triangles"))).head().getLong(0)
    assert(total == 3 * brute, s"per-vertex sum $total vs 3×$brute")
    // and identical under a different partitioning
    val rep = Triangles.census(e.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rep == base)
  }
}
