package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI-enforced plan invariants: every representative query family must
  * plan without scale smells (cartesian products, codegen-free plans,
  * unexpected BNLJ) — regressions fail here instead of waiting for a
  * human to rerun the PlanAudit main. Runs at sf0.001 (plan shape does
  * not depend on the scale factor). */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Plan-shape checks must see the REAL logical tree: a registered
    * cache (a leak from another suite, or a module memo registered at
    * query-CONSTRUCTION time) substitutes an InMemoryRelation leaf
    * for the whole join/window tree and blinds every structural walk
    * — an order-dependent flake, not a plan regression. PlanAudit
    * .coldPlan constructs the frame and THEN clears the cache, so
    * even the query that creates a memo is inspected cold (module
    * memos recompute, correctness unaffected). */
  private def cold(name: String) =
    PlanAudit.coldPlan(spark, "/root/testdata/sf0.001", name)

  test("audited ∪ excluded covers the registry exactly, disjointly") {
    val audited = PlanAudit.DefaultNames.toSet
    val excluded = PlanAudit.Excluded.keySet
    val registry = SparkEntry.queries.keySet
    assert(audited.intersect(excluded).isEmpty,
      "a query cannot be both audited and excluded")
    assert(audited.union(excluded) == registry,
      s"uncovered: ${(registry -- audited -- excluded).toSeq.sorted}; " +
        s"stale: ${((audited ++ excluded) -- registry).toSeq.sorted}")
    PlanAudit.Excluded.foreach { case (n, why) =>
      assert(why.trim.length > 20, s"exclusion $n needs a real justification")
    }
    // ExpectedBnlj names queries whose BNLJ is by design — every one
    // must still exist (a renamed query must not leave a stale grant)
    assert((PlanAudit.ExpectedBnlj -- registry).isEmpty,
      s"stale ExpectedBnlj: ${(PlanAudit.ExpectedBnlj -- registry).toSeq.sorted}")
    PlanAudit.BoundedBareWindow.foreach { case (n, why) =>
      assert(registry.contains(n), s"stale BoundedBareWindow grant: $n")
      assert(why.trim.length > 20, s"grant $n needs a real bound statement")
    }
    PlanAudit.BoundedRangeResidual.foreach { case (n, why) =>
      assert(registry.contains(n), s"stale BoundedRangeResidual grant: $n")
      assert(why.trim.length > 20, s"grant $n needs a real bound statement")
    }
    PlanAudit.BoundedConstDomainJoin.foreach { case (n, why) =>
      assert(registry.contains(n), s"stale BoundedConstDomainJoin grant: $n")
      assert(why.trim.length > 20, s"grant $n needs a real bound statement")
    }
  }

  test("bounded-range-residual grants are live (the residual still plans)") {
    // a grant for a query whose join no longer carries a cross-side
    // range residual is stale noise — drop it so the smell check
    // covers a future reintroduction
    PlanAudit.BoundedRangeResidual.keys.foreach { name =>
      assert(PlanAudit.crossSideRangeResidualJoins(cold(name)).nonEmpty,
        s"$name no longer plans a cross-side range residual — drop its grant")
    }
  }

  test("the naive join-then-range-filter shape is flagged; bounded shapes are not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val clicks = Seq((1L, 10L), (1L, 20L), (2L, 30L))
      .toDF("user_id", "c_us")
    val purchases = Seq((1L, 15L), (2L, 25L))
      .toDF("user_id", "p_us")
    // the attribution_multitouch shape before the r19 rewrite:
    // equi-join on the user, range-filter the lifetime fan-out after
    val naive = purchases.join(clicks, Seq("user_id"))
      .filter(col("c_us") <= col("p_us") &&
        col("p_us") - col("c_us") < lit(100L))
    assert(PlanAudit.crossSideRangeResidualJoins(naive).nonEmpty,
      "the planted naive join-then-range-filter shape must be flagged")

    // per-key singleton suppression: the same range residual against
    // a per-user min-aggregate frame matches ≤1 row per key — bounded
    val firstPurchase = purchases.groupBy(col("user_id"))
      .agg(min(col("p_us")).as("p_us"))
    val bounded = clicks.join(firstPurchase, Seq("user_id"))
      .filter(col("c_us") <= col("p_us"))
    assert(PlanAudit.crossSideRangeResidualJoins(bounded).isEmpty,
      "a range residual against a per-key singleton aggregate is bounded")

    // a singleton grouped FINER than the equi key is NOT suppressed:
    // per-(user, day) rows still fan out per user
    val perDay = Seq((1L, 1L, 15L), (1L, 2L, 16L))
      .toDF("user_id", "day", "p_us")
      .groupBy(col("user_id"), col("day")).agg(min(col("p_us")).as("p_us"))
    val stillFans = clicks.join(perDay, Seq("user_id"))
      .filter(col("c_us") <= col("p_us"))
    assert(PlanAudit.crossSideRangeResidualJoins(stillFans).nonEmpty,
      "grouping finer than the equi key must not suppress the smell")
  }

  test("the planted fixed-cell mining shape is flagged; the scaled-domain and assignment shapes are not") {
    // the r19 sf10 cliff class made structural (VERDICT r19 #3): an
    // equi-join on a key whose domain is literal-bounded (the
    // `vec_id < 16` pivot carve) while both sides are corpus-sized is
    // O(N²/K) candidate rows no matter what per-cell bound the code
    // comments claim — K doesn't scale with N.
    import org.apache.spark.sql.functions._
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").getItem(0).as("x"))
    val piv = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("pid"), col("x").as("px"))
    val cells = e.crossJoin(broadcast(piv))
      .withColumn("d", abs(col("x") - col("px")))
      .groupBy(col("vec_id")).agg(min_by(col("pid"), col("d")).as("cell"))
    val a = cells.select(col("vec_id").as("v1"), col("cell"))
    val b = cells.select(col("vec_id").as("v2"), col("cell"))
    val mined = a.join(b, Seq("cell")).filter(col("v1") < col("v2"))
    assert(PlanAudit.constDomainKeyJoins(mined).nonEmpty,
      "the planted fixed-16-cell all-pairs mining shape must be flagged")

    // the FIX shape: a data-derived cell count (√N pivots) is a
    // non-foldable bound — the domain scales with the corpus and the
    // same join is clean
    val nc = e.agg(greatest(lit(4L),
      expr("cast(floor(sqrt(count(1))) as bigint)")).as("ncells"))
    val pivN = e.crossJoin(broadcast(nc)).filter(col("vec_id") < col("ncells"))
      .select(col("vec_id").as("pid"), col("x").as("px"))
    val cellsN = e.crossJoin(broadcast(pivN))
      .withColumn("d", abs(col("x") - col("px")))
      .groupBy(col("vec_id")).agg(min_by(col("pid"), col("d")).as("cell"))
    val minedN = cellsN.select(col("vec_id").as("v1"), col("cell"))
      .join(cellsN.select(col("vec_id").as("v2"), col("cell")), Seq("cell"))
      .filter(col("v1") < col("v2"))
    assert(PlanAudit.constDomainKeyJoins(minedN).isEmpty,
      "a corpus-scaled cell domain must not be flagged")

    // the ASSIGNMENT shape: corpus joined on the constant key against
    // a frame grouped BY that key (≤K rows — the centroid/stats
    // dimension) is the bounded O(N·K) probe, suppressed
    val perCell = cells.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val assign = cells.join(perCell, Seq("cell"))
    assert(PlanAudit.constDomainKeyJoins(assign).isEmpty,
      "a per-key singleton side must suppress the smell")
  }

  test("const-domain-join grants are live (the constant-key join still plans)") {
    PlanAudit.BoundedConstDomainJoin.keys.foreach { name =>
      assert(PlanAudit.constDomainKeyJoins(cold(name)).nonEmpty,
        s"$name no longer plans a const-domain equi key — drop its grant")
    }
  }

  test("bounded-bare-window grants are live (the window still exists)") {
    // a grant for a query that no longer plans a bare window is stale
    // noise — the smell check would silently cover a future regression
    PlanAudit.BoundedBareWindow.keys.foreach { name =>
      assert(PlanAudit.unboundedBareWindows(cold(name)).nonEmpty,
        s"$name no longer plans a partition-less window — drop its grant")
    }
  }

  test("representative query plans are smell-free at sf0.001") {
    val bad = PlanAudit.DefaultNames.flatMap { name =>
      val (_, smells) = PlanAudit.audit(spark, "/root/testdata/sf0.001", name)
      if (smells.isEmpty) None else Some(name -> smells)
    }
    assert(bad.isEmpty, s"plan smells: $bad")
  }

  test("the documented bounded-BNLJ plans still broadcast a bounded side") {
    // these MAY contain a BNLJ by design — but must still be
    // codegen'd and cartesian-free
    PlanAudit.ExpectedBnlj.foreach { name =>
      val (plan, smells) = PlanAudit.audit(spark, "/root/testdata/sf0.001", name)
      assert(smells.isEmpty, s"$name: $smells")
      assert(!plan.contains("CartesianProduct"), s"$name planned a cartesian")
    }
  }
}
