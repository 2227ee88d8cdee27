package graft

import graft.functions.TextOps.tokens
import graft.functions.expressions.{KmvEstimate, KmvIntersect, KmvOps, KmvSketchBuild, KmvUnion}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV theta-sketch contract: exact below capacity, bounded error on
  * the sampling path (deterministic — fixed-seed xxhash64, so the
  * bounds are pinned, not flaky), canonical bytes invariant under
  * partitioning/merge order, union ≡ one-shot build, and the
  * distinct-intersection estimate that justifies the family tracking
  * the exact join. */
class KmvSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private lazy val toks = graft.sources.Tables.documents(spark, sf)
    .select(col("source"), explode(tokens(col("text"))).as("token"))
    .cache()

  private lazy val exactVocab: Map[String, Long] = toks
    .groupBy(col("source")).agg(countDistinct(col("token")).as("n"))
    .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def exactShared(a: String, b: String): Long = {
    val va = toks.filter(col("source") === a).select(col("token")).distinct()
    val vb = toks.filter(col("source") === b).select(col("token")).distinct()
    va.join(vb, Seq("token")).count()
  }

  test("below capacity the sketch is EXACT: estimate and intersect equal the joins") {
    // k far above any source's vocabulary → every distinct hash kept
    val sk = toks.groupBy(col("source"))
      .agg(KmvSketchBuild(col("token"), 1 << 18).as("sk"))
      .select(col("source"), KmvEstimate(col("sk")).as("est"), col("sk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Array[Byte]]("sk")))
      .toMap
    sk.foreach { case (src, (est, _)) => assert(est == exactVocab(src), src) }
    val srcs = sk.keys.toSeq.sorted
    for (a <- srcs; b <- srcs if a < b) {
      assert(KmvOps.intersect(sk(a)._2, sk(b)._2) == exactShared(a, b),
        s"exact-path intersection must equal the join for ($a, $b)")
    }
  }

  test("sampling path: estimates within a few stderr of exact (k=256)") {
    // the raw-estimate frame the registered query now folds into its
    // gated check — the spec keeps the direct bound assertions
    val rows = graft.queries.TextQueries.sourceOverlap(
      graft.queries.TextQueries.sourceSketches(
        graft.sources.Tables.documents(spark, sf))).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val relA = math.abs(r.getLong(2) - exactVocab(a)).toDouble / exactVocab(a)
      val relB = math.abs(r.getLong(3) - exactVocab(b)).toDouble / exactVocab(b)
      // stderr ≈ 1/√(k−2) ≈ 6.3% at k=256; 4σ guard
      assert(relA < 0.25 && relB < 0.25, s"vocab estimate off: $r")
      val shared = exactShared(a, b)
      val err = math.abs(r.getLong(4) - shared).toDouble
      // intersection error scales with the larger set's sampling noise
      val scale = math.max(exactVocab(a), exactVocab(b)).toDouble
      assert(err <= 0.25 * scale + 0.25 * shared,
        s"shared-vocab estimate off: $r vs exact $shared")
    }
  }

  test("registered query: exact columns match the joins, every pair within_bound") {
    val rows = SparkEntry.queries("source_overlap_kmv")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == exactVocab(a) && r.getLong(3) == exactVocab(b))
      assert(r.getLong(4) == exactShared(a, b))
      assert(r.getBoolean(r.fieldIndex("within_bound")), s"bound violated: $r")
    }
  }

  test("FULL-sketch sampling path: 100k-element sets, k=512, controlled overlap") {
    // the fixture vocabulary is tiny (the other tests ride the exact
    // path); this exercises the θ-scaled estimators for real —
    // deterministic, since the hash seed is fixed
    val a = spark.range(0L, 60000L).select(col("id"))
    val b = spark.range(40000L, 100000L).select(col("id"))
    val ska = a.agg(KmvSketchBuild(col("id"), 512).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    val skb = b.agg(KmvSketchBuild(col("id"), 512).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    val estA = KmvOps.estimate(ska)
    val estU = KmvOps.estimate(KmvOps.union(ska, skb))
    val estI = KmvOps.intersect(ska, skb)
    // stderr ≈ 1/√510 ≈ 4.4%; 4σ guards
    assert(math.abs(estA - 60000L) < 0.18 * 60000, s"estA=$estA")
    assert(math.abs(estU - 100000L) < 0.18 * 100000, s"estU=$estU")
    // intersection noise scales with |union|·θ-sample variance
    assert(math.abs(estI - 20000L) < 0.2 * 100000, s"estI=$estI")
  }

  test("canonical bytes: identical under any partitioning; union ≡ one-shot") {
    def bytesWith(parts: Int): Map[String, Array[Byte]] = toks
      .repartition(parts, col("token"))
      .groupBy(col("source")).agg(KmvSketchBuild(col("token"), 128).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val (b7, b3) = (bytesWith(7), bytesWith(3))
    b7.foreach { case (src, bytes) =>
      assert(java.util.Arrays.equals(bytes, b3(src)),
        s"sketch bytes must not depend on partitioning: $src")
    }
    // per-half sketches unioned ≡ sketch of the whole
    val whole = toks.agg(KmvSketchBuild(col("token"), 128).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    val halves = toks
      .withColumn("half", (length(col("token")) % 2))
      .groupBy(col("half")).agg(KmvSketchBuild(col("token"), 128).as("sk"))
      .select(col("sk")).collect().map(_.getAs[Array[Byte]](0))
    assert(halves.length == 2)
    assert(java.util.Arrays.equals(KmvOps.union(halves(0), halves(1)), whole),
      "union of split sketches must be bit-identical to the one-shot build")
  }

  test("union column expression and estimate compose; SQL surface registered") {
    val rows = toks.groupBy(col("source"))
      .agg(KmvSketchBuild(col("token"), 1 << 18).as("sk"))
      .orderBy(col("source")).limit(2).collect()
    val pair = Seq((rows(0).getAs[Array[Byte]]("sk"), rows(1).getAs[Array[Byte]]("sk")))
      .toDF("a", "b")
      .select(KmvEstimate(KmvUnion(col("a"), col("b"))).as("u"),
        KmvIntersect(col("a"), col("b")).as("i"),
        KmvEstimate(col("a")).as("ea"), KmvEstimate(col("b")).as("eb"))
      .collect().head
    // exact path (nothing full): inclusion-exclusion holds EXACTLY
    assert(pair.getLong(0) ==
      pair.getLong(2) + pair.getLong(3) - pair.getLong(1),
      s"|A∪B| must equal |A|+|B|−|A∩B| on the exact path: $pair")
    // SQL registration via GraftExtensions
    toks.createOrReplaceTempView("kmv_toks")
    val viaSql = spark.sql(
      """SELECT kmv_estimate(kmv_sketch(token, 4096)) AS est,
        |       kmv_estimate(kmv_union(kmv_sketch(token, 4096), kmv_sketch(token, 4096))) AS est_u,
        |       kmv_intersect(kmv_sketch(token, 4096), kmv_sketch(token, 4096)) AS est_i
        |FROM kmv_toks""".stripMargin).collect().head
    val totalVocab = toks.select(col("token")).distinct().count()
    assert(viaSql.getLong(0) == totalVocab || totalVocab > 4096)
    assert(viaSql.getLong(0) == viaSql.getLong(1),
      "self-union must not change the sketch")
    assert(viaSql.getLong(0) == viaSql.getLong(2),
      "self-intersection must equal the estimate")
  }

  test("md5-40 family: exact below capacity, canonical under partitioning, sane when full") {
    import graft.functions.expressions.{KmvEstimateFp, KmvIntersectFp, KmvSketchBuildMd5}
    // exact path: k above every vocab → integer estimators equal joins
    val sk = toks.groupBy(col("source"))
      .agg(KmvSketchBuildMd5(col("token"), 1 << 18).as("sk"))
      .select(col("source"), KmvEstimateFp(col("sk")).as("est"), col("sk"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Array[Byte]]("sk")))
      .toMap
    sk.foreach { case (src, (est, _)) => assert(est == exactVocab(src), src) }
    val srcs = sk.keys.toSeq.sorted
    for (a <- srcs; b <- srcs if a < b) {
      assert(KmvOps.intersect40(sk(a)._2, sk(b)._2) == exactShared(a, b),
        s"exact-path md5-40 intersection must equal the join for ($a, $b)")
    }
    // canonical bytes: sketch is a function of the hash SET, not the
    // partitioning — and the full (k=256) sampling path stays within
    // a few stderr of exact (the gate itself is pinned by the
    // source_overlap_kmv_md5 oracle; this bounds semantics drift)
    def bytes(parts: Int): Map[String, Array[Byte]] = toks.repartition(parts)
      .groupBy(col("source")).agg(KmvSketchBuildMd5(col("token"), 256).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val (b1, b17) = (bytes(1), bytes(17))
    srcs.foreach(s => assert(java.util.Arrays.equals(b1(s), b17(s)),
      s"md5-40 sketch bytes must be partition-invariant for $s"))
    val fullEst = b1.map { case (s, bs) => s -> KmvOps.estimate40(bs) }
    fullEst.foreach { case (s, est) =>
      val exact = exactVocab(s).toDouble
      assert(math.abs(est - exact) <= 4 * exact / math.sqrt(254),
        s"$s: est=$est exact=$exact outside 4/sqrt(k-2) bound")
    }
  }

  test("plan-time argument validation carries the usage string") {
    val e1 = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(token, 4) FROM kmv_toks").collect()
    }
    assert(e1.getMessage.contains("kmv_sketch"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(token, 1, 2, 3) FROM kmv_toks").collect()
    }
    assert(e2.getMessage.contains("kmv_sketch"))
  }

  test("a2_distinct_kmv_md5: below-capacity sketch counts are exact, and the flag says so") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("a2_distinct_kmv_md5")(
      spark, "/root/testdata/sf0.01").cache()
    assert(out.count() == 150)
    assert(out.filter(!col("exact_below_capacity")).count() == 0,
      "per-user cardinalities sit below k=256 — the sketch must be exact")
    assert(out.filter(col("exact_keys") =!= col("kmv_keys")).count() == 0)
  }
}
