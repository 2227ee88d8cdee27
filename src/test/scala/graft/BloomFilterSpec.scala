package graft

import graft.functions.expressions.{BloomFilterAgg, BloomMightContain, BloomOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom runtime-join-filter invariants: zero false negatives (the
  * correctness contract — a dropped joining row would be silent data
  * loss), a bounded false-positive rate (the efficiency contract), and
  * end-to-end equality of the bloom-prefiltered join with the plain
  * join. */
class BloomFilterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("ops: inserted keys always probe true; fp rate within ~2x theory") {
    val bits = new Array[Byte](1 << 14) // 2^17 bits
    val n = 5000
    (0 until n).foreach(i => BloomOps.put(bits, i * 2654435761L, 5))
    (0 until n).foreach(i =>
      assert(BloomOps.mightContain(bits, i * 2654435761L, 5), s"false negative at $i"))
    // theory: (1 - e^{-kn/m})^k with m=131072, n=5000, k=5 → ~0.17%
    val fp = (0 until 100000).count(i =>
      BloomOps.mightContain(bits, -1L - i * 7919L, 5)) / 100000.0
    assert(fp < 0.004, s"fp rate $fp")
  }

  test("aggregate across partitions equals a single-partition build") {
    import spark.implicits._
    val keys = (1L to 3000L).map(_ * 31L)
    val multi = keys.toDF("k").repartition(8)
      .agg(BloomFilterAgg(col("k")).as("bf")).head().getAs[Array[Byte]](0)
    val single = keys.toDF("k").coalesce(1)
      .agg(BloomFilterAgg(col("k")).as("bf")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(multi, single),
      "merge must be order/partitioning-independent (pure bitwise OR)")
    keys.foreach(k => assert(BloomOps.probe(multi, k)))
  }

  test("probe reads k from the filter header: no false negatives at k != 5") {
    import spark.implicits._
    val keys = (1L to 2000L).map(_ * 97L)
    // build with k=3 and a non-default size; the probe side gets no k
    // argument at all — a mismatch here used to drop joining rows
    val bf = keys.toDF("k")
      .agg(BloomFilterAgg(col("k"), 1 << 16, 3).as("bf"))
      .head().getAs[Array[Byte]](0)
    assert((bf(0) & 0x1F) == 3, "header byte must carry the build-side k")
    assert((bf(0) & BloomOps.HeaderMagicMask) == BloomOps.HeaderMagic,
      "header high bits must carry the magic marker")
    assert(bf.length == (1 << 13) + BloomOps.HeaderBytes)
    keys.foreach(k => assert(BloomOps.probe(bf, k), s"false negative at $k"))
    val misses = keys.toDF("k")
      .filter(!BloomMightContain(lit(bf), col("k"))).count()
    assert(misses == 0, "expression probe must honor the header k")
    // SQL surface: 3-arg build, 2-arg probe, same header contract
    keys.toDF("k").createOrReplaceTempView("bloom_keys_k3")
    val sqlBf = spark.sql(
      "SELECT bloom_agg(k, 65536, 3) AS bf FROM bloom_keys_k3")
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sqlBf, bf))
  }

  test("bloom-prefiltered join equals the plain join, and prunes the scan") {
    import spark.implicits._
    val fact = (1L to 20000L).map(i => (i % 4000L, i)).toDF("k", "v")
    val dim = (0L until 100L).map(i => i * 40L).toDF("k").withColumn("tag", lit("d"))
    // the blessed probe shape: driver-materialized scalar → binary
    // LITERAL (one codegen reference object). Probing via a one-row
    // broadcast COLUMN works too but re-copies the bit array out of
    // the joined row per fact row — numBits × |fact| of memcpy.
    val bloomBytes = dim.agg(BloomFilterAgg(col("k")).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pre = fact.filter(BloomMightContain(lit(bloomBytes), col("k")))
    val prunedCount = pre.count()
    // selectivity: 100 of 4000 distinct keys → ~500 of 20000 rows
    // (+ false positives); anything near 20000 means no pruning
    assert(prunedCount < 2000, s"bloom pruned nothing: $prunedCount rows passed")
    val withBloom = pre.join(dim, Seq("k")).groupBy(col("k"))
      .agg(sum(col("v")).as("sv")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = fact.join(dim, Seq("k")).groupBy(col("k"))
      .agg(sum(col("v")).as("sv")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withBloom == plain)
  }

  test("malformed filters fail fast with a bloom-specific message") {
    import spark.implicits._
    // task failures arrive wrapped in SparkException; search the chain
    def chainMessage(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    def probeFails(filter: Array[Byte]): String = chainMessage(intercept[Exception] {
      Seq(1L).toDF("k")
        .select(BloomMightContain(lit(filter), col("k"))).collect()
    })
    // empty binary: used to AIOOBE inside the scan loop
    assert(probeFails(Array.empty[Byte]).contains("not a bloom_agg filter"))
    // 1-byte filter: used to divide by zero bits
    assert(probeFails(Array[Byte](5)).contains("not a bloom_agg filter"))
    // arbitrary blob with no header magic: used to be silently misread
    // (byte 0 treated as k → possible false negatives)
    assert(probeFails(Array.fill[Byte](16)(0x01)).contains("not built by bloom_agg"))
  }

  test("bad bloom_agg size literals fail with the usage string") {
    import spark.implicits._
    Seq(1L).toDF("k").createOrReplaceTempView("bloom_lit_check")
    def chainMessage(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    for (bad <- Seq("NULL", "'x'")) {
      val msg = chainMessage(intercept[Exception] {
        spark.sql(s"SELECT bloom_agg(k, $bad) FROM bloom_lit_check").collect()
      })
      assert(msg.contains("bloom_agg(key[, numBits, numHashes])"), s"$bad → $msg")
    }
    // a foldable DECIMAL literal is integral enough — accept it
    val bf = spark.sql("SELECT bloom_agg(k, 65536.0) AS bf FROM bloom_lit_check")
      .head().getAs[Array[Byte]](0)
    assert(bf.length == (1 << 13) + BloomOps.HeaderBytes)
    // a FRACTIONAL double literal must be rejected, not truncated
    val fracMsg = chainMessage(intercept[Exception] {
      spark.sql("SELECT bloom_agg(k, CAST(65536.5 AS DOUBLE)) FROM bloom_lit_check").collect()
    })
    assert(fracMsg.contains("integral"), fracMsg)
    // numHashes beyond the 5-bit header cap fails at PLAN time with the
    // usage string, not at aggregation finalization
    val kMsg = chainMessage(intercept[Exception] {
      spark.sql("SELECT bloom_agg(k, 65536, 17) FROM bloom_lit_check").collect()
    })
    assert(kMsg.contains("bloom_agg(key[, numBits, numHashes]") &&
      kMsg.contains("[1,16]"), kMsg)
  }

  test("null keys neither insert nor probe (three-valued logic)") {
    import spark.implicits._
    val bf = Seq(Some(1L), None, Some(2L)).toDF("k")
      .agg(BloomFilterAgg(col("k")).as("bf"))
    val probed = Seq(Some(1L), None).toDF("k")
      .crossJoin(broadcast(bf))
      .select(BloomMightContain(col("bf"), col("k")).as("m")).collect()
    assert(probed.exists(r => !r.isNullAt(0) && r.getBoolean(0)))
    assert(probed.exists(_.isNullAt(0)), "NULL key must probe NULL, not false")
  }
}
