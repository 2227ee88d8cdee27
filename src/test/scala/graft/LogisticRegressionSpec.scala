package graft

import graft.operators.LogisticRegression
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The in-engine classifier trainer: recovers a known hyperplane from
  * deterministic synthetic data, drives the loss down, and the
  * distilled quality scorer agrees with the rule gate it imitates. */
class LogisticRegressionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  /** Deterministic uniform [-2, 2) feature from a hash slot. */
  private def u(seed: String) =
    pmod(xxhash64(concat(lit(seed), col("id"))), lit(10000L))
      .cast("double") / 2500.0 - 2.0

  private lazy val synth = {
    val x1 = u("a"); val x2 = u("b")
    spark.range(2000).select(
      col("id"),
      array(lit(1.0), x1, x2).as("features"),
      // true hyperplane: 2·x1 − x2 + 0.5 > 0 (no label noise)
      (lit(2.0) * x1 - x2 + 0.5 > 0).cast("double").as("label"))
  }

  test("recovers a known separating hyperplane from hash-deterministic data") {
    val w = LogisticRegression.train(synth, 3, 300, 2.0)
    // direction recovery: (w1, w2) aligned with (2, −1)
    val cos = (w(1) * 2.0 + w(2) * -1.0) /
      (math.sqrt(w(1) * w(1) + w(2) * w(2)) * math.sqrt(5.0))
    assert(cos > 0.95, s"direction off: ${w.toSeq} cos=$cos")
    val acc = LogisticRegression.scores(synth, w)
      .filter(col("predicted") === (col("label") > 0.5)).count() / 2000.0
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("training drives the log-loss down from the zero model") {
    val w = LogisticRegression.train(synth, 3, 50, 2.0)
    val l0 = LogisticRegression.loss(synth, new Array[Double](3))
    val lt = LogisticRegression.loss(synth, w)
    assert(lt < l0 / 2, s"loss $l0 -> $lt")
  }

  test("distilled quality scorer largely agrees with the rule gate on the fixture") {
    val out = graft.queries.TextQueries.qualityClassifierFrame(
      spark, "/root/testdata/sf0.001").cache()
    val n = out.count()
    assert(n > 0)
    val both = out.groupBy(col("rule_quality")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(both.size == 2, s"fixture must exercise both classes: $both")
    val agree = out.filter(col("agrees")).count().toDouble / n
    // the rule is an AND of halfspaces — a linear scorer approximates
    // it; demand clearly-better-than-majority agreement
    val majority = both.values.max.toDouble / n
    assert(agree >= 0.85 && agree > majority,
      s"agreement $agree vs majority $majority")
  }

  test("100 TB shape: hash-sample-trained weights score the full corpus within the bound") {
    import graft.functions.TextOps
    // the quality_classifier feature/label recipe over the fixture
    val t = TextOps.tokens(col("text"))
    val nTok = size(t)
    val ttr = size(array_distinct(t)).cast("double") / nTok
    val stop = TextOps.markerHits(t, TextOps.LangMarkers.head._2)
      .cast("double") / nTok
    val feats = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        array(lit(1.0), ttr, stop,
          least(nTok, lit(100)).cast("double") / 100).as("features"),
        (ttr > 0.5 && nTok >= 10 && stop < 0.3).cast("double").as("label"))
      .cache()
    try {
      // deterministic hash sample (the corpus_sample carve) — ~1/3 of
      // the corpus; reproducible across runs/engines/cluster sizes
      val sample = feats.filter(
        TextOps.portableHash(col("doc_id").cast("string")) % 3 === 0)
      val nSample = sample.count().toDouble
      val nAll = feats.count().toDouble
      assert(nSample > 0 && nSample < nAll * 0.6, s"sample $nSample of $nAll")
      val wSample = LogisticRegression.train(sample, 4, 20, 10.0)
      val wFull = LogisticRegression.train(feats, 4, 20, 10.0)
      def agreement(w: Array[Double]): Double =
        LogisticRegression.scores(feats, w)
          .filter(col("predicted") === (col("label") > 0.5))
          .count().toDouble / nAll
      val (aS, aF) = (agreement(wSample), agreement(wFull))
      // sampled training must score the FULL corpus about as well as
      // full training — the contract that makes one-pass-per-step
      // affordable at scale
      assert(aS >= 0.85, s"sample-trained full-corpus agreement $aS")
      assert(aF - aS <= 0.05, s"sampling cost too high: full=$aF sampled=$aS")
    } finally feats.unpersist()
  }

  test("held-out generalization beyond the rule teacher (planted mislabels)") {
    // Distillation metrics (rule agreement) cannot distinguish "learned
    // the quality signal" from "memorized the teacher". Plant ground
    // truth the teacher systematically gets wrong: TRUE quality is the
    // hyperplane, but the RULE teacher flips its answer on the x1 > 1.9
    // tail (~2.5% of docs — a rule gate whose length cutoff misfires on
    // one extreme stratum, the realistic failure; every true label
    // there is positive, so the teacher is 100% wrong on the stratum).
    // Train on RULE labels from a disjoint train split; evaluate on the
    // held-out split against TRUTH.
    val x1 = u("a"); val x2 = u("b")
    val all = spark.range(8000).select(
      col("id"),
      array(lit(1.0), x1, x2).as("features"),
      (lit(2.0) * x1 - x2 + 0.5 > 0).cast("double").as("truth"),
      (x1 > 1.9).as("planted"))
      .withColumn("label", // the corrupted teacher
        when(col("planted"), lit(1.0) - col("truth")).otherwise(col("truth")))
      // deterministic 80/20 split on a hash, not on id ranges (ranges
      // would correlate with the hash-derived features)
      .withColumn("held_out", pmod(xxhash64(col("id")), lit(5)) === 0)
      .cache()
    val train = all.filter(!col("held_out"))
    val test = all.filter(col("held_out"))
    assert(test.filter(col("planted")).count() > 20,
      "held-out split must contain planted mislabels to measure")

    val w = LogisticRegression.train(
      train.select(col("features"), col("label")), 3, 300, 2.0)
    val scored = LogisticRegression.scores(
      test.select(col("features"), col("truth").as("label"), col("planted")), w)

    val n = scored.count().toDouble
    val accTruth = scored.filter(col("predicted") === (col("label") > 0.5))
      .count() / n
    assert(accTruth >= 0.9,
      s"held-out TRUE-label accuracy $accTruth — the learner should " +
        "track the quality signal, not the teacher's corruption")
    // on the planted docs the rule is 100% wrong by construction; a
    // learner that generalizes recovers the majority of them AGAINST
    // its own teacher
    val planted = scored.filter(col("planted"))
    val recovered = planted.filter(col("predicted") === (col("label") > 0.5))
      .count().toDouble / planted.count()
    assert(recovered > 0.5,
      s"only $recovered of planted teacher-mislabeled docs recovered — " +
        "the classifier is memorizing the rule gate, not the signal")
    all.unpersist()
  }

  test("argument validation") {
    intercept[IllegalArgumentException] {
      LogisticRegression.train(synth, 0, 1, 1.0)
    }
    intercept[IllegalArgumentException] {
      LogisticRegression.train(synth, 3, 1, -1.0)
    }
  }

  /** Integer-fp fixture: the synth hyperplane quantized to 2^20. */
  private lazy val synthFp = {
    val S = LogisticRegression.FpS
    synth.select(col("id"),
      expr(s"transform(features, x -> CAST(floor(x * $S) AS BIGINT))").as("xfp"),
      (col("label") * S).cast("long").as("yfp"))
  }

  test("fp trainer: weights are bit-identical under any partitioning") {
    val w1 = LogisticRegression.trainFp(synthFp, 3, 5)
    val w3 = LogisticRegression.trainFp(synthFp.repartition(7), 3, 5)
    val w5 = LogisticRegression.trainFp(synthFp.repartition(3), 3, 5)
    assert(w1.sameElements(w3) && w1.sameElements(w5),
      s"fp training must be partition-order-free: ${w1.toSeq} vs ${w3.toSeq}")
    // and it actually learns: hard-sigmoid predictions track the labels
    val scored = LogisticRegression.scoresFp(synthFp, w1)
    val agree = scored.filter(
      col("predicted") === (col("yfp") === LogisticRegression.FpS)).count()
    assert(agree >= (0.85 * 2000).toLong,
      s"fp model must separate the planted hyperplane, agree=$agree")
  }

  test("fp trainer: argument validation") {
    intercept[IllegalArgumentException] {
      LogisticRegression.trainFp(synthFp.limit(0), 3, 1) // empty frame
    }
    intercept[IllegalArgumentException] {
      LogisticRegression.trainFp(synthFp, 0, 1)
    }
  }

  test("fp classifier query largely agrees with the rule gate (hash-gated twin)") {
    val out = SparkEntry.queries("quality_classifier_fp")(
      spark, "/root/testdata/sf0.01").cache()
    val n = out.count()
    val agrees = out.filter(col("agrees")).count()
    assert(n == 500)
    assert(agrees >= (0.8 * n).toLong, s"agreement $agrees/$n below 80%")
    // both classes appear on both sides — a constant predictor would
    // score ~42% here, not pass this
    assert(out.filter(col("predicted")).count() > 0)
    assert(out.filter(!col("predicted")).count() > 0)
  }
}
