package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed full-batch logistic regression — the model-based quality
  * scorer step of a web-scale curation pipeline (GPT-3/CCNet-class
  * pipelines gate documents with a linear classifier over cheap
  * features; rule gates bootstrap the labels, the learned scorer
  * generalizes them). Training lives in the engine like `Bpe.train`
  * does: a driver loop whose per-iteration work is ONE distributed
  * pass.
  *
  * Per iteration: p = σ(w·x) and the error (p − y) are computed
  * row-parallel with codegen'd expressions (zip_with dot product — no
  * UDF), then the d-dimensional gradient Σ (p−y)·x arrives via
  * posexplode + groupBy(j): partial aggregation sums each feature's
  * slot map-side, the exchange carries ≤ d rows per partition, and the
  * driver collects exactly d rows to update w (the only driver-side
  * state — d doubles, never data). The feature frame is
  * localCheckpoint'd once: iterations re-read the materialized rows,
  * not the upstream corpus scan, and plan depth stays O(1) (the Bpe
  * lesson — never chain lineage through a loop).
  *
  * Floating-point note: the gradient sum's combine order is
  * partition-dependent, so trained weights are deterministic only to
  * ~1 ulp per step — fine for scoring, which is why classifier
  * queries are rows-checked rather than hash-gated.
  *
  * 100 TB shape — TRAIN ON A SAMPLE, SCORE THE CORPUS: full-batch
  * iterations pay one corpus pass per step, and a linear scorer's
  * weights converge on far less data than the corpus (d+1 parameters
  * vs billions of rows). The intended deployment trains on a
  * DETERMINISTIC hash sample (the corpus_sample carve:
  * `portableHash(doc_id) % m = 0` — reproducible across runs, engines
  * and cluster sizes, no RNG state to ship) and scores the full
  * corpus with the broadcast weights via [[scores]], which is a pure
  * projection. LogisticRegressionSpec pins the contract: sample-
  * trained weights score the full fixture within the agreement bound
  * of full-trained weights.
  */
object LogisticRegression {

  /** Train on `data` with columns (features: array<double> of length
    * `dim` — include a leading 1.0 for the bias — label: double in
    * {0,1}). Mean-gradient descent, `iters` full-batch steps at rate
    * `lr`. Returns the learned weights. */
  def train(data: DataFrame, dim: Int, iters: Int, lr: Double): Array[Double] = {
    require(dim >= 1 && iters >= 1 && lr > 0, s"bad args: dim=$dim iters=$iters lr=$lr")
    val checkpointed = data
      .select(col("features"), col("label").cast("double").as("label"))
      .localCheckpoint(true)
    val n = checkpointed.count().toDouble
    require(n > 0, "empty training frame")
    // size the per-iteration task count to the data: ~100k rows per
    // task, capped at the cluster parallelism — a sf0.1-sized frame
    // should not pay 32 task launches × 2 stages × iters of overhead,
    // and a 100 TB frame still fans out fully. coalesce on a
    // checkpointed frame is narrow (no shuffle, no recompute).
    val p = math.max(1, math.min(
      checkpointed.sparkSession.sparkContext.defaultParallelism,
      math.ceil(n / 100000.0).toInt))
    val frame = checkpointed.coalesce(p)
    val w = new Array[Double](dim)
    for (_ <- 1 to iters) {
      val grad = gradient(frame, w)
      var j = 0
      while (j < dim) { w(j) -= lr * grad(j) / n; j += 1 }
    }
    w
  }

  /** Σ_rows (σ(w·x) − y)·x as a length-`dim` array — one distributed
    * pass, ≤ dim rows shuffled per partition, dim rows collected. */
  private def gradient(frame: DataFrame, w: Array[Double]): Array[Double] = {
    val rows = frame
      .withColumn("err", sigmoid(dot(col("features"), w)) - col("label"))
      .select(posexplode(col("features")).as(Seq("j", "x")), col("err"))
      .groupBy(col("j")).agg(sum(col("x") * col("err")).as("g"))
      .collect()
    val g = new Array[Double](w.length)
    rows.foreach(r => g(r.getInt(0)) = r.getDouble(1))
    g
  }

  /** w·x as a codegen'd expression (zip_with + aggregate, no UDF). */
  def dot(features: org.apache.spark.sql.Column, w: Array[Double]): org.apache.spark.sql.Column = {
    val wLit = array(w.map(lit(_)): _*)
    aggregate(zip_with(features, wLit, (x, wj) => x * wj),
      lit(0.0), (acc, v) => acc + v)
  }

  def sigmoid(z: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(1.0) / (lit(1.0) + exp(-z))

  /** Mean log-loss of `w` on `data` (diagnostics / convergence specs). */
  def loss(data: DataFrame, w: Array[Double]): Double = {
    val eps = 1e-12
    val p = sigmoid(dot(col("features"), w))
    data.select(avg(
      -(col("label") * log(p + eps) +
        (lit(1.0) - col("label")) * log(lit(1.0) - p + eps))).as("l"))
      .collect().head.getDouble(0)
  }

  /** Score a frame: appends `score` = σ(w·x) and `predicted` =
    * score ≥ 0.5. Pure projection — no shuffle. */
  def scores(data: DataFrame, w: Array[Double]): DataFrame = {
    val s = sigmoid(dot(col("features"), w))
    data.withColumn("score", s).withColumn("predicted", s >= 0.5)
  }

  /** Fixed-point scale shared by the *_fp trainer (2^20, the repo
    * convention). */
  val FpS: Long = 1L << 20

  /** INTEGER fixed-point training — the float trainer's determinism
    * gap closed: features and labels arrive pre-scaled to 2^20
    * (`xfp: array<bigint>` with a leading bias of exactly S,
    * `yfp ∈ {0, S}`), the sigmoid is the piecewise-linear hard
    * sigmoid `clamp(S/2 + z>>2, 0, S)`, and every division is an
    * ARITHMETIC SHIFT (Spark's shiftright and DuckDB's `>>` both
    * floor on negatives — unlike `div` vs `//`, which disagree there).
    * The per-step weight update is `w_j -= grad_j >> (18 + ⌈log2 n⌉)`
    * — an effective rate of 4·n/2^⌈log2 n⌉ ∈ (2,4] — so the whole
    * trajectory is exact BIGINT arithmetic: bit-identical under any
    * partitioning AND replayable by a SQL engine, which is what lets
    * quality_classifier_fp sit under the exact hash gate while the
    * float twin stays rows-checked. Same driver-state contract as
    * [[train]]: dim longs, one distributed pass per step; same
    * 100 TB contract: train on a deterministic hash sample (n must
    * also keep Σ err·x inside int64 — n < 2^22 at full 2^20-scaled
    * features; samples are far smaller). */
  def trainFp(data: DataFrame, dim: Int, iters: Int): Array[Long] = {
    require(dim >= 1 && iters >= 1, s"bad args: dim=$dim iters=$iters")
    val f = data.select(col("xfp"), col("yfp")).localCheckpoint(true)
    val n = f.count()
    require(n > 0, "empty training frame")
    require(n < (1L << 22), s"trainFp overflow bound: n=$n >= 2^22 — train on a hash sample")
    // ⌈log2 n⌉ = 64 - nlz(n-1) for n ≥ 2, and 0 for n = 1 (the nlz
    // form would give 1 there, diverging from the oracle's CASE n=1)
    val shift =
      if (n == 1) 18 else 18 + (64 - java.lang.Long.numberOfLeadingZeros(n - 1))
    val w = Array.fill(dim)(0L)
    for (_ <- 1 to iters) {
      val rows = predictedFp(f, w)
        .withColumn("err", col("p") - col("yfp"))
        .select(posexplode(col("xfp")).as(Seq("j", "x")), col("err"))
        .groupBy(col("j")).agg(sum(col("x") * col("err")).as("g"))
        .collect()
      rows.foreach(r => w(r.getInt(0)) -= r.getLong(1) >> shift)
    }
    w
  }

  /** `p = hardSigmoid((Σ w·x) >> 20)` as a codegen'd column. */
  private def predictedFp(data: DataFrame, w: Array[Long]): DataFrame = {
    val wLit = array(w.map(lit(_)): _*)
    val zRaw = aggregate(zip_with(col("xfp"), wLit, (x, wj) => x * wj),
      lit(0L), (acc, v) => acc + v)
    val z = shiftright(zRaw, 20)
    data.withColumn("p",
      greatest(lit(0L), least(lit(FpS), lit(FpS / 2) + shiftright(z, 2))))
  }

  /** Score with fp weights: appends `score_fp` and `predicted`
    * (p ≥ S/2 ⇔ z ≥ 0). Pure projection. */
  def scoresFp(data: DataFrame, w: Array[Long]): DataFrame =
    predictedFp(data, w)
      .withColumnRenamed("p", "score_fp")
      .withColumn("predicted", col("score_fp") >= lit(FpS / 2))
}
