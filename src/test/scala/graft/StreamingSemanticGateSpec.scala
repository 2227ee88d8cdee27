package graft

import graft.sources.Tables
import graft.streaming.SemanticGateStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming semantic-decontamination gate vs its batch ground
  * truth (the `decontaminate_semantic` query): chunked ingest admits/
  * quarantines exactly the rows the batch query flags, and a
  * redelivered batch overwrites rather than appends. */
object StreamingSemanticGateSpec {
  case class Vec(vec_id: Long, emb: Seq[Double])
}

class StreamingSemanticGateSpec extends AnyFunSuite {
  import StreamingSemanticGateSpec.Vec

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  // same split convention as the batch query: id % 10 == 0 = eval
  private def evalSet = vecs.filter(col("vec_id") % 10 === 0)
    .select(col("vec_id").as("eval_id"), col("emb").as("eemb"))
  private def trainVecs = vecs.filter(col("vec_id") % 10 =!= 0)

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("chunked stream reproduces the batch query's contamination split") {
    import spark.implicits._
    val (cleanDir, contamDir) = (tmp("sg_clean"), tmp("sg_contam"))
    val train = trainVecs.as[Vec].collect()
    val ms = MemoryStream[Vec](spark)
    val q = SemanticGateStream
      .writer(ms.toDF(), evalSet, 0.3, cleanDir, contamDir)
      .option("checkpointLocation", tmp("sg_ckpt"))
      .queryName("sg_converge").start()
    try {
      train.grouped(math.max(1, train.length / 3)).foreach { chunk =>
        ms.addData(chunk.toSeq); q.processAllAvailable()
      }

      val batch = SparkEntry.queries("decontaminate_semantic")(spark, sf)
      val wantContam = batch.filter(col("contaminated"))
        .select(col("vec_id"), col("n_eval_hits"), col("max_sim"))
        .as[(Long, Long, Double)].collect()
        .map { case (id, n, s) => id -> (n, s) }.toMap
      val gotContam = SemanticGateStream.contaminated(spark, contamDir)
        .select(col("vec_id"), col("n_eval_hits"), col("max_sim"))
        .as[(Long, Long, Double)].collect()
        .map { case (id, n, s) => id -> (n, s) }.toMap
      // identical flagged ids, hit counts AND max cosines — the gate
      // computes the same pair set as the batch query
      assert(gotContam == wantContam)

      val gotClean = SemanticGateStream.clean(spark, cleanDir)
        .select(col("vec_id")).as[Long].collect().sorted
      val wantClean = batch.filter(!col("contaminated"))
        .select(col("vec_id")).as[Long].collect().sorted
      assert(gotClean.sameElements(wantClean))
      assert(gotClean.length + gotContam.size == train.length)
    } finally q.stop()
  }

  test("eval frame is read once: later batches join the pinned probes, never the source") {
    import spark.implicits._
    val (cleanDir, contamDir) = (tmp("sg_clean3"), tmp("sg_contam3"))
    // eval comes from a DELETABLE parquet dir: if any later micro-batch
    // re-scanned the eval source it would fail (files gone) or see the
    // new bytes — serving the FROZEN probe set proves the pin
    val evalDir = tmp("sg_eval")
    evalSet.write.mode("overwrite").parquet(evalDir)
    val evalFromDisk = spark.read.parquet(evalDir)
    val train = trainVecs.as[Vec].collect()
    val ms = MemoryStream[Vec](spark)
    val q = SemanticGateStream
      .writer(ms.toDF(), evalFromDisk, 0.3, cleanDir, contamDir)
      .option("checkpointLocation", tmp("sg_ckpt3"))
      .queryName("sg_pinned").start()
    try {
      val chunks = train.grouped(math.max(1, train.length / 3)).toSeq
      ms.addData(chunks.head.toSeq); q.processAllAvailable()
      // destroy the eval source between batches
      val dir = java.nio.file.Paths.get(evalDir)
      import scala.jdk.CollectionConverters._
      val listing = java.nio.file.Files.walk(dir)
      try listing.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally listing.close()
      chunks.tail.foreach { c => ms.addData(c.toSeq); q.processAllAvailable() }
      assert(q.exception.isEmpty,
        s"stream must survive eval-source deletion: ${q.exception}")
      // and the verdicts match the batch ground truth computed on the
      // ORIGINAL eval set — the gate served the frozen probes
      val batch = SparkEntry.queries("decontaminate_semantic")(spark, sf)
      val wantContam = batch.filter(col("contaminated"))
        .select(col("vec_id")).as[Long].collect().sorted
      val gotContam = SemanticGateStream.contaminated(spark, contamDir)
        .select(col("vec_id")).as[Long].collect().sorted
      assert(gotContam.sameElements(wantContam))
    } finally q.stop()
  }

  test("redelivered batch overwrites its own partition (replay no-op)") {
    import spark.implicits._
    val (cleanDir, contamDir) = (tmp("sg_clean2"), tmp("sg_contam2"))
    val probes = SemanticGateStream.evalProbes(evalSet)
    val chunk = trainVecs.limit(40).toDF()
    SemanticGateStream.writeBatch(chunk, probes, 0.3, cleanDir, contamDir, 7L)
    val afterOnce = (SemanticGateStream.clean(spark, cleanDir).count(),
      spark.read.option("basePath", contamDir).parquet(s"$contamDir/batch_id=7")
        .count())
    SemanticGateStream.writeBatch(chunk, probes, 0.3, cleanDir, contamDir, 7L)
    val afterTwice = (SemanticGateStream.clean(spark, cleanDir).count(),
      spark.read.option("basePath", contamDir).parquet(s"$contamDir/batch_id=7")
        .count())
    assert(afterOnce == afterTwice)
    assert(afterOnce._1 + afterOnce._2 == 40)
  }
}
