package graft.sources

import org.apache.spark.sql.SparkSession

/** Build-completion sentinel for DERIVED multi-table stores (postings,
  * IVF cells, PQ codes): a tiny `<warehouse>/<prefix>.graft_corpus`
  * file recording a signature of the SOURCE corpus the store was built
  * from, written only AFTER a full build finishes.
  *
  * It answers the two questions [[BucketedUpsert.adopt]] alone cannot:
  *
  *  1. *Did the build complete?* Each table's publish marker is
  *     per-table; a crash mid-build leaves some tables published and
  *     others empty. The sentinel is written last, so its presence
  *     means every ingest step ran to completion (the
  *     membership-written-last idea, lifted to whole-store grain).
  *  2. *Is it THIS corpus?* Store prefixes are derived from the corpus
  *     PATH; a fixture regenerated in place keeps its path. The
  *     signature hashes the corpus files' (name, size, mtime), so a
  *     regenerated corpus fails the match and the store rebuilds
  *     instead of silently serving stale rows.
  *
  * On a real deployment the same record lives in the table format's
  * snapshot metadata (a Delta/Iceberg commit carrying the source
  * version); here it is a one-line file with the RunManifest
  * atomic-move contract.
  */
object StoreSentinel {

  private def path(spark: SparkSession, prefix: String): java.nio.file.Path =
    BucketedUpsert.markerPath(spark, prefix)
      .resolveSibling(prefix + ".graft_corpus")

  /** Bytes sampled from each end of every corpus file for the
    * signature. 4 KiB of parquet tail covers the footer (row counts,
    * column min/max stats, schema) — a content fingerprint, not just
    * a listing. */
  private val SampleBytes = 4096

  /** Signature of the corpus files a store derives from: md5 over the
    * sorted (relative-name, size, head+tail sample) listing of each
    * named entry under `dir`.
    *
    * CONTENT-derived on purpose — mtime is excluded (r13 regression):
    * the fixture corpus is regenerated in place every round with
    * byte-identical parquet but fresh mtimes, and an mtime-bearing
    * signature rebuilt every store each session (`adopted: false`
    * across BENCH_r13) — at 100 TB, "rebuild the index because a
    * timestamp moved" is an outage. Size + the first/last 4 KiB of
    * each file (the parquet footer carries schema + per-column
    * min/max stats) changes whenever the data does, and survives
    * regeneration, rsync, and object-store copies that do not
    * preserve mtime. Cost: two bounded reads per file — ~0.8 GB of
    * driver I/O for a 100k-file 100 TB corpus, vs the full re-ingest
    * a false mismatch forces. */
  def corpusSignature(dir: String, names: String*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sample(f: java.nio.file.Path): String = {
      val size = java.nio.file.Files.size(f)
      val ch = java.nio.channels.FileChannel.open(
        f, java.nio.file.StandardOpenOption.READ)
      try {
        val head = java.nio.ByteBuffer.allocate(
          math.min(SampleBytes.toLong, size).toInt)
        ch.read(head, 0L)
        val tail = java.nio.ByteBuffer.allocate(
          math.min(SampleBytes.toLong, size).toInt)
        ch.read(tail, math.max(0L, size - SampleBytes))
        val h = java.security.MessageDigest.getInstance("MD5")
        h.update(head.array, 0, head.position())
        h.update(tail.array, 0, tail.position())
        h.digest().map("%02x".format(_)).mkString
      } finally ch.close()
    }
    val parts = names.sorted.flatMap { n =>
      val root = java.nio.file.Paths.get(dir, n)
      if (!java.nio.file.Files.exists(root)) Seq(s"$n|absent")
      else if (java.nio.file.Files.isRegularFile(root))
        Seq(s"$n|${java.nio.file.Files.size(root)}|${sample(root)}")
      else {
        val listing = java.nio.file.Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          listing.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(f => s"$n/${root.relativize(f)}|${java.nio.file.Files.size(f)}|${sample(f)}")
            .toSeq.sorted
        } finally listing.close()
      }
    }
    parts.foreach(s => md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Record a completed build of `prefix` over a corpus with `sig`. */
  def write(spark: SparkSession, prefix: String, sig: String): Unit = {
    val p = path(spark, prefix)
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = java.nio.file.Files.createTempFile(
      p.getParent, "." + p.getFileName.toString, ".tmp")
    java.nio.file.Files.writeString(tmp, sig)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Does a completed build for exactly this corpus signature exist? */
  def matches(spark: SparkSession, prefix: String, sig: String): Boolean = {
    val p = path(spark, prefix)
    java.nio.file.Files.isRegularFile(p) &&
      java.nio.file.Files.readString(p) == sig
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    java.nio.file.Files.deleteIfExists(path(spark, prefix))
}
