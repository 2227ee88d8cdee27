package graft.streaming

import graft.functions.TextOps._
import graft.sources.BucketedUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incremental NEAR-dup dedup of a document stream: banded MinHash
  * against a persistent LSH index — the ingest-time twin of batch
  * `dedup_minhash_lsh`/`dedup_clusters` (TextQueries), which recompute
  * the whole corpus per run. At 100 TB the viable shape is this one:
  * each arriving micro-batch computes its own 16 minhashes (4×4
  * bands, the SAME TextOps constants as batch, so signatures agree
  * bit-for-bit), probes ONLY the band-store buckets its own band
  * signatures hash into ([[BucketedUpsert.readKeys]]), verifies the
  * candidates by exact Jaccard over stored shingle-hash sets, and
  * merges O(batch) rows into four bucketed stores. Nothing ever joins
  * doc×doc and nothing rescans the corpus.
  *
  * Stores (all [[BucketedUpsert]] generation tables under one prefix):
  *  - `<p>_bands    (bsig, owner_id)`      — band signature → FIRST doc
  *    that exhibited it (one row per signature, never a member list).
  *  - `<p>_shingles (doc_id, hs, n)`       — sorted distinct shingle
  *    hashes of band OWNERS only (the verification side of future
  *    probes; a doc owning no signature can never be probed against).
  *  - `<p>_canon    (doc_id, canonical_id)`— every ingested doc's
  *    cluster label AS OF its arrival (first-writer-wins, immutable).
  *  - `<p>_merges   (loser, winner)`       — cluster-merge log: when
  *    one arriving doc verifies against TWO existing clusters, the
  *    larger-id canonical loses to the smaller. Labels resolve through
  *    this log transitively at read ([[labels]]), so a merge is O(1)
  *    rows instead of relabeling the loser's whole cluster.
  *
  * Semantics vs batch: on a doc_id-ordered feed the labels converge to
  * batch `dedup_clusters` (component-min canonicals over verified
  * jaccard ≥ 0.5 pairs) — asserted in StreamingMinHashDedupSpec.
  * Verification uses integer arithmetic (3·|∩| ≥ n₁+n₂ ⇔ J ≥ 0.5), so
  * there is no float drift against the batch predicate. Two honest
  * deltas from batch, both inherent to a one-owner-per-signature
  * index: (1) when ≥3 docs share one band signature, non-owner pairs
  * are linked only THROUGH the owner (batch pairs all bucket members;
  * the streaming index verifies each arrival against the first owner
  * only) — they diverge only when the owner fails verification against
  * one member but another member pair would have passed, an LSH
  * corner measured absent on the fixtures; (2) out of order, the
  * earlier ARRIVAL owns the signature (the already-trained-on copy
  * stays canonical — the right ingest-time call, mirroring
  * DocDedupStream).
  *
  * Replay safety: every store merge is first-writer-wins (idempotent)
  * AND carries the foreachBatch batchId, so an at-least-once
  * redelivery skips the bucket rewrites; a crash BETWEEN the four
  * store upserts heals on redelivery because each table's guard is
  * independent and the recomputed batch derives identical deltas
  * (asserted in the spec's replay test).
  *
  * Scale notes: the per-batch union-find runs on the driver over the
  * batch's VERIFIED edge list — bounded by construction at ≤
  * [[MinhashBands]] edges per arriving doc (each doc probes 4 band
  * signatures → ≤ 4 distinct owners), i.e. O(micro-batch), the same
  * driver-bounded class as a MemoryStream feed. That bound is an
  * ENFORCED CONTRACT, not a hope: `upsertBatch` collects at most
  * `maxDriverEdges + 1` rows (default [[DefaultMaxDriverEdges]], ~a
  * few hundred MB of tuples at the default) and FAILS FAST with a
  * remediation message when a batch exceeds it — a silently swelling
  * trigger must surface as a visible error at the cap, never as a
  * driver OOM past it. Operators of genuinely larger micro-batches
  * either shrink the trigger or swap in one
  * [[graft.operators.ConnectedComponents]] round over the same edge
  * frame (drop-in: same (a, b) columns). The merge log stays tiny
  * (one row per cluster-merge event ever) and is pointer-jumped in
  * DataFrame ops, never collected.
  */
object MinHashDedupStream {

  val DefaultPrefix = "mh_dedup"
  val DefaultBuckets = 32

  /** Default cap on verified edges collected per batch for the driver
    * union-find — the ≤ 4-edges-per-doc construction means this
    * admits micro-batches of ~4M docs before tripping. See the class
    * scaladoc "Scale notes" for the contract and remediations. */
  val DefaultMaxDriverEdges = 16000000

  private[graft] def bandsTable(p: String): String = p + "_bands"
  private[graft] def shinglesTable(p: String): String = p + "_shingles"
  private[graft] def canonTable(p: String): String = p + "_canon"
  private[graft] def mergesTable(p: String): String = p + "_merges"

  /** Create the four empty stores (idempotent). */
  def init(spark: SparkSession, prefix: String = DefaultPrefix,
           buckets: Int = DefaultBuckets): Unit = {
    import spark.implicits._
    if (!BucketedUpsert.adopt(spark, bandsTable(prefix)))
      BucketedUpsert.materialize(
        Seq.empty[(String, Long)].toDF("bsig", "owner_id"),
        bandsTable(prefix), "bsig", buckets)
    if (!BucketedUpsert.adopt(spark, shinglesTable(prefix)))
      BucketedUpsert.materialize(
        Seq.empty[(Long, Seq[Long], Long)].toDF("doc_id", "hs", "n"),
        shinglesTable(prefix), "doc_id", buckets)
    if (!spark.catalog.tableExists(canonTable(prefix)))
      BucketedUpsert.materialize(
        Seq.empty[(Long, Long)].toDF("doc_id", "canonical_id"),
        canonTable(prefix), "doc_id", buckets)
    if (!spark.catalog.tableExists(mergesTable(prefix)))
      BucketedUpsert.materialize(
        Seq.empty[(Long, Long)].toDF("loser", "winner"),
        mergesTable(prefix), "loser", buckets)
  }

  def drop(spark: SparkSession, prefix: String = DefaultPrefix): Unit =
    Seq(bandsTable(prefix), shinglesTable(prefix),
      canonTable(prefix), mergesTable(prefix))
      .foreach(BucketedUpsert.drop(spark, _))

  /** Per-doc signature features in ONE aggregate over the shingle
    * explode: sorted distinct shingle hashes (the verification set),
    * its size, and the 4 band signatures — identical constants and
    * band layout to batch minhashPairs (TextQueries), so a signature
    * computed here collides exactly when the batch pipeline's would.
    * Docs under 3 tokens have no shingles and are excluded (they can
    * never be near-dup candidates — same rule as batch). */
  private[graft] def features(batch: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val sh = batch.filter(size(t) >= 3)
      .select(col("doc_id"), explode(shingles(t)).as("s"))
      .withColumn("h", portableHash(col("s")))
    val aggs =
      array_sort(collect_set(col("h"))).as("hs") +:
        MinhashAB.indices.map(i => min(minhashExpr(col("h"), i)).as(s"mh$i"))
    sh.groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("n", size(col("hs")).cast("long"))
      .withColumn("bsigs", array((0 until MinhashBands).map { b =>
        concat_ws("_",
          lit(b.toString) +:
            (0 until MinhashRows).map(r => col(s"mh${b * MinhashRows + r}")): _*)
      }: _*))
      .select(col("doc_id"), col("hs"), col("n"), col("bsigs"))
  }

  /** Transitive closure of the merge log: `loser → root winner`.
    * Pointer jumping over the (tiny) log only — chain depth halves per
    * round, and each round's fixpoint check is one count on the log,
    * not a corpus action. */
  private[graft] def mergeClosure(spark: SparkSession, prefix: String): DataFrame = {
    var m = BucketedUpsert.read(spark, mergesTable(prefix))
      .select(col("loser"), col("winner"))
    var rounds = 0
    var done = false
    while (!done && rounds < 32) {
      val step = m.as("x").join(
        m.select(col("loser").as("nl"), col("winner").as("nw")),
        col("x.winner") === col("nl"), "left_outer")
      done = step.filter(col("nw").isNotNull && col("nw") =!= col("x.winner")).isEmpty
      if (!done)
        m = step.select(col("x.loser").as("loser"),
          coalesce(col("nw"), col("x.winner")).as("winner"))
      rounds += 1
    }
    m
  }

  private def resolveThrough(closure: DataFrame, df: DataFrame,
                             c: String): DataFrame =
    df.join(closure, df(c) === closure("loser"), "left_outer")
      .withColumn(c, coalesce(col("winner"), df(c)))
      .drop("loser", "winner")

  /** Ingest one micro-batch of `(doc_id, text)` documents. */
  def upsertBatch(spark: SparkSession, batch: DataFrame,
                  prefix: String = DefaultPrefix,
                  buckets: Int = DefaultBuckets,
                  batchId: Option[Long] = None,
                  maxDriverEdges: Int = DefaultMaxDriverEdges): Unit = {
    require(maxDriverEdges > 0,
      s"maxDriverEdges must be positive, got $maxDriverEdges")
    // first-writer-wins on every store: the already-ingested row keeps
    // the crown (mirrors DocDedupStream), and replays become no-ops
    val firstWins = (_: String, existing: org.apache.spark.sql.Column,
                     delta: org.apache.spark.sql.Column) => coalesce(existing, delta)
    val docsIn = batch.select(col("doc_id"), col("text")).persist()
    val feat = features(docsIn).persist()
    var owners: DataFrame = null
    try {
      // ---- probe: O(delta) against the band store --------------------
      val sigs = feat.select(col("doc_id"), explode(col("bsigs")).as("bsig"))
      val batchOwn = sigs.groupBy(col("bsig"))
        .agg(min(col("doc_id")).as("batch_owner"))
      val storeOwn = BucketedUpsert
        .readKeys(spark, bandsTable(prefix), sigs, "bsig", buckets)
        .join(batchOwn.select(col("bsig")), Seq("bsig"), "left_semi")
        .select(col("bsig"), col("owner_id").as("store_owner"))
      owners = batchOwn.join(storeOwn, Seq("bsig"), "left_outer")
        .select(col("bsig"), col("batch_owner"), col("store_owner"),
          coalesce(col("store_owner"), col("batch_owner")).as("owner"))
        .persist()

      // candidate pairs: each arriving doc vs the owner of each of its
      // band signatures — ≤ MinhashBands candidates per doc, by design
      val rawEdges = sigs.join(owners.select(col("bsig"), col("owner")), Seq("bsig"))
        .filter(col("doc_id") =!= col("owner"))
        .select(col("owner"), col("doc_id")).distinct()

      // ---- verify: exact Jaccard over shingle-hash sets --------------
      val ownerIds = rawEdges.select(col("owner").as("doc_id")).distinct()
      val storeFeat = BucketedUpsert
        .readKeys(spark, shinglesTable(prefix), ownerIds, "doc_id", buckets)
        .join(ownerIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("hs"), col("n"))
      // owner features: in-batch frame first, store rows for the rest
      // (identical rows on replay — dropDuplicates is then a no-op pick)
      val ownerFeat = feat.select(col("doc_id"), col("hs"), col("n"))
        .join(ownerIds, Seq("doc_id"), "left_semi")
        .unionByName(storeFeat).dropDuplicates("doc_id")
      // J ≥ 0.5 ⇔ 3·|∩| ≥ n₁+n₂ — integer-exact, no float threshold
      val verified = rawEdges
        .join(ownerFeat.select(col("doc_id").as("owner"),
          col("hs").as("hs_o"), col("n").as("n_o")), Seq("owner"))
        .join(feat.select(col("doc_id"),
          col("hs").as("hs_d"), col("n").as("n_d")), Seq("doc_id"))
        .withColumn("inter", size(array_intersect(col("hs_o"), col("hs_d"))).cast("long"))
        .filter(col("inter") * 3 >= col("n_o") + col("n_d"))
        .select(col("owner"), col("doc_id"))

      // ---- resolve store owners to their CURRENT cluster root --------
      val closure = mergeClosure(spark, prefix)
      val storeOwnerIds = owners.filter(col("store_owner").isNotNull)
        .select(col("store_owner").as("doc_id")).distinct()
      val canonRows = BucketedUpsert
        .readKeys(spark, canonTable(prefix), storeOwnerIds, "doc_id", buckets)
        .join(storeOwnerIds, Seq("doc_id"), "left_semi")
      val ownerNode = resolveThrough(closure,
        storeOwnerIds.join(canonRows.select(col("doc_id"),
          col("canonical_id")), Seq("doc_id"), "left_outer")
          .select(col("doc_id").as("owner"),
            coalesce(col("canonical_id"), col("doc_id")).as("node")),
        "node")

      // edge endpoints: batch owners stand as themselves, store owners
      // as their resolved cluster root (flagged — the flag drives the
      // first-arrival-wins union rule below)
      val edges = verified.join(ownerNode, Seq("owner"), "left_outer")
        .select(coalesce(col("node"), col("owner")).as("a"),
          col("doc_id").as("b"), col("node").isNotNull.as("a_store"))

      // ---- per-batch union-find (driver; ≤ 4 edges per arriving doc) --
      // Root election: an EXISTING cluster canonical (store node) always
      // beats a new arrival — out-of-order ingest must never let a
      // smaller-id latecomer steal an established crown (the
      // already-trained-on copy stays canonical, like DocDedupStream).
      // Within a class, min id wins: two existing clusters bridged by
      // one arrival merge onto the smaller canonical, and batch-local
      // clusters root at their min doc — both exactly the batch CC
      // component-min on an ordered feed.
      // enforce the driver-memory contract BEFORE materializing: limit
      // caps what can ever reach the driver (cap+1 rows max, so the
      // failure mode at an oversized batch is this clear error, never
      // an OOM), and the +1 row distinguishes "exactly at cap" from
      // "over it"
      val es = edges.limit(maxDriverEdges + 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      require(es.length <= maxDriverEdges,
        s"micro-batch produced more than $maxDriverEdges verified near-dup " +
          "edges — the per-batch driver union-find contract is exceeded. " +
          "Shrink the streaming trigger (fewer docs per micro-batch), raise " +
          "maxDriverEdges if driver memory allows, or replace the driver " +
          "union-find with one graft.operators.ConnectedComponents round " +
          "over the same (a, b) edge frame.")
      val storeNodes = es.filter(_._3).map(_._1).toSet
      def rank(x: Long): (Int, Long) = (if (storeNodes(x)) 0 else 1, x)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrElse(x, x) != x) {
          val p = parent(x)
          parent(x) = parent.getOrElse(p, p) // path halving
          x = parent(x)
        }
        x
      }
      es.foreach { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          val winner = if (Ordering[(Int, Long)].lt(rank(ra), rank(rb))) ra else rb
          val loser = if (winner == ra) rb else ra
          parent(loser) = winner
        }
      }
      val roots = parent.keys.toSeq.map(k => k -> find(k)).filter(kv => kv._1 != kv._2)
      import spark.implicits._
      val rootDf = roots.toDF("node", "root")

      // ---- store updates (all replay-guarded by batchId) -------------
      // Order matters for crash-between-upserts healing: everything
      // derived from the PRE-batch band store (canon, merges, shingle
      // sets) merges BEFORE the band index itself — a redelivery after
      // a partial crash then recomputes identical deltas, because
      // store_owner (the only input the earlier upserts read) is
      // untouched until the final bands merge. Bands-first would lose
      // owner shingle sets forever on a crash in between (newOwnerIds
      // would come back empty on the redelivery).
      //
      // canon: every batch doc (including <3-token ones, which carry no
      // shingles) labeled with its component root; first-writer-wins
      // keeps an earlier ingest's label on duplicate doc_ids
      val canonDelta = docsIn.select(col("doc_id")).distinct()
        .join(broadcast(rootDf), col("doc_id") === col("node"), "left_outer")
        .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("canonical_id"))
      BucketedUpsert.upsert(spark, canonTable(prefix), canonDelta,
        Seq("doc_id"), "doc_id", buckets, merge = firstWins, batchId = batchId)

      // merge log: a store-side cluster root displaced by a smaller one
      val mergeDelta = ownerNode.select(col("node")).distinct()
        .join(broadcast(rootDf), Seq("node"))
        .filter(col("root") =!= col("node"))
        .select(col("node").as("loser"), col("root").as("winner"))
      BucketedUpsert.upsert(spark, mergesTable(prefix), mergeDelta,
        Seq("loser"), "loser", buckets, merge = firstWins, batchId = batchId)

      // shingle sets: only docs that became owners of a NEW signature
      // (only they can be probed against later)
      val newOwnerIds = owners.filter(col("store_owner").isNull)
        .select(col("batch_owner").as("doc_id")).distinct()
      BucketedUpsert.upsert(spark, shinglesTable(prefix),
        feat.join(newOwnerIds, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("hs"), col("n")),
        Seq("doc_id"), "doc_id", buckets, merge = firstWins, batchId = batchId)

      // band index LAST (see ordering note): first-writer-wins keeps
      // existing owners; new signatures record the batch's min-doc owner
      BucketedUpsert.upsert(spark, bandsTable(prefix),
        owners.select(col("bsig"), col("batch_owner").as("owner_id")),
        Seq("bsig"), "bsig", buckets, merge = firstWins, batchId = batchId)
    } finally {
      if (owners != null) owners.unpersist()
      feat.unpersist(); docsIn.unpersist()
    }
  }

  /** Streaming sink: `docs.writeStream` → incremental index merges. */
  def writer(docs: DataFrame, prefix: String = DefaultPrefix,
             buckets: Int = DefaultBuckets): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch.sparkSession, batch, prefix, buckets, Some(id))
      }

  /** Cluster labels of every ingested doc: the immutable at-ingest
    * label resolved through the merge log — `(doc_id, canonical_id)`.
    * On a doc_id-ordered feed this equals batch `dedup_clusters` for
    * clustered docs and `doc_id` itself for unique ones. */
  def labels(spark: SparkSession, prefix: String = DefaultPrefix): DataFrame =
    resolveThrough(mergeClosure(spark, prefix),
      BucketedUpsert.read(spark, canonTable(prefix)), "canonical_id")
      .select(col("doc_id"), col("canonical_id"))
}
