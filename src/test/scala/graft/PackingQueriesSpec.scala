package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the training-data assembly operators that
  * the oracle hash alone would not explain on failure: packing
  * conservation (every token lands in exactly one chunk slot), chunk
  * geometry (stride/window/tail rules), and redaction completeness
  * (no plantable pattern survives). */
class PackingQueriesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pack_sequences: full chunks except the tail; tokens conserved") {
    val rows = SparkEntry.queries("pack_sequences")(spark, sf)
      .orderBy("chunk_id").collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    assert(ids.head == 0 && ids.sameElements(ids.indices.map(_.toLong)),
      "chunk ids must be contiguous from 0 — packing leaves no gaps")
    rows.init.foreach { r =>
      assert(r.getAs[Long]("n_tokens_filled") == 512L,
        s"non-tail chunk ${r.getLong(0)} not full: $r")
    }
    assert(rows.last.getAs[Long]("n_tokens_filled") <= 512L)
    val totalFilled = rows.map(_.getAs[Long]("n_tokens_filled")).sum
    val totalTokens = graft.sources.Tables.documents(spark, sf)
      .select(sum(size(split(trim(col("text")), " ")).cast("long")))
      .head().getLong(0)
    assert(totalFilled == totalTokens,
      "every corpus token must land in exactly one chunk slot")
    val startsSum = rows.map(_.getAs[Long]("n_docs_starting")).sum
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(startsSum == nDocs, "every doc starts in exactly one chunk")
  }

  test("doc_chunks: stride geometry, full coverage, real chunk text") {
    val rows = SparkEntry.queries("doc_chunks")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len"),
        r.getAs[String]("chunk_text")))
    val byDoc = rows.groupBy(_._1)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(byDoc.size == nDocs, "every doc yields at least one chunk")
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0, s"doc $doc first chunk must start at 0")
      sorted.foreach { case (_, idx, start, len, text) =>
        assert(start == idx * 48, s"doc $doc chunk $idx start")
        assert(len >= 1 && len <= 64, s"doc $doc chunk $idx len $len")
        assert(text.split(" ", -1).length == len,
          s"doc $doc chunk $idx text/token-count mismatch")
      }
      sorted.init.foreach { case (_, idx, _, len, _) =>
        assert(len == 64, s"doc $doc non-final chunk $idx must be full-width")
      }
      // tail chunk reaches the end of the doc, and (when there are
      // overflow chunks) strictly advances past the previous window
      val (_, _, lastStart, lastLen, _) = sorted.last
      if (sorted.length > 1) assert(lastStart + lastLen > sorted.init.last._3 + 48)
    }
  }

  test("packing pipelines: no partition-less window anywhere in the plans") {
    // VERDICT r13 #1: the vocab-rank window of pack_sequences_bpe ran
    // partition-less (the `WindowExec: No Partition Defined` warnings).
    // All global orderings in this module now go through the two-phase
    // recipe with DRIVER-side prefix offsets (prefixFrame), so the
    // optimized logical plan of every packing/curation query — and of
    // the shared bpePackedTokens frame itself — must contain ZERO
    // Window nodes with an empty partitionSpec.
    val frames =
      ("bpePackedTokens" -> graft.queries.PackingQueries.bpePackedTokens(spark, sf)) +:
        Seq("pack_sequences", "pack_sequences_bpe", "token_budget_select",
          "corpus_shard", "corpus_assemble")
          .map(n => n -> SparkEntry.queries(n)(spark, sf))
    frames.foreach { case (name, df) =>
      val bare = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(bare.isEmpty,
        s"$name has ${bare.size} partition-less Window node(s): " +
          bare.map(_.windowExpressions.mkString(",")).mkString("; "))
    }
  }

  test("withScoreH one-scan base equals the two-scan hash-window + score-join form") {
    // r17 rewrote the assemble queries onto a single documents scan
    // (score and md5 hash projected map-side, dedup-window over the
    // fixed-width result). Pin it value-identical to the pre-r17
    // two-scan formulation — hash-window frame joined back to a
    // separately-scanned score frame on doc_id — on a fixture with a
    // duplicate cluster spanning eval/non-eval ids, an empty text
    // (n_tok must still be 1: split of a trimmed empty string is
    // ['']), and a repeated-token doc where n_uniq < n_tok.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      (1L, "a", "x y x"), (11L, "b", "x y x"), (30L, "f", "x y x"),
      (10L, "c", "eval doc"), (20L, "d", ""), (3L, "e", "solo")
    ).toDF("doc_id", "source", "text")
    val one = graft.queries.PackingQueries.withScoreH(docs)
      .select("doc_id", "source", "n_tok", "n_uniq", "score", "cid")
    val flagged = docs.select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("cid",
        min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .select("doc_id", "cid")
    val scored = docs
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tok"),
        size(array_distinct(split(trim(col("text")), " "))).cast("long").as("n_uniq"))
      .withColumn("score", expr("(1000000 * n_uniq) div n_tok"))
    val two = scored.join(flagged, Seq("doc_id"))
      .select("doc_id", "source", "n_tok", "n_uniq", "score", "cid")
    assert(one.exceptAll(two).count() == 0 && two.exceptAll(one).count() == 0)
    val byId = one.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("cid") == 1L
      && byId(11L).getAs[Long]("cid") == 1L
      && byId(30L).getAs[Long]("cid") == 1L, "dup cluster keeps min id")
    assert(byId(20L).getAs[Long]("n_tok") == 1L, "empty text tokenizes to ['']")
    assert(byId(1L).getAs[Long]("n_uniq") == 2L, "repeat tokens dedup in n_uniq")
  }

  test("assemble queries: raw text never reaches a window or join input") {
    // The point of the one-scan base at corpus scale: text is consumed
    // map-side (score/hash projection, shingle generate) and only
    // fixed-width rows cross the plan's exchanges. Guard it in the
    // optimized logical plan — every Window's child and every Join's
    // two inputs must be text-free; a regression that re-threads the
    // text column through the dedup window or a doc_id join shows up
    // here before it shows up as shuffle bytes at scale.
    // Anchored to the SCAN's text attribute exprId, not the column
    // name (ADVICE r17): a revision that aliases raw text before a
    // window/join would dodge a name check while still shipping
    // corpus bytes. Taint starts at the leaf relations' text attrs
    // and propagates through IDENTITY carries only (Alias of a
    // tainted attribute, bare or cast, and — ADVICE r18 — an
    // identity-carrying aggregate or window alias: min/max/first/last
    // of a tainted attribute, or a lead/lag/window carry of one,
    // through Aggregate/Window/Expand output) — computed projections
    // (md5(text), size(...)) CONSUME text map-side and stay clean,
    // which is exactly the design being guarded. The live-text plan
    // to anchor on is withScoreH itself (the registered queries'
    // leaves are post-TwoPhase fixed-width LogicalRDDs — no text
    // anywhere, which the same walk verifies as seed = ∅ plus the
    // name backstop).
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, ExprId, Expression, FrameLessOffsetWindowFunction, NamedExpression, WindowExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First, Last, Max, Min}
    import org.apache.spark.sql.catalyst.plans.logical
    def checkTextFree(name: String, plan: logical.LogicalPlan,
                      requireTextLeaf: Boolean): Unit = {
      val seed = plan.collectLeaves()
        .flatMap(_.output.filter(_.name == "text").map(_.exprId)).toSet
      if (requireTextLeaf)
        assert(seed.nonEmpty, s"$name: expected a raw-text scan to anchor on")
      var tainted: Set[ExprId] = seed
      // identity carry: the expression's VALUE is (some row's) tainted
      // column verbatim — bare/cast attribute, min/max/first/last of
      // one, or a window/offset carry of one. Computed consumptions
      // (md5, size, substring) are not identities.
      def identity(e: Expression): Boolean = e match {
        case ar: AttributeReference => tainted.contains(ar.exprId)
        case c: Cast => identity(c.child)
        case agg: AggregateExpression => agg.aggregateFunction match {
          case f: Min => identity(f.child)
          case f: Max => identity(f.child)
          case f: First => identity(f.child)
          case f: Last => identity(f.child)
          case _ => false
        }
        case we: WindowExpression => identity(we.windowFunction)
        case o: FrameLessOffsetWindowFunction => identity(o.input)
        case _ => false
      }
      def taintFrom(exprs: Seq[NamedExpression]): Unit = exprs.foreach {
        case a: Alias if identity(a.child) => tainted += a.exprId
        case _ =>
      }
      plan.foreachUp {
        case proj: logical.Project => taintFrom(proj.projectList)
        case agg: logical.Aggregate => taintFrom(agg.aggregateExpressions)
        case w: logical.Window => taintFrom(w.windowExpressions)
        case ex: logical.Expand =>
          // output attr i is tainted if ANY projection row carries an
          // identity of a tainted attribute at position i
          ex.projections.foreach { row =>
            row.zip(ex.output).foreach { case (e, out) =>
              if (identity(e)) tainted += out.exprId
            }
          }
        case _ =>
      }
      def carried(p: logical.LogicalPlan): Seq[String] =
        p.output.filter(a =>
          tainted.contains(a.exprId) || a.name == "text").map(_.name)
      val windows = plan.collect { case w: logical.Window => w }
      assert(windows.nonEmpty, s"$name: expected dedup/rank windows")
      windows.foreach { w =>
        assert(carried(w.child).isEmpty,
          s"$name: a Window input carries raw text (possibly aliased): " +
            s"${carried(w.child)}")
      }
      plan.collect { case j: logical.Join => j }.foreach { j =>
        val bad = carried(j.left) ++ carried(j.right)
        assert(bad.isEmpty,
          s"$name: a Join input carries raw text (possibly aliased): $bad")
      }
    }
    // the one-scan base where text is live: its dedup window must
    // consume text map-side — exprId-anchored to the parquet scan
    checkTextFree("withScoreH",
      graft.queries.PackingQueries.withScoreH(
        graft.sources.Tables.documents(spark, sf))
        .queryExecution.optimizedPlan,
      requireTextLeaf = true)
    Seq("corpus_assemble", "assemble_provenance").foreach { name =>
      checkTextFree(name,
        SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan,
        requireTextLeaf = false)
    }
    // regression (ADVICE r18): an identity carry of raw text through
    // an AGGREGATE alias into a window input must be caught — the
    // shape that used to evade the Project-only walk and fall back to
    // the weaker name-only backstop
    val sneaky = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("doc_id")).agg(first(col("text")).as("payload"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("payload"))))
      .select(col("doc_id"), col("rk"))
    intercept[org.scalatest.exceptions.TestFailedException] {
      checkTextFree("sneaky_first_text",
        sneaky.queryExecution.optimizedPlan, requireTextLeaf = true)
    }
  }

  test("bpe vocab join: shuffle fallback above the broadcast ceiling is value-identical") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val merges = Seq(graft.operators.Bpe.Merge(0, "e", "s</w>"))
    val docsDf = graft.sources.Tables.documents(spark, sf).limit(50)
    val (ws, n) = graft.operators.Bpe.freezeVocab(
      graft.operators.Bpe.wordSegments(spark, docsDf, merges))
    assert(n > 0)
    val words = docsDf
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val viaBroadcast = graft.operators.Bpe.vocabJoin(words, ws, n)
      .select(col("w"), concat_ws("|", col("syms")).as("s"))
    val viaShuffle = graft.operators.Bpe.vocabJoin(words, ws, n, maxBroadcast = 0L)
      .select(col("w"), concat_ws("|", col("syms")).as("s"))
    // the fallback must actually BE a different physical strategy...
    val shuffleBhj = viaShuffle.queryExecution.executedPlan.collect {
      case b: BroadcastHashJoinExec => b
    }
    assert(shuffleBhj.isEmpty, "maxBroadcast=0 must not plan a broadcast join")
    // ...and produce the identical multiset of rows
    assert(viaBroadcast.exceptAll(viaShuffle).count() == 0)
    assert(viaShuffle.exceptAll(viaBroadcast).count() == 0)
  }

  test("pii_redaction: planted patterns are counted and fully removed") {
    val emailRe = graft.queries.PackingQueries.EmailRe
    val phoneRe = graft.queries.PackingQueries.PhoneRe
    val out = SparkEntry.queries("pii_redaction")(spark, sf)
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0,
      "every doc carries at least the planted email + phone")
    // recompute the redacted text with the same expressions and assert
    // nothing matching either pattern survives
    val aug = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com or +1 (555) 0"),
      col("doc_id").cast("string"))
    val survivors = graft.sources.Tables.documents(spark, sf)
      .select(regexp_replace(regexp_replace(aug, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>").as("red"))
      .filter(col("red").rlike(emailRe) || col("red").rlike(phoneRe))
      .count()
    assert(survivors == 0, "redacted text must contain no matchable PII")
  }

  test("randomized withScoreH parity: score/hash/cluster vs an independent re-derivation") {
    // The r17 one-scan rewrite moved exact dedup into a min-over-h
    // window computed NEXT TO the score projection; pin its semantics
    // across shapes the fixture doesn't enumerate — random token
    // bags with planted exact duplicates (including duplicates whose
    // doc_ids interleave non-duplicates), single-token and
    // repeated-token docs. The reference derivation is driver-side
    // Scala over the same rows: md5 of the raw text, cid = min doc_id
    // per identical text, score = 1e6·n_uniq div n_tok — any
    // divergence is the window/projection rewrite, not the data.
    import spark.implicits._
    import java.security.MessageDigest
    val rnd = new scala.util.Random(1823L)
    for (trial <- 1 to 3) {
      val vocab = (0 until 12).map(i => s"w$i")
      val bases = (0 until 15).map { i =>
        (1 + rnd.nextInt(9)) match {
          case 1 => vocab(rnd.nextInt(vocab.size)) // single-token doc
          case n => (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        }
      }
      // planted duplicates: every third base re-appears under 1-2 new
      // interleaved ids
      val rows = bases.zipWithIndex.flatMap { case (t, i) =>
        val dups = if (i % 3 == 0)
          (1 to 1 + rnd.nextInt(2)).map(c => (100L * i + c * 7, t))
        else Seq.empty
        (100L * i, t) +: dups
      }.map { case (id, t) => (id, s"src${id % 4}", t) }
      val got = graft.queries.PackingQueries.withScoreH(
          rows.toDF("doc_id", "source", "text"))
        .select(col("doc_id"), col("n_tok"), col("n_uniq"),
          col("score"), col("h"), col("cid"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getLong(5)))).toMap
      val md = MessageDigest.getInstance("MD5")
      def md5hex(s: String): String =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val cidOf = rows.groupBy(_._3).map { case (t, rs) =>
        t -> rs.map(_._1).min
      }
      rows.foreach { case (id, _, t) =>
        val toks = t.split(" ", -1).toSeq
        val want = (toks.size.toLong, toks.distinct.size.toLong,
          1000000L * toks.distinct.size / toks.size, md5hex(t), cidOf(t))
        assert(got(id) == want,
          s"trial $trial doc $id diverged: got ${got(id)}, want $want")
      }
      assert(rows.exists(r => cidOf(r._3) != r._1),
        s"trial $trial fixture planted no duplicates")
    }
  }
}
