package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators
  * (SURVEY.md §7.4): tokenization, shingling, portable hashing, MinHash
  * parameters. Everything here is a codegen'd Catalyst expression —
  * no UDFs — and every primitive has an exact DuckDB-SQL counterpart so
  * dedup pipelines are oracle-checkable end to end.
  */
object TextOps {

  /** Whitespace tokens of trimmed text. Matches DuckDB
    * `string_split(trim(text), ' ')` (the corpus is single-spaced). */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Portable 60-bit string hash: first 15 hex digits of md5, as a
    * non-negative int64. Identical in DuckDB as
    * `('0x' || substr(md5(s), 1, 15))::BIGINT`. Spark's native
    * `hash`/`xxhash64` seeds differ from other engines, so md5 is the
    * cross-engine choice; for pure-Spark pipelines xxhash64 would be
    * cheaper. */
  def portableHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Distinct word n-gram shingles (default 3-gram) of a token array.
    * DuckDB: `list_distinct(list_transform(range(1, len(t)-n+2),
    * i -> array_to_string(list_slice(t, i, i+n-1), ' ')))`. Caller must
    * filter size(tokens) >= n first (sequence() would run backwards). */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(orderedShingles(toks, n))

  /** ORDERED n-gram shingles (duplicates kept, position preserved) —
    * the winnowing input, where the hash SEQUENCE matters. DuckDB:
    * `list_transform(range(1, len(t)-n+2), i ->
    * array_to_string(list_slice(t, i, i+n-1), ' '))`. */
  def orderedShingles(toks: Column, n: Int = 3): Column =
    transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** Winnowing window width w (Schleimer/Wilkerson/Aiken, SIGMOD '03):
    * every run of w consecutive k-gram hashes contributes its minimum
    * to the fingerprint, guaranteeing any match of length >= w+k-1
    * tokens shares a selected gram, at expected density 2/(w+1). */
  val WinnowW = 4

  /** MinHash: k=16 universal-hash functions h_i(x) = (a_i*(x%P)+b_i)%P
    * over the portable shingle hash, banded 4×4 for LSH. Constants are
    * primes < 2^30 so a*(x%P) stays within int64. The SAME constants
    * feed the Spark plan and the generated oracle SQL — single source
    * of truth, no drift. */
  val MinhashP: Long = 2147483647L
  val MinhashAB: Seq[(Long, Long)] = Seq(
    (1299721L, 15485863L), (32452843L, 49979687L),
    (67867967L, 86028121L), (104395301L, 122949823L),
    (141650939L, 160481183L), (179424673L, 198491317L),
    (217645177L, 236887691L), (256203161L, 275604541L),
    (295075147L, 314606869L), (334214459L, 353868013L),
    (373587883L, 393342739L), (413158511L, 433024223L),
    (452930459L, 472882027L), (492876847L, 512927357L),
    (533000389L, 553105243L), (573259391L, 593441843L))
  val MinhashBands = 4
  val MinhashRows = 4 // MinhashAB.size / MinhashBands

  /** i-th MinHash value given the portable shingle-hash column. */
  def minhashExpr(h: Column, i: Int): Column = {
    val (a, b) = MinhashAB(i)
    (lit(a) * (h % lit(MinhashP)) + lit(b)) % lit(MinhashP)
  }

  /** SQL fragment for the i-th MinHash over hash expression `h`. */
  def minhashSql(h: String, i: Int): String = {
    val (a, b) = MinhashAB(i)
    s"(${a}::BIGINT * ($h % ${MinhashP}) + ${b}::BIGINT) % ${MinhashP}"
  }

  /** SimHash over token multiset: for each of `bits` bit positions,
    * sign of Σ_tokens (bit set ? +1 : -1), weighted by token counts.
    * 32 bits keeps the per-doc signature in an int and the SQL mirror
    * readable. */
  val SimhashBits = 32

  /** Stopword/marker lists for the n-gram language-ID heuristic.
    * Order is the deterministic tie-break priority. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "und", "ein"),
    "es" -> Seq("el", "los", "y", "una"),
    "fr" -> Seq("le", "la", "et", "une"),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Count of tokens contained in `words`. DuckDB mirror:
    * `len(list_filter(t, x -> list_contains([...], x)))`. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))
}
