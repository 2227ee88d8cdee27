package graft.queries

import graft.multimodal.MediaPipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked coverage for the multimodal pipeline: the typed
  * Dataset → mapPartitions decode path must produce exactly what the
  * closed-form SQL predicts. Image/audio payloads are REAL PNG/WAV
  * streams round-tripped through genuine header parsing — the oracle
  * can still predict the result because the dims/rate embedded at
  * synthesis time derive from md5(text); the parse itself is binary
  * (IHDR big-endian, fmt-chunk little-endian), exercised further in
  * MediaPipelineSpec with corrupt-payload cases.
  */
object MultimodalQueries extends QueryModule {

  /** `h` = the 60-bit md5-prefix content hash of the document text —
    * the seed both the synthesizer and the oracle derive dims from. */
  private val hashSql = "('0x' || substr(md5(text), 1, 15))::BIGINT"

  val all: Seq[Q] = Seq(
    Q("multimodal_features",
      (s, dir) => {
        val assets = MediaPipeline.attachBinary(Tables.documents(s, dir))
        MediaPipeline.extractFeatures(s, assets).toDF()
      },
      Some(s"""SELECT doc_id,
             |       ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS media_type,
             |       CASE (doc_id % 3) WHEN 0 THEN 45 WHEN 1 THEN 44
             |            ELSE 232 END AS n_bytes,
             |       CASE (doc_id % 3) WHEN 1 THEN 0
             |            ELSE 64 + ($hashSql % 1216) END AS width,
             |       CASE (doc_id % 3) WHEN 1 THEN 0
             |            ELSE 64 + (($hashSql // 1216) % 656) END AS height,
             |       CASE (doc_id % 3) WHEN 2
             |            THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END AS n_frames,
             |       CASE (doc_id % 3) WHEN 1 THEN 8000 * (1 + $hashSql % 6)
             |            ELSE 0 END AS sample_rate,
             |       TRUE AS decode_ok
             |FROM documents""".stripMargin)),

    // Frame sampling + aspect-preserving resize over video assets:
    // every 5th frame to one row with its 256-cap target dims and a
    // per-frame fingerprint — the video→frame-level-training-rows
    // fan-out with the decode stubbed and the plumbing (generator,
    // schema, arithmetic) real and oracle-checked.
    Q("multimodal_frames",
      (s, dir) => {
        val feats = MediaPipeline.extractFeatures(s,
          MediaPipeline.attachBinary(Tables.documents(s, dir))).toDF()
        MediaPipeline.sampleFrames(feats, everyK = 5, maxDim = 256L)
      },
      Some(s"""WITH f AS (
             |  SELECT doc_id,
             |         64 + ($hashSql % 1216) AS width,
             |         64 + (($hashSql // 1216) % 656) AS height,
             |         1 + octet_length(encode(text)) % 30 AS n_frames
             |  FROM documents WHERE (doc_id % 3) = 2),
             |v AS (SELECT doc_id, width, height,
             |             unnest(range(0, n_frames, 5)) AS frame_idx
             |      FROM f)
             |SELECT doc_id, frame_idx,
             |       (width * 131 + height) * 1000003 + frame_idx * 97 AS frame_fp,
             |       CASE WHEN greatest(width, height) <= 256 THEN width
             |            WHEN width >= height THEN 256
             |            ELSE greatest(1, (width * 256) // height) END AS out_width,
             |       CASE WHEN greatest(width, height) <= 256 THEN height
             |            WHEN width >= height THEN greatest(1, (height * 256) // width)
             |            ELSE 256 END AS out_height
             |FROM v""".stripMargin)),

    // Audio feature extraction over REAL PCM: synthesized WAVs carry
    // genuine 16-bit little-endian sample data (silent prefix +
    // integer sawtooth, parameters from md5(text)); the Spark path
    // must round-trip the actual bytes (RIFF sub-chunk walk + PCM
    // decode + one-pass integer features), while the oracle
    // reconstructs the same waveform closed-form in SQL — an ORACLED
    // codec-level decode, exact to the last bit because every sample
    // is integer arithmetic (floor division on non-negative operands,
    // identical in JVM and DuckDB). Dead-letter on malformed streams
    // as everywhere in this module.
    Q("audio_features",
      (s, dir) => {
        val assets = MediaPipeline.attachAudio(Tables.documents(s, dir))
        MediaPipeline.audioFeatures(s, assets).toDF()
      },
      Some(s"""WITH p AS (
             |  SELECT doc_id,
             |         8000 * (1 + $hashSql % 6) AS sr,
             |         2000 + ($hashSql // 7) % 1000 AS n,
             |         ($hashSql // 11) % 400 AS pre,
             |         20 + ($hashSql // 13) % 50 AS period,
             |         1000 + (($hashSql // 17) % 9) * 1000 AS amp
             |  FROM documents),
             |s AS (
             |  SELECT doc_id, sr, n, i,
             |         CASE WHEN i < pre THEN 0
             |              ELSE ((i % period) * 2 * amp) // period - amp END AS v
             |  FROM (SELECT doc_id, sr, n, pre, period, amp,
             |               unnest(range(0, n)) AS i
             |        FROM p)),
             |l AS (
             |  SELECT doc_id, sr, n, v,
             |         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
             |  FROM s)
             |SELECT doc_id,
             |       CAST(sr AS BIGINT) AS sample_rate,
             |       CAST(n AS BIGINT) AS n_samples,
             |       CAST(count(CASE WHEN v = 0 THEN 1 END) AS BIGINT) AS n_silent,
             |       CAST(max(abs(v)) AS BIGINT) AS peak,
             |       CAST(CAST(sum(v * v) AS BIGINT) // n AS BIGINT) AS rms2,
             |       CAST(count(CASE WHEN v * pv < 0 THEN 1 END) AS BIGINT)
             |         AS zero_crossings,
             |       TRUE AS decode_ok
             |FROM l GROUP BY doc_id, sr, n""".stripMargin)),

    // Video motion analysis over REAL mdat payloads: synthesized MP4s
    // carry scene-structured 32-byte frame blocks; the Spark path
    // walks the boxes to mdat, slices frames, and computes per-frame
    // L1 motion + scene cuts (in-scene motion is exactly 96 by
    // construction, a cut is L1 > 200), while the oracle reconstructs
    // every frame BYTE closed-form in SQL — like audio_features, a
    // codec-level decode under the exact hash gate because the
    // payload is integer-deterministic. The per-(doc, byte-position)
    // lag + per-frame rollup is the same shape a real shot-boundary
    // detector runs over decoded luma planes.
    Q("video_scene_cuts",
      (s, dir) => {
        val assets = MediaPipeline.attachVideo(Tables.documents(s, dir))
        MediaPipeline.videoFeatures(s, assets).toDF()
      },
      Some(s"""WITH p AS (
             |  SELECT doc_id, $hashSql AS h,
             |         10 + ($hashSql // 19) % 41 AS n
             |  FROM documents),
             |fj AS (
             |  SELECT doc_id, f, j,
             |         ((h + (f // 5) * 53 + j * 11) % 200) + (f % 5) * 3 AS b
             |  FROM (SELECT doc_id, h, n, unnest(range(0, n)) AS f FROM p),
             |       (SELECT unnest(range(0, 32)) AS j)),
             |d AS (
             |  SELECT doc_id, f, b,
             |         lag(b) OVER (PARTITION BY doc_id, j ORDER BY f) AS pb
             |  FROM fj),
             |l AS (
             |  SELECT doc_id, f, CAST(sum(abs(b - pb)) AS BIGINT) AS l1
             |  FROM d WHERE pb IS NOT NULL GROUP BY doc_id, f),
             |a AS (
             |  SELECT doc_id, CAST(sum(l1) AS BIGINT) AS total_l1,
             |         CAST(count(CASE WHEN l1 > 200 THEN 1 END) AS BIGINT) AS n_cuts,
             |         CAST(max(l1) AS BIGINT) AS max_frame_l1
             |  FROM l GROUP BY doc_id)
             |SELECT p.doc_id, CAST(p.n AS BIGINT) AS n_frames,
             |       CAST(coalesce(a.total_l1, 0) AS BIGINT) AS total_l1,
             |       CAST(coalesce(a.n_cuts, 0) AS BIGINT) AS n_cuts,
             |       CAST(coalesce(a.max_frame_l1, 0) AS BIGINT) AS max_frame_l1,
             |       TRUE AS decode_ok
             |FROM p LEFT JOIN a ON p.doc_id = a.doc_id""".stripMargin)),

    // Image near-dup dedup over REAL pixels: synthesized grayscale
    // images decoded by the in-repo codecs (PNG chunk walk + inflate
    // + all five unfilters; baseline-JPEG huffman + dequant + IDCT —
    // both ImageIO-cross-checked in MediaPipelineSpec), perceptually
    // hashed (integer aHash — bit-stable, brightness-shift-
    // invariant), then clustered the LSH way: collapse to DISTINCT
    // hash values (see below), banded Hamming buckets (8 bands ×
    // 8 bits — any pair within Hamming 7 shares a band by pigeonhole,
    // so every ≤6 near-dup reaches some bucket, never doc×doc), exact
    // bit_count verification, and connected components. The image
    // twin of dedup_minhash_lsh.
    // HASH-GATED over a MIXED PNG/JPEG corpus: neither zlib nor a DCT
    // is expressible in SQL, but the oracle needs neither — the
    // synthesized content is closed-form from doc_id. Even docs are
    // PNGs (pixelPattern + 10 modular perturbations; the SQL
    // reconstructs the raster pre-compression), odd docs are baseline
    // JPEGs whose blocks are constant (blockPattern + 2 block
    // perturbations; DC-only blocks make the lossy codec exactly
    // lossless, so cell values are just 64·blockval). Both branches
    // feed one integer aHash (HUGEINT bit-build, cast to signed
    // BIGINT two's-complement to match Spark's Long), the band join +
    // bit_count verify, and the recursive-CTE transitive closure
    // dedup_clusters proved. The Spark side round-trips real zlib
    // IDAT + all five PNG unfilters AND a real SOF0 huffman decode +
    // dequant + IDCT — the gate certifies both codec paths bit-
    // exactly. MediaPipelineSpec keeps ImageIO parity for both.
    Q("image_dedup_ahash",
      (s, dir) => {
        // Decode ONCE: the (doc_id, ahash) frame feeds FOUR separate
        // plan branches (both sides of the banded self-join via dh,
        // ConnectedComponents' node set, and docComp), and CC's
        // iterative rounds re-derive their input lineage — without a
        // materialization the zlib/IDCT decode of every image re-ran
        // per branch (the before-plan holds 28 decode MapPartitions
        // nodes over 20 corpus scans). An eager localCheckpoint of the
        // two-column hash frame cuts that to exactly one decode pass;
        // at 100 TB this is the §8 rule — decide on a lightweight
        // proxy (64-bit hashes), never re-touch the heavy payload.
        val hashes = MediaPipeline.imageHashes(s,
          MediaPipeline.attachPixelImages(Tables.documents(s, dir)))
          .filter(col("decode_ok"))
          .select(col("doc_id"), col("ahash"))
          .localCheckpoint(true)
        // Collapse to DISTINCT hash values before the candidate join.
        // Docs sharing an identical ahash are dups at Hamming 0, so
        // the verified near-dup graph over docs is exactly the blow-up
        // of the graph over distinct hashes: clustering hash VALUES
        // and mapping labels back preserves all-pairs semantics
        // bit-for-bit (ImageDedupStarSpec re-derives the doc-level
        // all-pairs clustering and asserts equality). The payoff is
        // scale: within a true dup cluster doc-level all-pairs is
        // QUADRATIC in cluster size (the 10× sweep measured 6.9M →
        // 692M bucket pairs sf0.1 → sf1 — planted clusters grow
        // linearly with the corpus, like popular crawl images), while
        // hash diversity is set by content, not corpus size (~100
        // distinct hashes and ~3k bucket pairs at BOTH scales). The
        // exact-dup mass — the part that grows linearly — never enters
        // the join.
        val dh = hashes.select(col("ahash")).distinct()
        val banded = dh.select(col("ahash"),
          explode(array((0 until 8).map(b =>
            struct(lit(b).as("band"),
              shiftrightunsigned(col("ahash"), b * 8)
                .bitwiseAND(lit(255L)).as("sig"))): _*)).as("bs"))
          .select(col("ahash"),
            col("bs.band").as("band"), col("bs.sig").as("sig"))
        val hedges = banded.as("x")
          .join(banded.as("y"), Seq("band", "sig"))
          .filter(col("x.ahash") < col("y.ahash"))
          .filter(bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))) <= 6)
          .select(col("x.ahash").as("a"), col("y.ahash").as("b"))
          .distinct()
        // CC over hash nodes (diversity-sized); an isolated hash is
        // its own component. No broadcast hints: diversity is bounded
        // by content in practice but not provably, so AQE decides.
        val hlabels = graft.operators.ConnectedComponents.components(hedges)
          .select(col("node").as("ahash"), col("component").as("hcomp"))
        val docComp = hashes.select(col("doc_id"), col("ahash"))
          .join(hlabels, Seq("ahash"), "left_outer")
          .select(col("doc_id"), col("ahash"),
            coalesce(col("hcomp"), col("ahash")).as("hcomp"))
        val canon = docComp.groupBy(col("hcomp"))
          .agg(min(col("doc_id")).as("canonical_id"))
        docComp.join(canon, Seq("hcomp"))
          .select(col("doc_id"), col("ahash"), col("canonical_id"))
      },
      Some("""WITH RECURSIVE
             |dd AS (SELECT doc_id, doc_id % 40 AS seed FROM documents),
             |par AS (SELECT doc_id, 3 + seed % 5 AS a, 2 + seed % 7 AS b,
             |               seed % 11 AS c, seed FROM dd),
             |px0 AS MATERIALIZED (
             |  SELECT doc_id, x, y,
             |         (x * a + y * b + ((x * y) % 13) * c + seed * 31) % 229 AS v
             |  FROM par, (SELECT unnest(range(0, 64)) AS x),
             |       (SELECT unnest(range(0, 64)) AS y)
             |  WHERE doc_id % 2 = 0),
             |pert AS (SELECT doc_id,
             |                abs(doc_id * 2654435761 + i * 40503) % 4096 AS pos,
             |                count(*) AS k
             |         FROM dd, (SELECT unnest(range(0, 10)) AS i)
             |         WHERE doc_id % 2 = 0 GROUP BY 1, 2),
             |px AS (SELECT p.doc_id, p.x, p.y,
             |              CASE WHEN pert.k IS NOT NULL THEN (p.v + 7 * pert.k) % 229
             |                   ELSE p.v END AS v
             |       FROM px0 p LEFT JOIN pert
             |         ON p.doc_id = pert.doc_id AND p.y * 64 + p.x = pert.pos),
             |cellsP AS (SELECT doc_id, (y // 8) * 8 + (x // 8) AS cell,
             |                  CAST(sum(v) AS BIGINT) AS cv
             |           FROM px GROUP BY 1, 2),
             |bv0 AS (SELECT doc_id, gy * 8 + gx AS cell,
             |               (gx * a + gy * b + ((gx * gy) % 5) * c + seed * 37) % 229 AS bv
             |        FROM par, (SELECT unnest(range(0, 8)) AS gx),
             |             (SELECT unnest(range(0, 8)) AS gy)
             |        WHERE doc_id % 2 = 1),
             |pertJ AS (SELECT doc_id,
             |                 abs(doc_id * 2654435761 + i * 48271) % 64 AS pos,
             |                 count(*) AS k
             |          FROM dd, (SELECT unnest(range(0, 2)) AS i)
             |          WHERE doc_id % 2 = 1 GROUP BY 1, 2),
             |cellsJ AS (SELECT b.doc_id, b.cell,
             |                  64 * (CASE WHEN pertJ.k IS NOT NULL
             |                             THEN (b.bv + 7 * pertJ.k) % 229
             |                             ELSE b.bv END)::BIGINT AS cv
             |           FROM bv0 b LEFT JOIN pertJ
             |             ON b.doc_id = pertJ.doc_id AND b.cell = pertJ.pos),
             |cells AS (SELECT * FROM cellsP UNION ALL SELECT * FROM cellsJ),
             |gm AS (SELECT doc_id, CAST(sum(cv) AS BIGINT) // 64 AS mean
             |       FROM cells GROUP BY 1),
             |ahh AS (
             |  SELECT c.doc_id,
             |         CAST(sum(CASE WHEN cv > mean THEN 1::HUGEINT << (63 - cell)
             |                       ELSE 0::HUGEINT END) AS HUGEINT) AS hb
             |  FROM cells c JOIN gm USING (doc_id) GROUP BY 1),
             |ah AS MATERIALIZED (
             |  SELECT doc_id,
             |         CAST(hb - CASE WHEN hb >= 9223372036854775808::HUGEINT
             |                        THEN 18446744073709551616::HUGEINT
             |                        ELSE 0::HUGEINT END AS BIGINT) AS ahash
             |  FROM ahh),
             |dh AS (SELECT DISTINCT ahash FROM ah),
             |bs AS MATERIALIZED (
             |  SELECT ahash, band, (ahash >> (band * 8)) & 255 AS sig
             |  FROM dh, (SELECT unnest(range(0, 8)) AS band)),
             |ed AS (SELECT DISTINCT x.ahash AS a, y.ahash AS b
             |       FROM bs x JOIN bs y ON x.band = y.band AND x.sig = y.sig
             |                          AND x.ahash < y.ahash
             |       WHERE bit_count(xor(x.ahash, y.ahash)) <= 6),
             |e2 AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed),
             |reach(a, b) AS (SELECT a, b FROM e2
             |                UNION SELECT r.a, e.b
             |                FROM reach r JOIN e2 e ON r.b = e.a),
             |hcl AS (SELECT a AS ahash, least(a, min(b)) AS hcomp
             |        FROM reach GROUP BY a),
             |dc AS (SELECT ah.doc_id, ah.ahash,
             |              coalesce(hcl.hcomp, ah.ahash) AS hcomp
             |       FROM ah LEFT JOIN hcl USING (ahash)),
             |canon AS (SELECT hcomp, min(doc_id) AS canonical_id
             |          FROM dc GROUP BY 1)
             |SELECT dc.doc_id, dc.ahash, canon.canonical_id
             |FROM dc JOIN canon USING (hcomp)""".stripMargin))
  )
}
