package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media treated as opaque binary columns with
  * typed metadata. The fixture set has no real media, so the binary payload
  * here is synthesized from `documents.text`; [[graft.operators.MediaDecode]]
  * sniffs magic bytes and REALLY decodes PNG/JPEG/BMP/GIF/WAV via the JDK
  * (MediaDecodeSpec proves dimensions/luminance/sample-rate/RMS on generated
  * media), falling back to deterministic byte features for payloads outside
  * the JDK's codecs — which is what these text-derived fixtures hit.
  */
object Multimodal {

  // Binary metadata extraction: payload size, 64 KiB chunk plan, format guess
  // from magic-byte prefix (here: first token), content digest.
  private val x16 = GQuery(
    "x16_binary_metadata", "ext-multimodal",
    (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          ceil(length(col("payload")) / lit(65536.0)).cast("long").as("n_chunks"),
          md5(col("payload")).as("digest"),
          when(col("text").startsWith("the"), "type_a")
            .when(col("text").startsWith("spark"), "type_b")
            .otherwise("unknown").as("format_guess"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
              CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
              CAST(CEIL(octet_length(CAST(text AS BLOB)) / 65536.0) AS BIGINT) AS n_chunks,
              md5(text) AS digest,
              CASE WHEN text LIKE 'the%' THEN 'type_a'
                   WHEN text LIKE 'spark%' THEN 'type_b'
                   ELSE 'unknown' END AS format_guess
            FROM documents ORDER BY doc_id"""))

  // Partition-batched media decode through the MediaDecode operator: binary
  // payloads → per-partition codec → typed features → per-format stats. The
  // text-derived fixtures take JdkCodec's stub fallback path (deterministic
  // features from bytes, so the DuckDB oracle holds); real PNG/WAV payloads
  // take the true decode path, spec'd in MediaDecodeSpec. The plan — schema,
  // repartition-bounded batches, feature aggregation — is the 100 TB shape.
  private val x17 = GQuery(
    "x17_media_decode", "ext-multimodal",
    (s, dir) => {
      import s.implicits._
      import graft.operators.MediaDecode
      val media = Tables(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          when(col("doc_id") % 2 === 0, "img").otherwise("audio").as("format"),
          col("text").cast("binary").as("payload"))
        .repartition(8) // batch sizing: payloads per decode batch
        .as[MediaDecode.MediaRecord]
      MediaDecode.decode(media)
        .groupBy(col("format"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("n_bytes")).cast("long").as("total_bytes"),
          countDistinct(col("digest")).as("n_distinct"))
        .orderBy("format")
    },
    Some("""SELECT CASE WHEN doc_id % 2 = 0 THEN 'img' ELSE 'audio' END AS format,
              COUNT(*) AS n,
              CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
              COUNT(DISTINCT md5(text)) AS n_distinct
            FROM documents GROUP BY 1 ORDER BY 1"""))

  // Uniform frame sampling through MediaDecode.frameSample: one payload →
  // maxFrames frame rows. Text-derived payloads take the stub path
  // (deterministic uniform byte spans, n*j/k bounds — reproduced by the
  // oracle's integer arithmetic); animated GIFs take the REAL ImageIO
  // frame-raster path, spec'd in MediaDecodeSpec. Fan-out is bounded
  // (maxFrames per payload), decode parallelism = partition count.
  private val x28 = GQuery(
    "x28_frame_sample", "ext-multimodal",
    (s, dir) => {
      import s.implicits._
      import graft.operators.MediaDecode
      val media = Tables(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("video").as("format"),
          col("text").cast("binary").as("payload"))
        .repartition(8)
        .as[MediaDecode.MediaRecord]
      MediaDecode.frameSample(media, maxFrames = 4)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("n_frames").cast("long").as("n_frames"), col("frame_len"))
        .orderBy("media_id", "frame_idx")
    },
    // k = min(4, n) and zero rows for empty payloads mirrors the stub codec
    // exactly (k only differs from 4 on sub-4-byte payloads; this corpus
    // has none, but a general corpus must not break the gate)
    Some("""WITH d AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n
                       FROM documents
                       WHERE octet_length(CAST(text AS BLOB)) > 0),
            f AS (SELECT doc_id, n, least(4, n) AS k FROM d)
            SELECT doc_id AS media_id, CAST(t.j AS BIGINT) AS frame_idx,
              CAST(k AS BIGINT) AS n_frames,
              (n * (t.j + 1)) // k - (n * t.j) // k AS frame_len
            FROM f, range(0, 4) t(j) WHERE t.j < k
            ORDER BY media_id, frame_idx"""))

  // Image near-duplicate detection over perceptual hashes — the multimodal
  // member of the dedup family, at a REAL near-dup threshold: banded
  // candidate recovery over the 64-bit aHash (4 × 16-bit bands — pigeonhole
  // guarantees any pair within Hamming distance 3 shares a band; PHashSpec
  // pins the math and its sharp edge) with an exact Hamming ≤ 3 confirm.
  // Candidates take x04's cluster-assignment shape: each doc pairs with its
  // shared bands' BUCKET MINIMA only (≤ 4 candidates/doc — never pair
  // enumeration, which is quadratic on template-heavy corpora), and EVERY
  // distinct bucket candidate is verified before taking the minimum (x52's
  // discipline), so a spurious collision cannot suppress a doc's
  // bucket-min match the way min-before-verify would. The heuristic's
  // honest scope, same as x03/x04: a pair where BOTH members are
  // non-minimal in every band they share is not a candidate (its members
  // still pair with their bucket minima; x22's transitive closure is the
  // published completion where chains matter). The fixture has no images,
  // so payloads are planted in 25 duplicate classes (the x34 planting
  // discipline); their stub phashes are either identical or ~32 bits
  // apart, so banding + confirm provably reduces to the exact groups the
  // DuckDB oracle computes — the whole banded path is hash-verified end to
  // end. Scaled/re-encoded REAL images land ≤ 6 bits apart (PHashSpec),
  // within one more band of this same plan.
  //
  // Scale shape: the batch-sizing fan-out is the ONE intentional
  // payload exchange (decode parallelism = session shuffle parallelism
  // since round 15 — the deploy knob, not a constant; at
  // ingest the payloads arrive partitioned and it disappears). After
  // fingerprinting, every exchange carries (band, media_id) or
  // (media_id, 8-byte hash) — never payloads (PHashSpec pins it). The
  // per-doc candidate set is ≤ 4 rows (one per band), so the verify join
  // is linear in the corpus.
  private val x60 = GQuery(
    "x60_image_near_dup", "ext-multimodal ext-dedup-fuzzy",
    (s, dir) => {
      import s.implicits._
      import graft.operators.MediaDecode
      val media = Tables(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("img").as("format"),
          concat(lit("img-"), col("doc_id") % 25).cast("binary").as("payload"))
        // decode parallelism = session parallelism (round 15): the fixed
        // repartition(8) left 3/4 of a 32-core box idle through the
        // fingerprint pass (measured 2.7 s over 8 tasks); the keyed form
        // also drops round-robin's sort-before-repartition
        .transform(d => Par.fanOutJoin(d, col("media_id")))
        .as[MediaDecode.MediaRecord]
      // (media_id, phash, 4 × 16-bit band values as ints — the Hamming
      // confirm works bandwise: sum of per-band bit_count(xor))
      val ph = MediaDecode.perceptualHash(media)
        .select(col("media_id"), col("phash"),
          expr("transform(sequence(0, 3), b -> " +
            "cast(conv(substring(phash, b * 4 + 1, 4), 16, 10) as int))").as("bv"))
        .localCheckpoint(true) // fingerprints reused by cand + both verify sides
      val banded = ph.select(col("media_id"),
        posexplode(expr("transform(sequence(0, 3), b -> " +
          "concat(b, ':', substring(phash, b * 4 + 1, 4)))")))
        .select(col("media_id"), col("col").as("band"))
      // every distinct per-band bucket-min candidate (≤ 4 per doc) ...
      val cands = banded
        .withColumn("bucket_min", min(col("media_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("band"))))
        .where(col("bucket_min") < col("media_id"))
        .select(col("media_id"), col("bucket_min").as("cand")).distinct()
      // ... is Hamming-confirmed, THEN the minimum verified match wins
      val verified = cands
        .join(ph.select(col("media_id"), col("bv")), Seq("media_id"))
        .join(ph.select(col("media_id").as("cand"), col("bv").as("cbv")), Seq("cand"))
        .where(expr("aggregate(zip_with(bv, cbv, (x, y) -> bit_count(x ^ y)), " +
          "0, (a, x) -> a + x)") <= 3)
        .groupBy(col("media_id")).agg(min(col("cand")).as("keeper"))
      // group rows: members + their keepers, n_copies = group size. Hamming
      // ≤ t is not transitive, so in a chain (9 matches 5, 5 matches 1) a
      // doc can be both a member AND someone's keeper — it must surface
      // once, as a member (its own match stands; its dependents' rows name
      // it): the anti join drops exactly the keeper rows of docs that are
      // themselves members. A no-op on disjoint groups (the fixture).
      val sizes = verified.groupBy(col("keeper")).agg(count(lit(1)).as("n_dups"))
      val memberRows = verified
        .join(ph.select(col("media_id"), col("phash")), Seq("media_id"))
        .join(sizes, Seq("keeper"))
        .select(col("media_id"), col("phash"), col("keeper"),
          (col("n_dups") + 1).as("n_copies"))
      val keeperRows = sizes
        .join(verified.select(col("media_id").as("keeper")), Seq("keeper"), "left_anti")
        .join(ph.select(col("media_id"), col("phash")),
          sizes("keeper") === ph("media_id"))
        .select(col("media_id"), col("phash"), col("keeper"),
          (col("n_dups") + 1).as("n_copies"))
      memberRows.union(keeperRows).orderBy("media_id")
    },
    Some("""WITH p AS (SELECT doc_id,
                         substr(md5('img-' || (doc_id % 25)), 1, 16) AS phash
                       FROM documents),
            k AS (SELECT doc_id AS media_id, phash,
                    MIN(doc_id) OVER (PARTITION BY phash) AS keeper,
                    COUNT(*) OVER (PARTITION BY phash) AS n_copies
                  FROM p)
            SELECT media_id, phash, keeper, CAST(n_copies AS BIGINT) AS n_copies
            FROM k WHERE n_copies >= 2 ORDER BY media_id"""))

  // The REAL decode path under a full DuckDB hash oracle — closing x60's
  // gap (its fixture payloads are text bytes, so its oracle exercises the
  // md5 fallback, and the real-ImageIO path was spec-only). Each document
  // becomes a deterministic 32×32 black/white GIF whose 8×8 block pattern
  // encodes SyntheticImages.patternBits(doc_id); the engine REALLY decodes
  // it (ImageIO GIF reader → luminance sampling grid → aHash bit assembly)
  // and the oracle computes the same 64-bit value from doc_id in plain
  // SQL. Any decode drift — wrong pixel order, sampling bounds, bit
  // endianness, or a silent fallback to the stub hash (real_decode would
  // flip false) — breaks the row hash. Scale shape: pure narrow
  // mapPartitions decode, no exchange at all.
  private val x74 = GQuery(
    "x74_image_real_decode", "ext-multimodal real-decode",
    (s, dir) => {
      import s.implicits._
      import graft.operators.MediaDecode
      val media = Tables(s, dir, "documents")
        .select(col("doc_id"))
        // decode parallelism (round 15, guide §2.6): the id-only scan is
        // one byte-sized split, so the REAL ImageIO decode ran as ONE
        // 1.9 s task on a 32-core box; fanning the 8-byte ids out is free
        .transform(d => Par.fanOutJoin(d, col("doc_id")))
        .as[Long]
        .map(id => MediaDecode.MediaRecord(id, "gif", MediaDecode.SyntheticImages.gif(id)))
      MediaDecode.perceptualHash(media)
        .select(col("media_id"), col("phash"), col("real_decode"))
        .orderBy("media_id")
    },
    Some("""WITH bits AS (
              SELECT doc_id, i FROM documents, unnest(range(1, 64)) r(i)
              WHERE (doc_id + i) % 3 = 0)
            SELECT d.doc_id AS media_id,
              printf('%016x', CAST(COALESCE(SUM(1::BIGINT << (63 - b.i)), 0) AS BIGINT)) AS phash,
              true AS real_decode
            FROM documents d LEFT JOIN bits b ON d.doc_id = b.doc_id
            GROUP BY d.doc_id ORDER BY media_id"""))

  // ------------------------------------------------------------------- x195
  // Real WAV decode (the audio half of x74): per-document synthetic PCM
  // tracks wrapped in genuine WAV containers (javax.sound encoder),
  // re-parsed through AudioSystem — sample rate from the REAL fmt
  // chunk, samples from the REAL data chunk — then windowed into exact
  // integer energies the oracle replays from the closed-form sample
  // formula. A defect anywhere in the container round-trip breaks the
  // row hash; `real_decode` additionally certifies header + frame-count
  // agreement per track.
  private val x195 = GQuery(
    "x195_audio_real_decode", "ext-multimodal audio real-decode",
    (s, dir) => {
      import s.implicits._
      import graft.operators.AudioDecode
      val media = Tables(s, dir, "documents")
        .select(col("doc_id"))
        // decode parallelism — the x74 note applies verbatim
        .transform(d => Par.fanOutJoin(d, col("doc_id")))
        .as[Long]
        .map(id => AudioDecode.AudioRecord(id, AudioDecode.SyntheticAudio.wav(id)))
      AudioDecode.windowEnergy(media)
        .select(col("media_id"), col("win"), col("sum_sq"), col("n_samples"),
          col("sample_rate"), col("real_decode"))
        .orderBy("media_id", "win")
    },
    Some("""WITH s AS (
              SELECT doc_id, i,
                ((doc_id * 131 + i * 17) % 2003) - 1001 AS v
              FROM documents, unnest(range(0, 256)) r(i))
            SELECT doc_id AS media_id, CAST(i // 64 AS INT) AS win,
              CAST(SUM(v * v) AS BIGINT) AS sum_sq,
              CAST(COUNT(*) AS BIGINT) AS n_samples,
              8000 AS sample_rate, true AS real_decode
            FROM s GROUP BY doc_id, i // 64
            ORDER BY media_id, win"""))

  // ------------------------------------------------------------------- x388
  // Perceptual-hash Hamming-threshold curve — the x331 threshold-curve
  // discipline on the τ x60 hard-codes: over a GRADED planted fixture
  // (32-bit stub phash per 25-class corpus, doc_id%4 deterministic
  // md5-positioned bit flips, so within-class pair distances spread
  // 0..8 instead of x60's all-or-nothing), confirmed near-dup pairs and
  // 4×8-bit banding recall at τ ∈ {0,1,2,3,4,6}. The pigeonhole edge is
  // MEASURED, not asserted: recall is exactly 1000‰ through τ = 3 (any
  // pair within Hamming 3 of a 4-band split shares a band) and falls
  // off above — the table a media-dedup owner reads before moving the
  // x60 threshold.
  //
  // Scale shape: an EVAL-tier row (the x340/x348 discipline): pair
  // enumeration is capped at 64 docs per class (row_number ≤ 64, the
  // hot-bucket-cap convention), so the pair table is a constant
  // 25·C(64,2) regardless of corpus size; everything upstream is one
  // map-only projection.
  private val x388 = GQuery(
    "x388_phash_threshold_curve", "ext-multimodal dedup-fuzzy threshold curve",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cls")).orderBy(col("doc_id"))
      val ph = Tables(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 25).as("cls"),
          expr("""cast(conv(substring(md5(concat('img-',
               cast(doc_id % 25 as string))), 9, 8), 16, 10) as bigint)""")
            .as("base32"),
          expr("""coalesce(aggregate(array_distinct(
               transform(filter(sequence(0, 3), j -> j < doc_id % 4),
                 j -> shiftleft(1L, cast(conv(substring(md5(concat(
                   cast(doc_id as string), ':', cast(j as string))), 1, 2),
                   16, 10) as int) % 32))),
               0L, (a, x) -> a + x), 0L)""").as("mask"))
        .select(col("doc_id"), col("cls"),
          expr("base32 ^ mask").as("ph"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 64)
        .select(col("doc_id"), col("cls"), col("ph"))
      val pairs = ph.as("a")
        .join(ph.as("b"), expr("a.cls = b.cls AND a.doc_id < b.doc_id"))
        .select(expr("cast(bit_count(a.ph ^ b.ph) as bigint)").as("ham"),
          expr("""((a.ph div 16777216) % 256 = (b.ph div 16777216) % 256
               or (a.ph div 65536) % 256 = (b.ph div 65536) % 256
               or (a.ph div 256) % 256 = (b.ph div 256) % 256
               or a.ph % 256 = b.ph % 256)""").as("band_eq"))
      pairs
        .select(col("ham"), col("band_eq"),
          explode(expr("array(0L, 1L, 2L, 3L, 4L, 6L)")).as("tau"))
        .groupBy(col("tau"))
        .agg(
          sum(when(col("ham") <= col("tau"), 1L).otherwise(0L)).as("n_true"),
          sum(when(col("ham") <= col("tau") && col("band_eq"), 1L)
            .otherwise(0L)).as("n_banded"))
        .withColumn("recall_milli", expr(
          "case when n_true > 0 then (1000 * n_banded) div n_true end"))
        .orderBy("tau")
    },
    Some("""WITH d AS (SELECT doc_id,
                    CAST(CAST(CONCAT('0x', substr(md5('img-' || (doc_id % 25)),
                      9, 8)) AS UINTEGER) AS BIGINT) AS base32,
                    doc_id % 25 AS cls, doc_id % 4 AS k
                  FROM documents),
            m AS (SELECT doc_id, cls, base32, k,
                    COALESCE((SELECT CAST(SUM(DISTINCT (CAST(1 AS BIGINT)
                        << CAST(CAST(CONCAT('0x', substr(md5(
                          CAST(d.doc_id AS VARCHAR) || ':'
                          || CAST(j AS VARCHAR)), 1, 2)) AS INTEGER) % 32
                          AS INTEGER)))
                      AS BIGINT) FROM range(0, 4) t(j) WHERE j < d.k), 0)
                      AS mask
                  FROM d),
            p AS (SELECT doc_id, cls, xor(base32, mask) AS ph FROM m),
            capped AS (SELECT * FROM (SELECT doc_id, cls, ph,
                         ROW_NUMBER() OVER (PARTITION BY cls
                           ORDER BY doc_id) AS rn
                       FROM p) WHERE rn <= 64),
            pairs AS (SELECT a.cls,
                        CAST(bit_count(CAST(xor(a.ph, b.ph) AS BIGINT))
                          AS BIGINT) AS ham,
                        ((a.ph // 16777216) % 256 = (b.ph // 16777216) % 256
                         OR (a.ph // 65536) % 256 = (b.ph // 65536) % 256
                         OR (a.ph // 256) % 256 = (b.ph // 256) % 256
                         OR a.ph % 256 = b.ph % 256) AS band_eq
                      FROM capped a JOIN capped b
                        ON a.cls = b.cls AND a.doc_id < b.doc_id),
            tau AS (SELECT CAST(unnest([0, 1, 2, 3, 4, 6]) AS BIGINT) AS tau)
            SELECT tau,
              CAST(SUM(CASE WHEN ham <= tau THEN 1 ELSE 0 END) AS BIGINT)
                AS n_true,
              CAST(SUM(CASE WHEN ham <= tau AND band_eq THEN 1 ELSE 0 END)
                AS BIGINT) AS n_banded,
              CAST(CASE WHEN SUM(CASE WHEN ham <= tau THEN 1 ELSE 0 END) > 0
                THEN (1000 * SUM(CASE WHEN ham <= tau AND band_eq
                  THEN 1 ELSE 0 END))
                  // SUM(CASE WHEN ham <= tau THEN 1 ELSE 0 END) END
                AS BIGINT) AS recall_milli
            FROM pairs, tau GROUP BY 1 ORDER BY 1"""))

  val queries: Seq[GQuery] = Seq(x16, x17, x28, x60, x74, x195, x388)
}
