package graft.queries

import graft.{GQuery, Tables}
import graft.functions.HashFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — the north-star LLM-pipeline
  * family: exact, normalized-exact, MinHash+LSH, SimHash, and bounded exact
  * n-gram Jaccard.
  *
  * Scale design: every fuzzy variant works by (1) computing a compact per-doc
  * signature in one narrow pass, (2) shuffling only (signature, doc_id) pairs
  * keyed on LSH buckets, (3) joining within buckets. Nothing ever shuffles
  * document text except the final (small) candidate verification, and no
  * operator is quadratic in the corpus.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Distinct unigram token set — the shingle basis for the fuzzy ops. */
  private val tokensCol = array_distinct(split(col("text"), " "))

  // Exact dedup: duplicate groups by raw text; keeper = min(doc_id). This is
  // the reference's A6 idempotency semantics (already-converted check,
  // dags/msconvert_dag.py:112-122) applied to content instead of paths.
  private val x01 = GQuery(
    "x01_dedup_exact", "ext-dedup A6",
    (s, dir) =>
      docs(s, dir)
        .groupBy(col("text"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
        .select(col("keeper"), col("n_copies"))
        .orderBy("keeper"),
    Some("""SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies
            FROM documents GROUP BY text ORDER BY keeper"""))

  // Normalized exact dedup: lowercase, collapse whitespace, trim — catches
  // formatting-only duplicates.
  private val x02 = GQuery(
    "x02_dedup_normalized", "ext-dedup",
    (s, dir) =>
      docs(s, dir)
        .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .groupBy(col("norm"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
        .select(col("keeper"), col("n_copies"))
        .orderBy("keeper"),
    Some("""SELECT MIN(doc_id) AS keeper, COUNT(*) AS n_copies
            FROM documents
            GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
            ORDER BY keeper"""))

  /** MinHash signature: k independent hash slots, slot i = min over shingles
    * of xxhash64(shingle, i). Computed entirely with codegen'd higher-order
    * functions — one narrow projection, no explode, no shuffle.
    */
  private def minhashSig(k: Int) =
    expr(s"transform(sequence(0, ${k - 1}), i -> array_min(transform(tokens, t -> xxhash64(t, i))))")

  // MinHash + LSH banding: signatures → band hashes → self-join on
  // (band, band_hash) → candidate pairs → estimated Jaccard from signature
  // agreement. Shuffles only (doc_id, band_hash) and the 32-long signatures.
  private val x03 = GQuery(
    "x03_dedup_minhash_lsh", "ext-dedup-fuzzy",
    (s, dir) => {
      val k = 32 // signature length
      val bands = 8 // 8 bands × 4 rows
      val sigs = docs(s, dir)
        .select(col("doc_id"), tokensCol.as("tokens"))
        .select(col("doc_id"), minhashSig(k).as("sig"))
      val banded = sigs.select(
        col("doc_id"), col("sig"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * ${k / bands} + 1, ${k / bands})))")))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_hash")
      val l = banded.select(col("band"), col("band_hash"),
        col("doc_id").as("id_a"), col("sig").as("sig_a"))
      val r = banded.select(col("band"), col("band_hash"),
        col("doc_id").as("id_b"), col("sig").as("sig_b"))
      l.join(r, Seq("band", "band_hash"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
            / lit(k.toDouble)).as("est_jaccard"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(first(col("est_jaccard")).as("est_jaccard"))
        .where(col("est_jaccard") >= 0.85)
        .orderBy("id_a", "id_b")
    },
    None) // hash-seeded algorithm: no SQL oracle; covered by DedupSpec

  // SimHash near-dup: 64-bit signature via the native SimHash64 expression,
  // candidate generation by banding the signature into 4×16-bit chunks (two
  // docs within Hamming distance 3 must agree on at least one chunk), then
  // exact Hamming verification with bit_count(xor).
  private val x04 = GQuery(
    "x04_dedup_simhash", "ext-dedup-fuzzy custom-expression",
    (s, dir) => {
      val sigs = docs(s, dir)
        .select(col("doc_id"), HashFunctions.simhash64(tokensCol).as("sig"))
      val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> concat(b, ':', (sig >> (b * 16)) & 65535))")))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "chunk")
      val l = banded.select(col("chunk"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
      val r = banded.select(col("chunk"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
      l.join(r, Seq("chunk"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          expr("bit_count(sig_a ^ sig_b)").as("hamming"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(col("hamming")).as("hamming"))
        .where(col("hamming") <= 8)
        .orderBy("id_a", "id_b")
    },
    None) // hash-seeded algorithm: no SQL oracle; covered by DedupSpec

  // Exact token-set Jaccard against a bounded reference set (doc_id < 8):
  // the verification kernel of near-dup detection, with a DuckDB oracle via
  // list_intersect. Sizes are ints, so the similarity division is exact.
  private val x05 = GQuery(
    "x05_ngram_jaccard", "ext-dedup-fuzzy",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), tokensCol.as("tok"))
      val refs = d.where(col("doc_id") < 8)
        .select(col("doc_id").as("ref_id"), col("tok").as("rtok"))
      val inter = size(array_intersect(col("tok"), col("rtok")))
      val uni = size(col("tok")) + size(col("rtok")) - inter
      d.join(broadcast(refs), col("doc_id") > col("ref_id"))
        .select(col("ref_id"), col("doc_id"),
          (inter.cast("double") / uni).as("jaccard"))
        .where(col("jaccard") >= 0.8)
        .orderBy("ref_id", "doc_id")
    },
    Some("""WITH refs AS (
              SELECT doc_id AS ref_id, list_distinct(string_split(text, ' ')) AS rtok
              FROM documents WHERE doc_id < 8),
            d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS tok FROM documents)
            SELECT r.ref_id, d.doc_id,
              CAST(len(list_intersect(d.tok, r.rtok)) AS DOUBLE)
                / (len(d.tok) + len(r.rtok) - len(list_intersect(d.tok, r.rtok))) AS jaccard
            FROM d JOIN refs r ON d.doc_id > r.ref_id
            WHERE CAST(len(list_intersect(d.tok, r.rtok)) AS DOUBLE)
                / (len(d.tok) + len(r.rtok) - len(list_intersect(d.tok, r.rtok))) >= 0.8
            ORDER BY r.ref_id, d.doc_id"""))

  val queries: Seq[GQuery] = Seq(x01, x02, x03, x04, x05)
}
