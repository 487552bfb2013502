package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * between raw ingestion and training: PII redaction, sub-document (line)
  * dedup, deterministic shuffling into shards, cross-source overlap
  * accounting, and vocabulary-coverage measurement.
  *
  * Scale discipline shared by the family: everything the shuffle carries is
  * a fingerprint, a position, or a count — document text moves at most once
  * (the line-dedup reassembly), and every per-document computation is a
  * narrow scan-bound projection.
  */
object CorpusOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  // The redaction patterns: kept to the regex dialect subset Java and RE2
  // share, so the engine and the DuckDB oracle scrub identically.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  // PII scrubbing: redact emails and IPv4 addresses, count what was
  // redacted. The fixture corpus is synthetic word soup with no real PII,
  // so the query plants one deterministic email and one IP per document
  // (derived from doc_id) and then scrubs them — proving the round trip
  // (plant → detect → count → replace) rather than scrubbing nothing. The
  // scrub itself is a per-row regex chain: scan-bound, no shuffle, and at
  // 100 TB it runs at parquet-read speed exactly like x12/x13.
  private val x34 = GQuery(
    "x34_pii_scrub", "ext-text pii-redaction",
    (s, dir) => {
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com from 10.0."),
        pmod(col("doc_id"), lit(256)), lit("."), pmod(col("doc_id"), lit(100)))
      val scrubbed = regexp_replace(
        regexp_replace(planted, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")
      docs(s, dir)
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(concat(text, ' contact user', doc_id, " +
            s"'@example.com from 10.0.', doc_id % 256, '.', doc_id % 100), '$EmailRe', 0)"))
            .cast("long").as("n_emails"),
          scrubbed.as("clean_text"))
        .select(col("doc_id"), col("n_emails"), md5(col("clean_text")).as("clean_fp"),
          (instr(col("clean_text"), "<EMAIL>") > 0).as("has_email_tag"),
          (instr(col("clean_text"), "<IP>") > 0).as("has_ip_tag"))
        .orderBy("doc_id")
    },
    Some(s"""WITH a AS (
               SELECT doc_id,
                 text || ' contact user' || doc_id || '@example.com from 10.0.'
                   || (doc_id % 256) || '.' || (doc_id % 100) AS planted
               FROM documents),
             sc AS (
               SELECT doc_id,
                 CAST(len(regexp_extract_all(planted, '$EmailRe')) AS BIGINT) AS n_emails,
                 regexp_replace(regexp_replace(planted, '$EmailRe', '<EMAIL>', 'g'),
                   '$Ipv4Re', '<IP>', 'g') AS clean_text
               FROM a)
             SELECT doc_id, n_emails, md5(clean_text) AS clean_fp,
               instr(clean_text, '<EMAIL>') > 0 AS has_email_tag,
               instr(clean_text, '<IP>') > 0 AS has_ip_tag
             FROM sc ORDER BY doc_id"""))

  // Sub-document (line-level) dedup with reassembly — the CCNet/RefinedWeb
  // pass that removes boilerplate lines repeated across pages. The corpus
  // has no newlines, so a "line" is a fixed 8-token span; the first global
  // occurrence of each distinct line (smallest (doc_id, pos)) survives,
  // every later repetition is dropped, and each document is reassembled
  // from its surviving lines in order.
  //
  // Scale shape: the dedup window's exchange carries (line_hash → here the
  // line itself for the oracle, at 100 TB an xxhash64), doc_id, pos — one
  // row per line; the reassembly shuffles each surviving line ONCE to its
  // document's reducer. Documents whose every line was seen earlier drop
  // out entirely (n_kept = 0 rows are absent by construction).
  private val x35 = GQuery(
    "x35_line_dedup", "ext-dedup sub-document",
    (s, dir) => {
      val lines = docs(s, dir)
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(split(text, ' ')), 8), " +
            "i -> array_join(slice(split(text, ' '), i, 8), ' '))")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("line"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("line")).orderBy(col("doc_id"), col("pos"))
      lines
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          md5(array_join(transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), " ")).as("clean_fp"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            lines AS (
              SELECT doc_id, (s - 1) // 8 AS pos, array_to_string(w[s:s+7], ' ') AS line
              FROM t, unnest(range(1, len(w) + 1, 8)) r(s)),
            k AS (
              SELECT doc_id, pos, line,
                row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
              FROM lines)
            SELECT doc_id, COUNT(*) AS n_kept,
              md5(string_agg(line, ' ' ORDER BY pos)) AS clean_fp
            FROM k WHERE rn = 1
            GROUP BY doc_id ORDER BY doc_id"""))

  // Deterministic training shuffle: assign every document a pseudo-random
  // but reproducible (shard, position) — the global corpus shuffle a
  // training run needs WITHOUT a global sort. The shard key is the first
  // hex character of md5(doc_id:seed) (16 shards), and the position is a
  // per-shard rank over the full hash — so the expensive ordering runs as
  // 16 parallel partition-local sorts, never one driver-side permutation.
  // At 1000 executors the shard count rises with the cluster, same plan.
  private val x36 = GQuery(
    "x36_training_shuffle", "ext-text deterministic-shard",
    (s, dir) => {
      val h = md5(concat(col("doc_id"), lit(":42")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), h.as("h"), substring(h, 1, 1).as("shard"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("shard", "pos")
    },
    Some("""WITH h AS (
              SELECT doc_id, md5(doc_id || ':42') AS h,
                substr(md5(doc_id || ':42'), 1, 1) AS shard
              FROM documents)
            SELECT doc_id, shard,
              CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
            FROM h ORDER BY shard, pos"""))

  // Cross-source overlap matrix: how many distinct documents each pair of
  // sources shares — the provenance diagnostic run before choosing mixture
  // weights (a source that is 80% contained in another should not be
  // double-weighted). The fingerprint is the md5 of the first 16 tokens
  // (the "lead shingle" — the cheap near-dup key crawl pipelines use;
  // whole-text md5 would be vacuous here since the fixture corpus has zero
  // verbatim duplicates). Shape: dedup (fingerprint, source) pairs,
  // self-join on fingerprint with source < source ordering, count per pair.
  // Only 16-byte fingerprints shuffle; output is |sources|² small.
  private val x37 = GQuery(
    "x37_source_overlap", "ext-dedup provenance",
    (s, dir) => {
      val fp = docs(s, dir)
        .select(md5(array_join(slice(split(col("text"), " "), 1, 16), " ")).as("fp"),
          col("source")).distinct()
      val a = fp.select(col("fp"), col("source").as("source_a"))
      val b = fp.select(col("fp").as("fp_b"), col("source").as("source_b"))
      a.join(b, col("fp") === col("fp_b") && col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(countDistinct(col("fp")).as("shared_docs"))
        .orderBy("source_a", "source_b")
    },
    Some("""WITH fp AS (SELECT DISTINCT
                md5(array_to_string(string_split(text, ' ')[1:16], ' ')) AS fp, source
              FROM documents)
            SELECT a.source AS source_a, b.source AS source_b,
              COUNT(DISTINCT a.fp) AS shared_docs
            FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  // Vocabulary coverage: what fraction of each language's token stream a
  // top-k global vocabulary covers — the feasibility check before fixing a
  // tokenizer vocab. Two-phase: (1) global token frequencies → top-20 by
  // (count desc, token) — deterministic tie-break; (2) per-language
  // conditional count against the broadcast vocabulary. The token explode
  // shuffles (token, partial count) with map-side combine; the vocabulary
  // is k rows and broadcasts.
  private val x38 = GQuery(
    "x38_vocab_coverage", "ext-text tokenizer-feasibility",
    (s, dir) => {
      val tok = docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(20)
        .select(col("tok").as("vtok"))
      tok.join(broadcast(vocab), col("tok") === col("vtok"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          count(col("vtok")).as("n_covered"))
        .withColumn("coverage",
          col("n_covered").cast("double") / col("n_tokens"))
        .orderBy("lang")
    },
    Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
            vocab AS (
              SELECT tok FROM (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok)
              ORDER BY cnt DESC, tok LIMIT 20)
            SELECT lang, COUNT(*) AS n_tokens,
              CAST(SUM(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
              CAST(SUM(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*) AS coverage
            FROM tok GROUP BY lang ORDER BY lang"""))

  val queries: Seq[GQuery] = Seq(x34, x35, x36, x37, x38)
}
