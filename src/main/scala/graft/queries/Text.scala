package graft.queries

import graft.{GQuery, Tables}
import graft.functions.HashFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — the north-star family:
  * token counting, per-language corpus stats, quality scoring, language-ID
  * heuristics, and document fingerprinting.
  *
  * All of these are single narrow projections or one grouped aggregation —
  * at 100 TB they are scan-bound with full pushdown, no shuffle except the
  * final per-language rollup.
  */
object Text {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  private val tokens = split(col("text"), " ")

  // Whitespace token count per document. Portable formulation (space counting)
  // keeps the oracle exact on consecutive-space edge cases.
  private val x10 = GQuery(
    "x10_token_counts", "ext-text",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), size(tokens).cast("long").as("n_tokens"),
          col("n_chars"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, n_chars
            FROM documents ORDER BY doc_id"""))

  // BPE-ish regex token counting: letter runs / digit runs / single
  // punctuation as separate tokens (the pre-tokenizer split BPE vocabularies
  // assume). Same regex runs in Spark (Java regex) and DuckDB (RE2) — kept
  // to the common dialect subset.
  private val x10b = GQuery(
    "x10b_token_bpe", "ext-text",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          size(expr("""regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"""))
            .cast("long").as("n_bpe_tokens"),
          size(expr("""regexp_extract_all(text, '[0-9]+', 0)""")).cast("long").as("n_numbers"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
              CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
              CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers
            FROM documents ORDER BY doc_id"""))

  // Per-language corpus stats: doc counts, exact char totals, token totals.
  private val x11 = GQuery(
    "x11_text_stats_by_lang", "ext-text",
    (s, dir) =>
      docs(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(size(tokens)).cast("long").as("total_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang"),
    Some("""SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
              COUNT(DISTINCT source) AS n_sources
            FROM documents GROUP BY lang ORDER BY lang"""))

  // Quality scoring: token count, mean token length, stopword ratio, unique
  // ratio → tiered label. Ratios divide exact ints, so doubles match exactly.
  private val x12 = GQuery(
    "x12_quality_score", "ext-text",
    (s, dir) => {
      val nTok = size(tokens).cast("long")
      val nStop = size(expr("filter(split(text, ' '), t -> t IN ('the', 'a'))")).cast("long")
      val nUniq = size(array_distinct(tokens)).cast("long")
      val charsNoSpace = length(regexp_replace(col("text"), " ", "")).cast("long")
      docs(s, dir)
        .select(
          col("doc_id"), nTok.as("n_tokens"),
          (charsNoSpace.cast("double") / nTok).as("avg_token_len"),
          (nStop.cast("double") / nTok).as("stop_ratio"),
          (nUniq.cast("double") / nTok).as("uniq_ratio"))
        .withColumn("quality",
          when(col("n_tokens") >= 50 && col("uniq_ratio") >= 0.5, "good")
            .when(col("n_tokens") >= 20, "ok")
            .otherwise("short"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
              CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS DOUBLE)
                / len(string_split(text, ' ')) AS stop_ratio,
              CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' ')) AS uniq_ratio,
              CASE WHEN len(string_split(text, ' ')) >= 50
                        AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' ')) >= 0.5 THEN 'good'
                   WHEN len(string_split(text, ' ')) >= 20 THEN 'ok'
                   ELSE 'short' END AS quality
            FROM documents ORDER BY doc_id"""))

  // Language-ID heuristic: marker-token voting with a deterministic argmax
  // (a stand-in for n-gram models — the scoring skeleton is the operator).
  private val x13 = GQuery(
    "x13_langid_heuristic", "ext-text",
    (s, dir) => {
      def votes(markers: String) =
        size(expr(s"filter(split(text, ' '), t -> t IN ($markers))")).cast("long")
      val vData = votes("'data', 'row', 'column', 'table'")
      val vQuery = votes("'query', 'filter', 'join', 'sort'")
      val vStream = votes("'stream', 'window', 'batch', 'spark'")
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          vData.as("v_data"), vQuery.as("v_query"), vStream.as("v_stream"))
        .withColumn("lang_guess",
          when(col("v_data") > col("v_query") && col("v_data") > col("v_stream"), "tabular")
            .when(col("v_query") > col("v_data") && col("v_query") > col("v_stream"), "relational")
            .when(col("v_stream") > col("v_data") && col("v_stream") > col("v_query"), "streaming")
            .otherwise("und"))
        .orderBy("doc_id")
    },
    Some("""WITH v AS (
              SELECT doc_id, lang,
                CAST(len(list_filter(string_split(text, ' '), t -> t IN ('data', 'row', 'column', 'table'))) AS BIGINT) AS v_data,
                CAST(len(list_filter(string_split(text, ' '), t -> t IN ('query', 'filter', 'join', 'sort'))) AS BIGINT) AS v_query,
                CAST(len(list_filter(string_split(text, ' '), t -> t IN ('stream', 'window', 'batch', 'spark'))) AS BIGINT) AS v_stream
              FROM documents)
            SELECT doc_id, lang, v_data, v_query, v_stream,
              CASE WHEN v_data > v_query AND v_data > v_stream THEN 'tabular'
                   WHEN v_query > v_data AND v_query > v_stream THEN 'relational'
                   WHEN v_stream > v_data AND v_stream > v_query THEN 'streaming'
                   ELSE 'und' END AS lang_guess
            FROM v ORDER BY doc_id"""))

  // Content-defined fingerprint: md5 of the normalized text. Exactly the
  // dedup-key pattern used at corpus scale (hash once, group by hash).
  private val x14 = GQuery(
    "x14_fingerprint_md5", "ext-text ext-dedup",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
            FROM documents ORDER BY doc_id"""))

  // Order-sensitive rolling-hash fingerprint via the native TokenRollingHash
  // Catalyst expression (no SQL oracle — JVM-specific 64-bit wraparound).
  private val x15 = GQuery(
    "x15_fingerprint_rolling", "ext-text custom-expression",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), HashFunctions.tokenRollingHash(tokens).as("fp"),
          HashFunctions.simhash64(tokens).as("simhash"))
        .orderBy("doc_id"),
    None) // covered by HashExpressionsSpec

  // Corpus token frequency top-50: the boilerplate/contamination-detection
  // staple. One explode + count with map-side partial aggregation, then
  // top-k — at corpus scale the explode shuffles (token, partial_count),
  // never documents.
  private val x18 = GQuery(
    "x18_frequent_tokens", "ext-text topk-agg",
    (s, dir) =>
      docs(s, dir)
        .select(explode(tokens).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50),
    Some("""SELECT t.token, COUNT(*) AS n
            FROM documents d, unnest(string_split(d.text, ' ')) AS t(token)
            GROUP BY t.token ORDER BY n DESC, t.token LIMIT 50"""))

  // Sketch-based frequent tokens — the 100 TB path next to x18's exact
  // groupBy: single-pass Misra-Gries-style candidate set (stat.freqItems)
  // with bounded memory, no full-vocabulary aggregation. Guarantee: every
  // token with frequency above the support threshold IS in the candidate
  // set (false positives possible, no false negatives) — TextSpec pins the
  // exact top tokens all appear.
  private val x20 = GQuery(
    "x20_frequent_tokens_sketch", "ext-text sketch-agg",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select(explode(tokens).as("token"))
        .stat.freqItems(Seq("token"), support = 0.005)
        .select(explode(col("token_freqItems")).as("candidate"))
        .orderBy("candidate")
    },
    None) // sketch candidate set: superset semantics, spec-gated

  // Stratified corpus sampling (stat.sampleBy): the per-language
  // downsampling step a training-data mixer runs — per-stratum Bernoulli
  // with a fixed seed, so the sample is reproducible run to run. Narrow
  // one-pass operator: no shuffle at all, each partition filters locally.
  private val x21 = GQuery(
    "x21_stratified_sample", "ext-text sampling",
    (s, dir) => {
      val fractions = Map("en" -> 0.25, "de" -> 1.0, "es" -> 0.5,
        "fr" -> 0.5, "zh" -> 1.0)
      docs(s, dir)
        .stat.sampleBy("lang", fractions, seed = 42L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    },
    None) // seeded pseudo-random selection: spec-gated (bounds + determinism)

  val queries: Seq[GQuery] = Seq(x10, x10b, x11, x12, x13, x14, x15, x18, x20, x21)
}
