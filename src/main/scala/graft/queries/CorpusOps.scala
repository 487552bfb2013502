package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  // Scale shape — line TEXT crosses exactly ONE exchange (x31's "text
  // moves once" discipline applied at line granularity):
  //   1. the dedup ranking runs over xxhash64(line): its window exchange
  //      carries (hash, doc_id, pos) — 24-byte rows, never line text —
  //      and emits the id-only winner set (doc_id, pos);
  //   2. lines are repartitioned by doc_id ONCE (the single text
  //      movement); HashPartitioning(doc_id) satisfies both the
  //      (doc_id, pos) winner join's clustering (subset of the join keys)
  //      AND the reassembly groupBy(doc_id), so no further exchange
  //      touches a string (PlanSpec pins the count).
  //  The xxhash64 key makes first-occurrence choice collision-exact up to
  //  64-bit hash equality of distinct 8-token spans (~2⁻⁶⁴, the x24/x41
  //  trade); the string-form oracle is unchanged and would hash-mismatch
  //  on any collision. Documents whose every line was seen earlier drop
  //  out entirely (n_kept = 0 rows are absent by construction).
  private val x35 = GQuery(
    "x35_line_dedup", "ext-dedup sub-document",
    (s, dir) => {
      def lines = docs(s, dir)
        // toks hoisted out of the lambda: split() referenced inside a
        // transform re-runs per element — O(tokens²) per doc (Text.scala's
        // wordNgrams scaladoc documents the measured cost)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(1, size(toks), 8), " +
            "i -> array_join(slice(toks, i, 8), ' '))")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("line"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))
      val winners = lines
        .select(col("doc_id"), col("pos"), xxhash64(col("line")).as("h"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("pos"))
      lines.repartition(col("doc_id"))
        .join(winners.repartition(col("doc_id")), Seq("doc_id", "pos"))
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

  /** Deterministic training shuffle: assign every document a pseudo-random
    * but reproducible (shard, position) — the global corpus shuffle a
    * training run needs WITHOUT a global sort. The shard key is the first
    * `shardHexChars` hex characters of md5(doc_id:seed) (16^w shards), and
    * the position is a per-shard rank over the full hash — so the expensive
    * ordering runs as 16^w parallel partition-local sorts, never one
    * driver-side permutation. The width is the scale knob: production sizes
    * shards so each sorts comfortably in one task (w=2 → 256 shards at
    * 1000 executors; w=3 → 4096), same plan at every width —
    * TrainingShuffleSpec pins that the realized shard set matches the
    * parameter exactly.
    */
  def trainingShuffle(d: DataFrame, shardHexChars: Int): DataFrame = {
    require(shardHexChars >= 1 && shardHexChars <= 8,
      s"shardHexChars must be in [1,8]: $shardHexChars")
    val h = md5(concat(col("doc_id"), lit(":42")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    d.select(col("doc_id"), h.as("h"), substring(h, 1, shardHexChars).as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  private val x36 = GQuery(
    "x36_training_shuffle", "ext-text deterministic-shard",
    (s, dir) => trainingShuffle(docs(s, dir), shardHexChars = 2)
      .orderBy("shard", "pos"),
    Some("""WITH h AS (
              SELECT doc_id, md5(doc_id || ':42') AS h,
                substr(md5(doc_id || ':42'), 1, 2) AS shard
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

  // Repeated-passage detection: every 8-token stride-1 window that occurs
  // at least twice anywhere in the corpus (same doc or across docs) — the
  // substring-duplication diagnostic behind "dedup at the passage level,
  // not the document level" (repeated boilerplate passages inflate model
  // memorization even when no two documents are verbatim duplicates).
  // Output per passage: total occurrences, distinct docs, first doc.
  //
  // Scale shape, two-phase: the stride-1 window stream is aggregated on its
  // 64-bit ShingleHashes value — 8 bytes per window through the exchange,
  // no passage strings built — and the >= 2 floor drops the long unique
  // tail (~98% of windows on this corpus) BEFORE any string exists. Only
  // surviving (hash, first_doc, pos) triples rejoin the corpus to slice
  // their passage text out of the first occurrence. The DuckDB oracle
  // groups the exact strings; agreement relies on the same ~2⁻⁶⁴ window-
  // collision bound as x24 (a collision would also merge two passages'
  // counts — the spec-pinned ShingleHashes distinct-count property covers
  // the construction).
  private val x41 = GQuery(
    "x41_passage_dedup", "ext-dedup passage-level",
    (s, dir) => {
      import graft.functions.HashFunctions.shingleHashes
      val d = docs(s, dir)
      val sh = d.select(col("doc_id"),
        posexplode(shingleHashes(split(col("text"), " "), 8)))
      val survivors = sh
        .groupBy(col("col").as("h"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(struct(col("doc_id"), col("pos"))).as("first"))
        .where(col("n_occurrences") >= 2)
        .select(col("h"), col("n_occurrences"), col("n_docs"),
          col("first.doc_id").as("first_doc"), col("first.pos").as("pos"))
      survivors.join(d, col("first_doc") === d("doc_id"))
        .select(
          array_join(slice(split(col("text"), " "), col("pos") + 1, lit(8)), " ")
            .as("passage"),
          col("n_occurrences"), col("n_docs"), col("first_doc"))
        .orderBy("passage")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            sh AS (SELECT doc_id,
                     unnest(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
                       i -> array_to_string(w[i:i+7], ' '))) AS passage
                   FROM w)
            SELECT passage, COUNT(*) AS n_occurrences,
              COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
            FROM sh GROUP BY passage HAVING COUNT(*) >= 2
            ORDER BY passage"""))

  // Deterministic per-stratum subsampling: keep a lang-dependent fraction
  // of documents chosen by a content-independent reproducible coin — the
  // first hex byte of md5(doc_id:lang) compared (inclusively, so 'ff'
  // really is 256/256 = keep-all) against a per-language bound
  // (0x33 → 52/256 ≈ 20% ... 0xff = 100%). The same rows are kept on
  // every run, on any cluster, with no RNG state — the property seeded
  // sampleBy (per-partition RNG) cannot give across repartitionings;
  // x21 adopted this same coin in round 4.
  //
  // Scale shape: a pure narrow filter — no shuffle, no state; the bound
  // table is a 5-row broadcast. Lexicographic compare of lowercase hex IS
  // the numeric compare, so Spark and the oracle agree byte-for-byte.
  private val x42 = GQuery(
    "x42_hash_sample", "ext-text deterministic-sampling",
    (s, dir) => {
      import s.implicits._
      val bounds = Seq(("en", "33"), ("de", "66"), ("es", "99"),
        ("fr", "cc"), ("zh", "ff")).toDF("lang", "bound")
      docs(s, dir)
        .join(broadcast(bounds), "lang")
        .where(substring(md5(concat(col("doc_id"), lit(":"), col("lang"))), 1, 2)
          <= col("bound"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },
    Some("""WITH bounds(lang, bound) AS (VALUES
              ('en', '33'), ('de', '66'), ('es', '99'), ('fr', 'cc'), ('zh', 'ff'))
            SELECT doc_id, d.lang
            FROM documents d JOIN bounds b ON d.lang = b.lang
            WHERE substr(md5(doc_id || ':' || d.lang), 1, 2) <= b.bound
            ORDER BY doc_id"""))

  // MERGE-style upsert: reconcile a stale dimension snapshot against fresh
  // activity — the incremental-ingestion primitive (Delta/Iceberg MERGE
  // INTO) expressed as its underlying plan: full-outer join on the key,
  // then a per-row action verdict. The snapshot is customers with
  // c_custkey % 3 != 0 (a dim that predates one third of the customers);
  // the activity is per-customer order volume since 1999. Matched rows
  // UPDATE (balance += spend), source-only rows INSERT, target-only rows
  // KEEP — all three MERGE branches exercised and counted.
  //
  // Scale shape: one shuffle on the join key for each side (or zero with
  // both sides bucketed on custkey — BucketingSpec's layout); the verdict
  // is a narrow projection. This is exactly how a transactional-table MERGE
  // physically executes; LedgerStore.scala documents the same seam for the
  // pipeline's attempts ledger.
  private val x43 = GQuery(
    "x43_merge_upsert", "ext-pipeline incremental-merge",
    (s, dir) => {
      val dim = Tables(s, dir, "customer")
        .where(pmod(col("c_custkey"), lit(3)) =!= 0)
        .select(col("c_custkey").as("custkey"), col("c_acctbal"), col("c_mktsegment"))
      val src = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("spend"))
      dim.join(src, Seq("custkey"), "full_outer")
        .select(col("custkey"),
          when(col("c_acctbal").isNotNull && col("n_orders").isNotNull, "update")
            .when(col("c_acctbal").isNotNull, "keep")
            .otherwise("insert").as("action"),
          (coalesce(col("c_acctbal"), lit(0.0)) + coalesce(col("spend"), lit(0.0)))
            .as("new_acctbal"),
          coalesce(col("n_orders"), lit(0L)).as("n_new_orders"))
        .orderBy("custkey")
    },
    Some("""WITH dim AS (
              SELECT c_custkey AS custkey, c_acctbal, c_mktsegment
              FROM customer WHERE c_custkey % 3 <> 0),
            src AS (
              SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
                SUM(o_totalprice) AS spend
              FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
              GROUP BY o_custkey)
            SELECT coalesce(d.custkey, s.custkey) AS custkey,
              CASE WHEN d.c_acctbal IS NOT NULL AND s.n_orders IS NOT NULL THEN 'update'
                   WHEN d.c_acctbal IS NOT NULL THEN 'keep'
                   ELSE 'insert' END AS action,
              coalesce(d.c_acctbal, 0.0) + coalesce(s.spend, 0.0) AS new_acctbal,
              coalesce(s.n_orders, 0) AS n_new_orders
            FROM dim d FULL OUTER JOIN src s ON d.custkey = s.custkey
            ORDER BY custkey"""))

  // SCD2 change history: collapse each customer's order stream into
  // validity intervals of constant order status — the
  // slowly-changing-dimension type-2 build (gaps-and-islands, change-log →
  // interval form). A run starts where lag(status) differs; run_id is the
  // cumulative change count; valid_to is the next run's start (NULL for the
  // open current run — SCD2's "current row" marker).
  //
  // Scale shape: two stacked windows over the SAME (custkey, date, key)
  // partitioning — one Exchange + one Sort serve lag, the running sum, and
  // lead (Catalyst collapses same-spec windows); the interval groupBy then
  // reuses the custkey clustering. Bounded to custkey < 100 only to keep
  // the oracle output reviewable.
  private val x44 = GQuery(
    "x44_scd2_history", "ext-pipeline scd2-intervals",
    (s, dir) => {
      val byTime = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val runs = Tables(s, dir, "orders")
        .where(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderstatus"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("chg",
          when(lag(col("o_orderstatus"), 1).over(byTime).isNull ||
            lag(col("o_orderstatus"), 1).over(byTime) =!= col("o_orderstatus"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val intervals = runs.groupBy(col("o_custkey"), col("run_id"))
        .agg(first(col("o_orderstatus")).as("status"),
          min(col("o_orderdate")).as("valid_from"),
          count(lit(1)).as("n_orders"))
      val byRun = Window.partitionBy(col("o_custkey")).orderBy(col("run_id"))
      intervals
        .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
        .select(col("o_custkey").as("custkey"), col("run_id"), col("status"),
          col("valid_from"), col("valid_to"), col("n_orders"))
        .orderBy("custkey", "run_id")
    },
    Some("""WITH o AS (
              SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                CASE WHEN lag(o_orderstatus) OVER w IS NULL
                       OR lag(o_orderstatus) OVER w <> o_orderstatus
                     THEN 1 ELSE 0 END AS chg
              FROM orders WHERE o_custkey < 100
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
            r AS (
              SELECT *, CAST(SUM(chg) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
              FROM o),
            iv AS (
              SELECT o_custkey, run_id,
                MIN(o_orderstatus) AS status,
                MIN(o_orderdate) AS valid_from, COUNT(*) AS n_orders
              FROM r GROUP BY o_custkey, run_id)
            SELECT o_custkey AS custkey, run_id, status, valid_from,
              lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) AS valid_to,
              n_orders
            FROM iv ORDER BY custkey, run_id"""))

  // Policy/blocklist filtering: flag documents containing any term from a
  // (small, broadcast) blocklist, with total hits and distinct matched
  // terms per document — the wordlist-driven safety/policy pass every
  // production corpus runs (the terms here are ordinary fixture vocabulary
  // standing in for a real denylist). Same broadcast-set shape as x24 but
  // keyed on whole tokens, not shingles; at 100 TB the token explode is
  // scan-bound and only the rare matches reach the count shuffle.
  private val x51 = GQuery(
    "x51_blocklist_filter", "ext-text policy-filter",
    (s, dir) => {
      import s.implicits._
      val blocklist = Seq("slow", "broken", "error").toDF("term")
      docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .join(broadcast(blocklist), col("tok") === col("term"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"),
          countDistinct(col("term")).as("n_terms"))
        .orderBy("doc_id")
    },
    Some("""WITH bl(term) AS (VALUES ('slow'), ('broken'), ('error')),
            tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents)
            SELECT doc_id, COUNT(*) AS n_hits,
              COUNT(DISTINCT t.tok) AS n_terms
            FROM tok t JOIN bl ON t.tok = bl.term
            GROUP BY doc_id ORDER BY doc_id"""))

  /** Exact duplicated-substring detection — the suffix-array dedup of
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better") re-expressed as a distributed positional k-gram sweep: a
    * substring of length ≥ k duplicated ANYWHERE in the corpus (across
    * documents or repeated within one) makes every one of its length-k
    * windows duplicated, so the duplicated-gram positions of a document,
    * unioned as intervals, are exactly the characters inside duplicated
    * regions of length ≥ k. Three phases, each a standard shuffle:
    *   1. coverage: explode (doc_id, pos, gram) and count occurrences per
    *      gram with one window — a position is covered iff its gram
    *      appears more than once;
    *   2. interval union: per document, covered positions sorted by pos;
    *      a gap > k starts a new island (positions ≤ k apart have
    *      overlapping-or-adjacent windows, so their union is contiguous);
    *   3. spans: per island, the union covers max(pos) − min(pos) + k
    *      characters — report per-doc span count, duplicated characters,
    *      and longest span.
    *
    * Scale shape: the only wide exchange carries (gram, doc_id, pos) —
    * k bytes + 12, ≈ k× the corpus size for the one shuffle, which is the
    * same order the suffix-array construction itself moves. Production
    * variants shrink it: fingerprint grams to `xxhash64` 8-byte keys
    * (collision odds 2⁻⁶⁴ per pair — then this exact-string form is the
    * verify pass), stride the positions (only every s-th gram, finding
    * spans ≥ k + s), or pre-filter through a Bloom of first-occurrence
    * grams (the BFF layout). The exact form here is the oracle-checkable
    * ground truth those approximations are measured against.
    */
  /** (doc_id, pos, gram): every length-k character window of every doc —
    * the positional feature stream [[substringSpans]] and the incremental
    * probe ([[substringSpansAgainst]]) share, so batch and standing sides
    * always live in the identical gram space.
    */
  private def positionalGrams(d: DataFrame, k: Int): DataFrame =
    d.select(col("doc_id"), col("text"),
        explode(when(length(col("text")) >= k,
          sequence(lit(0), length(col("text")) - k))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        expr(s"substring(text, pos + 1, $k)").as("gram"))

  /** Covered positions → per-doc maximal duplicated intervals
    * (doc_id, s, e) in 0-based INCLUSIVE character coordinates — phase 2
    * of the scaladoc's sweep, shared by the span report and the cleaner.
    */
  private def spanIntervals(covered: DataFrame, k: Int): DataFrame = {
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    covered
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wd) <= k, lit(0)).otherwise(lit(1)))
      .withColumn("island", sum(col("brk")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + k - 1).as("e"))
      .select(col("doc_id"), col("s"), col("e"))
  }

  /** Covered positions → per-doc span report (phases 2–3 of the
    * scaladoc's sweep): interval union per doc, then
    * (n_spans, dup_chars, longest) with zero rows for clean docs.
    */
  private def spanReport(covered: DataFrame, d: DataFrame, k: Int): DataFrame = {
    val agg = spanIntervals(covered, k)
      .select(col("doc_id"), (col("e") - col("s") + 1).cast("long").as("span_len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("dup_chars"),
        max(col("span_len")).as("longest"))
    d.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        coalesce(col("longest"), lit(0L)).as("longest"))
      .orderBy("doc_id")
  }

  def substringSpans(d: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"gram length must be >= 2: $k")
    val covered = positionalGrams(d, k)
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .where(col("occ") > 1)
      .select(col("doc_id"), col("pos"))
    spanReport(covered, d, k)
  }

  /** The PRODUCTION form of [[substringSpans]] — the fingerprint variant
    * its scaladoc names: grams are hashed to 8-byte `xxhash64` keys in
    * the narrow projection, so the sweep's one wide exchange carries
    * (fp, doc_id, pos) = 20 bytes/window instead of (gram, doc_id, pos)
    * = k+12 — at k = 20 a 1.6× shrink, at the k = 50 production setting
    * 3×, independent of corpus size. Collision odds are 2⁻⁶⁴ per gram
    * pair (a false duplicated window, which the interval union would
    * absorb unless it lands > k from a real span); the exact-string form
    * stays the verify tier. On collision-free data the report is
    * IDENTICAL to the exact form — so the registry entry reuses x79's
    * DuckDB oracle verbatim, putting a hash-green row on the scale path
    * itself, and HashedSubstringSpec pins row-identity plus a
    * no-string-in-exchange plan check.
    */
  def substringSpansHashed(d: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"gram length must be >= 2: $k")
    val covered = positionalGrams(d, k)
      .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("fp"))
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .where(col("occ") > 1)
      .select(col("doc_id"), col("pos"))
    spanReport(covered, d, k)
  }

  /** Persist the standing corpus's DISTINCT gram set — the serving
    * artifact of incremental substring dedup. Stored as the exact
    * strings (k bytes each) for oracle parity; production shrinks the
    * artifact with xxhash64 fingerprints (8 bytes, 2⁻⁶⁴ per-pair
    * collisions) or a Bloom filter (~10 bits/gram, the BFF layout) and
    * keeps this exact form as the verify tier.
    */
  def writeGramIndex(standing: DataFrame, k: Int, outDir: String): Unit =
    positionalGrams(standing, k).select(col("gram")).distinct()
      .write.mode("overwrite").parquet(s"$outDir/grams")

  /** Incremental form of [[substringSpans]] — the ingest-cycle shape
    * (x32/x52/x64's discipline applied to substrings): a batch position
    * is covered iff its gram exists in the STORED standing index, so
    * each cycle pays gram extraction for the BATCH only and the standing
    * corpus text is never rescanned. One semi join on the gram key is
    * the only wide exchange; the span union runs on batch positions.
    */
  def substringSpansAgainst(batch: DataFrame, k: Int,
      s: SparkSession, indexDir: String): DataFrame = {
    require(k >= 2, s"gram length must be >= 2: $k")
    val standing = s.read.parquet(s"$indexDir/grams")
    val covered = positionalGrams(batch, k)
      .join(standing, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("pos"))
    spanReport(covered, batch, k)
  }

  /** Temperature-weighted mixture sampling to a token budget — the
    * source-mixing step of a pretraining data pipeline (the Pile / LLaMA
    * recipe): small sources are UPWEIGHTED relative to large ones by
    * `(T_max / T_s)^α` (α = 0.5 here — sqrt temperature), scaled by the
    * budget knob, capped at keep-everything, and realized as DETERMINISTIC
    * hash sampling (md5 threshold per doc — x42's reproducible-sample
    * primitive, so reruns and the DuckDB oracle pick the identical
    * sample).
    *
    * Numeric discipline for cross-engine determinism: the rate is built
    * ONLY from exact integers (source token totals), one division, one
    * `sqrt` (IEEE correctly rounded — identical everywhere; `pow`'s
    * libm variance is exactly why α is fixed at 0.5), and one literal
    * multiply; the threshold compare happens in STRING space (lowercase
    * hex vs printf('%08x') bound — lexicographic = numeric for equal
    * width), so no engine ever parses hex or rounds a float differently.
    *
    * Scale shape: one narrow token-count projection, a 5-row source-stats
    * aggregate broadcast back (the q11 scalar-crossJoin move), and the
    * keep decision is a per-row md5 — scan-bound, no data-sized shuffle;
    * the kept-stats report aggregates by source.
    */
  def temperatureSample(d: DataFrame, scale: Double, seed: String): DataFrame = {
    val toks = d.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val stats = toks.groupBy("source")
      .agg(sum("n_tok").as("tot"), count(lit(1)).as("n_docs"))
    val tmax = stats.agg(max(col("tot")).as("tmax"))
    val rates = stats.crossJoin(broadcast(tmax))
      .withColumn("rate",
        least(lit(1.0),
          sqrt(col("tmax").cast("double") / col("tot").cast("double")) * lit(scale)))
      .withColumn("bound", format_string("%08x",
        least(floor(col("rate") * lit(4294967296.0)).cast("long"),
          lit(4294967295L))))
    val kept = toks
      .join(broadcast(rates.select(col("source"), col("bound"))), "source")
      .where(substring(md5(concat(col("doc_id"), lit(s":$seed"))), 1, 8)
        <= col("bound"))
      .groupBy("source")
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tok")).as("kept_tokens"))
    rates.select(col("source"), col("n_docs"), col("tot").as("total_tokens"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("total_tokens"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  private val x82 = GQuery(
    "x82_mixture_sample", "ext-text mixture-sampling deterministic-sampling",
    (s, dir) => temperatureSample(docs(s, dir), scale = 0.5, seed = "mix"),
    Some("""WITH toks AS (
              SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
            stats AS (
              SELECT source, CAST(sum(n_tok) AS BIGINT) AS tot,
                count(*) AS n_docs
              FROM toks GROUP BY source),
            mx AS (SELECT max(tot) AS tmax FROM stats),
            rates AS (
              SELECT source, tot, n_docs,
                printf('%08x', least(CAST(floor(least(1.0,
                  sqrt(CAST(tmax AS DOUBLE) / CAST(tot AS DOUBLE)) * 0.5)
                  * 4294967296.0) AS BIGINT), 4294967295)) AS bound
              FROM stats, mx),
            kept AS (
              SELECT t.source, count(*) AS kept_docs,
                CAST(sum(t.n_tok) AS BIGINT) AS kept_tokens
              FROM toks t JOIN rates r ON t.source = r.source
              WHERE substr(md5(t.doc_id || ':mix'), 1, 8) <= r.bound
              GROUP BY t.source)
            SELECT r.source, r.n_docs, r.tot AS total_tokens,
              coalesce(k.kept_docs, 0) AS kept_docs,
              coalesce(k.kept_tokens, 0) AS kept_tokens
            FROM rates r LEFT JOIN kept k ON r.source = k.source
            ORDER BY r.source"""))

  // One span-report oracle, shared by the exact form (x79) and the
  // hashed-fingerprint form (x90): on collision-free data the two
  // constructions are value-identical by design, and 2^-64 per-pair
  // collision odds make the shared oracle a real gate on both.
  private val spanOracle = """WITH grams AS (
              SELECT doc_id, r.pos, substr(text, r.pos + 1, 20) AS gram
              FROM documents,
                unnest(range(0, greatest(length(text) - 19, 0))) r(pos)),
            cov AS (
              SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS occ
              FROM grams),
            isl AS (
              SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
                  THEN 0 ELSE 1 END AS brk
              FROM cov WHERE occ > 1),
            grp AS (
              SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS UNBOUNDED PRECEDING) AS island
              FROM isl),
            spans AS (
              SELECT doc_id, island,
                CAST(max(pos) - min(pos) + 20 AS BIGINT) AS span_len
              FROM grp GROUP BY doc_id, island),
            agg AS (
              SELECT doc_id, count(*) AS n_spans,
                CAST(sum(span_len) AS BIGINT) AS dup_chars,
                CAST(max(span_len) AS BIGINT) AS longest
              FROM spans GROUP BY doc_id)
            SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
              coalesce(dup_chars, 0) AS dup_chars, coalesce(longest, 0) AS longest
            FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""

  private val x79 = GQuery(
    "x79_substring_dedup", "ext-dedup exact-substring",
    (s, dir) => substringSpans(docs(s, dir), k = 20),
    Some(spanOracle))

  // The same sweep through 8-byte fingerprints — the exchange carries
  // hashes, never gram strings (HashedSubstringSpec pins the plan), and
  // the SAME oracle hash-verifies the output: the scale path earns its
  // own green row instead of inheriting the exact form's by argument.
  private val x90 = GQuery(
    "x90_substring_dedup_hashed", "ext-dedup exact-substring fingerprint",
    (s, dir) => substringSpansHashed(docs(s, dir), k = 20),
    Some(spanOracle))

  // Incremental substring dedup — x79 against a STORED gram index: the
  // standing slice (doc_id % 4 != 0) persists its distinct gram set once;
  // every batch (doc_id % 4 == 0) reports the spans of its text that
  // already exist verbatim in the standing corpus. Unlike x79 this also
  // catches spans duplicated ONLY across the standing/batch boundary and
  // ignores batch-internal repeats — exactly the ingest-cycle question
  // ("what of this new data is already in my corpus?"). Oracle mirrors
  // the split and the semi join on exact gram strings.
  /** The APPLY side of substring dedup — Lee et al. 2021's actual
    * treatment: CUT every duplicated span out of the text (all
    * occurrences; their ExactSubstr removes each copy) and return the
    * cleaned corpus with integrity stats. Surgery is pure interval
    * arithmetic shared with [[substringSpans]]: per doc, the kept pieces
    * are the gaps between sorted spans plus the tail, reassembled in
    * order — one window pass and one grouped concat; the fingerprints
    * (`clean_fp` = md5 of the cleaned text, x35's discipline) make the
    * result oracle-checkable without shipping the text twice.
    */
  def substringClean(d: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"gram length must be >= 2: $k")
    val covered = positionalGrams(d, k)
      .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .where(col("occ") > 1)
      .select(col("doc_id"), col("pos"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val pieces = spanIntervals(covered, k)
      .withColumn("pe", coalesce(lag(col("e"), 1).over(wd), lit(-1)))
      .join(d.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("s"), col("e"),
        expr("substring(text, pe + 2, s - pe - 1)").as("kept"))
    val cut = pieces
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("s"), col("kept")))),
          x => x.getField("kept")), "").as("head_parts"),
        max(col("e")).as("last_e"),
        count(lit(1)).as("n_cut"))
    d.select(col("doc_id"), col("text"))
      .join(cut, Seq("doc_id"), "left")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("orig_len"),
        when(col("last_e").isNull, col("text"))
          .otherwise(concat(col("head_parts"),
            expr("substring(text, last_e + 2)"))).as("cleaned"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"))
      .select(col("doc_id"), col("orig_len"),
        length(col("cleaned")).cast("long").as("clean_len"),
        col("n_cut"), md5(col("cleaned")).as("clean_fp"))
      .orderBy("doc_id")
  }

  private val x87 = GQuery(
    "x87_substring_clean", "ext-dedup exact-substring corpus-clean",
    (s, dir) => substringClean(docs(s, dir), k = 20),
    Some("""WITH grams AS (
              SELECT doc_id, r.pos, substr(text, r.pos + 1, 20) AS gram
              FROM documents,
                unnest(range(0, greatest(length(text) - 19, 0))) r(pos)),
            cov AS (
              SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS occ
              FROM grams),
            isl AS (
              SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
                  THEN 0 ELSE 1 END AS brk
              FROM cov WHERE occ > 1),
            grp AS (
              SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS UNBOUNDED PRECEDING) AS island
              FROM isl),
            spans AS (
              SELECT doc_id, island, min(pos) AS s, max(pos) + 19 AS e
              FROM grp GROUP BY doc_id, island),
            pieces AS (
              SELECT sp.doc_id, sp.s, sp.e,
                coalesce(lag(sp.e) OVER (PARTITION BY sp.doc_id ORDER BY sp.s), -1) AS pe
              FROM spans sp),
            kept AS (
              SELECT p.doc_id, p.s, p.e,
                substr(d.text, p.pe + 2, p.s - p.pe - 1) AS kept
              FROM pieces p JOIN documents d USING (doc_id)),
            cut AS (
              SELECT doc_id,
                string_agg(kept, '' ORDER BY s) AS head_parts,
                max(e) AS last_e, count(*) AS n_cut
              FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(length(d.text) AS BIGINT) AS orig_len,
              CAST(length(CASE WHEN c.doc_id IS NULL THEN d.text
                ELSE c.head_parts || substr(d.text, c.last_e + 2) END) AS BIGINT)
                AS clean_len,
              coalesce(c.n_cut, 0) AS n_cut,
              md5(CASE WHEN c.doc_id IS NULL THEN d.text
                ELSE c.head_parts || substr(d.text, c.last_e + 2) END) AS clean_fp
            FROM documents d LEFT JOIN cut c USING (doc_id)
            ORDER BY d.doc_id"""))

  private val x84 = GQuery(
    "x84_substring_dedup_incremental",
    "ext-dedup exact-substring incremental-index stored-artifact",
    (s, dir) => {
      val d = docs(s, dir)
      val store = graft.StoredArtifacts.dir(dir, "gram_index_v1")
      if (!graft.StoredArtifacts.ready(s"$store/grams"))
        writeGramIndex(d.where(pmod(col("doc_id"), lit(4)) =!= 0), k = 20, store)
      substringSpansAgainst(d.where(pmod(col("doc_id"), lit(4)) === 0),
        k = 20, s, store)
    },
    Some("""WITH sta AS (SELECT * FROM documents WHERE doc_id % 4 <> 0),
            bat AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
            sg AS (
              SELECT DISTINCT substr(text, r.pos + 1, 20) AS gram
              FROM sta,
                unnest(range(0, greatest(length(text) - 19, 0))) r(pos)),
            bg AS (
              SELECT doc_id, r.pos, substr(text, r.pos + 1, 20) AS gram
              FROM bat,
                unnest(range(0, greatest(length(text) - 19, 0))) r(pos)),
            cov AS (
              SELECT bg.doc_id, bg.pos FROM bg JOIN sg USING (gram)),
            isl AS (
              SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20
                  THEN 0 ELSE 1 END AS brk
              FROM cov),
            grp AS (
              SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS UNBOUNDED PRECEDING) AS island
              FROM isl),
            spans AS (
              SELECT doc_id, island,
                CAST(max(pos) - min(pos) + 20 AS BIGINT) AS span_len
              FROM grp GROUP BY doc_id, island),
            agg AS (
              SELECT doc_id, count(*) AS n_spans,
                CAST(sum(span_len) AS BIGINT) AS dup_chars,
                CAST(max(span_len) AS BIGINT) AS longest
              FROM spans GROUP BY doc_id)
            SELECT b.doc_id, coalesce(n_spans, 0) AS n_spans,
              coalesce(dup_chars, 0) AS dup_chars, coalesce(longest, 0) AS longest
            FROM bat b LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""))

  /** Source token-budget cap — the domain-quota curation op (C4 caps
    * per-domain pages, Gopher caps source shares): within each source,
    * keep documents in priority order (longest first, id tie-break)
    * while the cumulative token count BEFORE the doc is under the
    * budget — so every source gets at least its top doc, and no source
    * exceeds budget + one doc (the standard greedy form; exact knapsack
    * is NP-hard and order-unstable). All-integer arithmetic: one window
    * cumsum per source, the keep decision hash-verifies in DuckDB.
    *
    * Scale shape: one shuffle on `source` for the window (source
    * cardinality is the parallelism floor — salt the window by
    * hash-bucket within giant sources if one source dominates, then
    * re-cap across buckets with a second tiny pass over bucket
    * subtotals); text never moves, only (doc_id, source, n_tokens).
    */
  def sourceTokenCap(d: DataFrame, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val ws = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
    d.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum_tokens") - col("n_tokens") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
      .orderBy("source", "cum_tokens")
  }

  private val x93 = GQuery(
    "x93_source_token_cap", "ext-text curation source-quota",
    (s, dir) => sourceTokenCap(docs(s, dir), budget = 800L),
    Some("""WITH t AS (
              SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents),
            c AS (
              SELECT doc_id, source, n_tokens,
                CAST(SUM(n_tokens) OVER (PARTITION BY source
                  ORDER BY n_tokens DESC, doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
              FROM t)
            SELECT doc_id, source, n_tokens, cum_tokens
            FROM c WHERE cum_tokens - n_tokens < 800
            ORDER BY source, cum_tokens"""))

  /** EXACT stratified train/val/test split: within every source, docs
    * are ordered by a deterministic md5 shuffle key and the first
    * ⌈0.8·n⌉ go to train, the next up to ⌈0.9·n⌉ to val, the rest to
    * test — per-source proportions hold EXACTLY (±1 doc), unlike
    * threshold sampling (x42's discipline), which only holds them in
    * expectation. Rank-vs-quota comparison is pure integer arithmetic
    * (⌈p·n⌉ as `(p_num·n + p_den − 1) div p_den`), and the md5 key is
    * engine-identical, so the whole assignment hash-verifies.
    *
    * Scale shape: one shuffle on `source` for the rank window plus a
    * broadcast-sized per-source count; at a trillion docs the window is
    * the same cumsum every engine runs for ntile — salt giant sources
    * exactly as [[sourceTokenCap]] notes.
    */
  def stratifiedSplit(d: DataFrame): DataFrame = {
    val ws = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    d.select(col("doc_id"), col("source"),
        md5(concat(col("doc_id").cast("string"), lit(":split"))).as("h"))
      .withColumn("rk", row_number().over(ws).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .select(col("doc_id"), col("source"),
        // integer `div`, never float division: quotas must be exact
        when(col("rk") <= expr("(n * 4 + 4) div 5"), "train")
          .when(col("rk") <= expr("(n * 9 + 9) div 10"), "val")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  private val x94 = GQuery(
    "x94_stratified_split", "ext-text curation deterministic-split",
    (s, dir) => stratifiedSplit(docs(s, dir)),
    Some("""WITH h AS (
              SELECT doc_id, source,
                md5(CAST(doc_id AS VARCHAR) || ':split') AS h
              FROM documents),
            r AS (
              SELECT doc_id, source,
                CAST(ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY h, doc_id) AS BIGINT) AS rk,
                COUNT(*) OVER (PARTITION BY source) AS n
              FROM h)
            SELECT doc_id, source,
              CASE WHEN rk <= (n * 4 + 4) // 5 THEN 'train'
                   WHEN rk <= (n * 9 + 9) // 10 THEN 'val'
                   ELSE 'test' END AS split
            FROM r ORDER BY doc_id"""))

  /** Lexical-diversity score in thousandths — distinct-token ratio, the
    * cheap repetitiveness proxy quality pipelines threshold on (a spammy
    * page repeating one phrase scores low, varied prose scores high).
    * Pure integer arithmetic (`1000·distinct div total`) so the score —
    * and everything calibrated from it — is bit-identical cross-engine.
    */
  private val diversityMilli =
    expr("(1000L * size(array_distinct(split(text, ' ')))) div " +
      "greatest(size(split(text, ' ')), 1)")

  /** Epoch-based source upsampling — the mixture REALIZATION step (the
    * LLaMA / Pile recipe publishes per-source epoch counts like wiki 2.45:
    * each source's documents repeat ⌊e⌋ times, plus one more with
    * probability frac(e)). The config arrives as a small table
    * `(source, base, frac256)` with the fractional part in 256ths —
    * exact binary fractions, so the md5-coin bound `frac256 · 2³²⁄₂₅₆`
    * is integer arithmetic and the whole realized multiset
    * hash-verifies in DuckDB (x42/x82's deterministic-sampling
    * discipline). OUTPUT is the realized stream: one row per (doc, rep).
    *
    * Scale shape: config is broadcast (sources are dozens), the coin is
    * a per-row md5, and the replication is a narrow `explode` — no
    * shuffle at all; the expansion factor is the mixture's own epoch
    * mass, which is the size of the training stream by definition.
    */
  def epochUpsample(d: DataFrame, cfg: DataFrame, seed: String): DataFrame = {
    val bound = format_string("%08x", col("frac256").cast("long") * lit(16777216L))
    d.join(broadcast(cfg), "source")
      .withColumn("extra",
        when(substring(md5(concat(col("doc_id"), lit(s":$seed"))), 1, 8)
          < bound, 1).otherwise(0))
      .withColumn("n_copies", (col("base") + col("extra")).cast("long"))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(0L), col("n_copies") - 1)).as("rep"))
      .orderBy("doc_id", "rep")
  }

  // The registry's mixture config: derived deterministically from the
  // source index (sources are `srcN` in the fixtures) so both engines
  // build the identical table — base ∈ {1,2,3}, fraction in 256ths.
  private def srcEpochCfg(d: DataFrame): DataFrame =
    d.select(col("source")).distinct()
      .withColumn("m", expr("(97 * CAST(substring(source, 4, 8) AS INT) + 13) % 768"))
      .select(col("source"), expr("1 + (m div 256)").as("base"),
        expr("m % 256").as("frac256"))

  private val x96 = GQuery(
    "x96_epoch_upsample", "ext-text mixture-sampling epoch-upsample",
    (s, dir) => epochUpsample(docs(s, dir), srcEpochCfg(docs(s, dir)), "up"),
    Some("""WITH cfg AS (
              SELECT source, 1 + (m // 256) AS base, m % 256 AS frac256
              FROM (SELECT source,
                      (97 * CAST(substr(source, 4) AS INT) + 13) % 768 AS m
                    FROM (SELECT DISTINCT source FROM documents))),
            j AS (
              SELECT d.doc_id, d.source,
                CAST(base + CASE WHEN substr(md5(d.doc_id || ':up'), 1, 8)
                  < printf('%08x', CAST(frac256 AS BIGINT) * 16777216)
                  THEN 1 ELSE 0 END AS BIGINT) AS n_copies
              FROM documents d JOIN cfg USING (source))
            SELECT doc_id, source, n_copies, CAST(r.rep AS BIGINT) AS rep
            FROM j, unnest(range(0, n_copies)) r(rep)
            ORDER BY doc_id, rep"""))

  /** Quality-threshold calibration — given a target keep rate, find the
    * per-language score cut that realizes it EXACTLY: order by
    * (score DESC, doc_id), keep rank ≤ ⌈p·n⌉, report the boundary score.
    * This is how production filters are tuned (pick the keep budget
    * first, read the threshold off the distribution — not the other way
    * around); the rank-based form dodges percentile-interpolation
    * differences between engines entirely, so the calibration
    * hash-verifies. Keep rate is a rational `keepNum/keepDen`, quota
    * `⌈p·n⌉ = (num·n + den − 1) div den` — integer, never float.
    *
    * Scale shape: one narrow (lang, doc_id, score) projection, one
    * shuffle on `lang` for the rank window (salt giant languages as
    * [[sourceTokenCap]] notes), and a languages-sized output.
    */
  def calibrateQuality(d: DataFrame, keepNum: Int, keepDen: Int): DataFrame = {
    require(keepNum >= 1 && keepNum <= keepDen,
      s"keep rate must be in (0,1]: $keepNum/$keepDen")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id"))
    d.select(col("lang"), col("doc_id"), diversityMilli.as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .where(col("rnk") <= expr(s"($keepNum * n + ${keepDen - 1}) div $keepDen"))
      .groupBy("lang")
      .agg(max(col("n")).as("n_docs"), count(lit(1)).as("n_keep"),
        min(col("score")).as("threshold_milli"),
        sum(col("score")).as("kept_score_sum"))
      .orderBy("lang")
  }

  private val x97 = GQuery(
    "x97_quality_calibrate", "ext-text quality-threshold calibration",
    (s, dir) => calibrateQuality(docs(s, dir), keepNum = 3, keepDen = 5),
    Some("""WITH s AS (
              SELECT lang, doc_id,
                (1000 * len(list_distinct(string_split(text, ' ')))) //
                  greatest(len(string_split(text, ' ')), 1) AS score
              FROM documents),
            r AS (
              SELECT lang, doc_id, score,
                CAST(row_number() OVER (PARTITION BY lang
                  ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
                count(*) OVER (PARTITION BY lang) AS n
              FROM s)
            SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
              count(*) AS n_keep, CAST(min(score) AS BIGINT) AS threshold_milli,
              CAST(sum(score) AS BIGINT) AS kept_score_sum
            FROM r WHERE rnk <= (3 * n + 4) // 5
            GROUP BY lang ORDER BY lang"""))

  /** Curriculum ordering — assign every document a training stage
    * (0..stages−1) by global quality rank (repetitive text first, varied
    * prose last — the easy→hard curriculum schedule), plus its position
    * within the stage. The global rank is NOT a global window: the score
    * domain is bounded (thousandths, ≤1001 values), so rank = broadcast
    * cumulative histogram offset + a per-score-partition row_number —
    * x33's chunked-carry trick, every partition sorts in parallel and
    * the histogram is domain-sized, never data-sized. Stage and position
    * are then pure integer arithmetic on the rank, so the whole
    * assignment hash-verifies against a plain-window oracle.
    */
  def curriculumOrder(d: DataFrame, stages: Int): DataFrame = {
    require(stages >= 1, s"stages must be >= 1: $stages")
    val scored = d.select(col("doc_id"), diversityMilli.as("score"))
    // domain-sized (≤1001 rows) cumulative histogram; the single-partition
    // window is over the histogram, not the data
    val cum = scored.groupBy("score").agg(count(lit(1)).as("c"))
      .withColumn("before",
        sum(col("c")).over(Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("c"))
      .select(col("score"), col("before"))
    val total = scored.agg(count(lit(1)).as("n"))
    val wScore = Window.partitionBy(col("score")).orderBy(col("doc_id"))
    scored.join(broadcast(cum), "score")
      .withColumn("rnk", col("before") + row_number().over(wScore))
      .crossJoin(broadcast(total))
      .withColumn("stage", expr(s"((rnk - 1) * $stages) div n"))
      .withColumn("pos", expr(s"rnk - ((stage * n + ${stages - 1}) div $stages)"))
      .select(col("doc_id"), col("score").cast("long").as("score"),
        col("stage"), col("pos"))
      .orderBy("doc_id")
  }

  private val x98 = GQuery(
    "x98_curriculum_order", "ext-text curriculum-ordering",
    (s, dir) => curriculumOrder(docs(s, dir), stages = 8),
    Some("""WITH s AS (
              SELECT doc_id,
                (1000 * len(list_distinct(string_split(text, ' ')))) //
                  greatest(len(string_split(text, ' ')), 1) AS score
              FROM documents),
            r AS (
              SELECT doc_id, score,
                CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT) AS rnk,
                count(*) OVER () AS n
              FROM s),
            t AS (
              SELECT doc_id, score, rnk, n,
                ((rnk - 1) * 8) // n AS stage
              FROM r)
            SELECT doc_id, CAST(score AS BIGINT) AS score,
              CAST(stage AS BIGINT) AS stage,
              CAST(rnk - ((stage * n + 7) // 8) AS BIGINT) AS pos
            FROM t ORDER BY doc_id"""))

  /** Corpus-health report — the per-source scorecard a curation team reads
    * before every training run (and the summary row of the reference's
    * monitoring dashboards, applied to corpus content): doc counts, exact
    * duplicate rate, language spread, token volume, and mean quality, one
    * row per source. Duplicate detection fingerprints with md5 (the x14
    * principle — text never shuffles; the distinct runs over 16-byte
    * digests), quality is the integer lexical-diversity score, and the two
    * rates are integer thousandths so every cell hash-verifies.
    *
    * Scale shape: one narrow projection (source, lang, fingerprint, two
    * numbers), one groupBy(source) with exact count-distincts — Spark
    * expands those into a sources×fingerprints expand-aggregate, which is
    * the standard exact form; at 100 TB swap `approx_count_distinct` for
    * the expand if ±2 % is tolerable (the c21 trade, noted not taken:
    * exactness is what makes this row auditable).
    */
  def corpusHealth(d: DataFrame): DataFrame =
    d.select(col("source"), col("lang"), md5(col("text")).as("fp"),
        diversityMilli.as("q"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("q")).as("q_sum"))
      .select(col("source"), col("n_docs"), col("n_unique"), col("n_langs"),
        col("total_tokens"),
        expr("(1000 * (n_docs - n_unique)) div n_docs").as("dup_rate_milli"),
        expr("q_sum div n_docs").as("mean_q_milli"))
      .orderBy("source")

  private val x104 = GQuery(
    "x104_corpus_health", "ext-text data-quality report-composite",
    (s, dir) => corpusHealth(docs(s, dir)),
    Some("""WITH d AS (
              SELECT source, lang, md5(text) AS fp,
                (1000 * len(list_distinct(string_split(text, ' ')))) //
                  greatest(len(string_split(text, ' ')), 1) AS q,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents)
            SELECT source, COUNT(*) AS n_docs,
              COUNT(DISTINCT fp) AS n_unique,
              COUNT(DISTINCT lang) AS n_langs,
              CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
              (1000 * (COUNT(*) - COUNT(DISTINCT fp))) // COUNT(*)
                AS dup_rate_milli,
              CAST(SUM(q) AS BIGINT) // COUNT(*) AS mean_q_milli
            FROM d GROUP BY source ORDER BY source"""))

  /** Document-length histogram — the first chart of every corpus audit:
    * fixed power-of-two char-length bands × language, with counts and
    * total characters per cell. Bands are CASE ranges (integer compares,
    * identical in any engine), not float log2 — a power-of-two boundary
    * must land in the same band everywhere or the audit diffs across
    * engines.
    *
    * Scale shape: one narrow scan into a bands×langs cell grid, map-side
    * partial; the scan reads (lang, n_chars) only (column pruning — text
    * never loads).
    */
  def lengthHistogram(d: DataFrame): DataFrame = {
    val band = when(col("n_chars") < 128, "a_lt128")
      .when(col("n_chars") < 256, "b_128_255")
      .when(col("n_chars") < 512, "c_256_511")
      .when(col("n_chars") < 1024, "d_512_1023")
      .when(col("n_chars") < 2048, "e_1024_2047")
      .otherwise("f_ge2048")
    d.select(col("lang"), band.as("band"), col("n_chars"))
      .groupBy(col("lang"), col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("lang", "band")
  }

  private val x119 = GQuery(
    "x119_length_histogram", "ext-docs corpus-audit histogram",
    (s, dir) => lengthHistogram(docs(s, dir)),
    Some("""SELECT lang,
              CASE WHEN n_chars < 128 THEN 'a_lt128'
                   WHEN n_chars < 256 THEN 'b_128_255'
                   WHEN n_chars < 512 THEN 'c_256_511'
                   WHEN n_chars < 1024 THEN 'd_512_1023'
                   WHEN n_chars < 2048 THEN 'e_1024_2047'
                   ELSE 'f_ge2048' END AS band,
              COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Type-token ratio per document — the lexical-diversity quality signal
    * (low TTR = repetitive boilerplate, a strong SEO-spam marker) that
    * sits next to x12's heuristics in every quality stack. Integer
    * thousandths so the score is engine-exact.
    *
    * Scale shape: narrow per-row array ops (split / array_distinct /
    * size) — scan-bound, no exchange at all before the output sort.
    */
  def typeTokenRatio(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("n_types"))
      .withColumn("ttr_milli", expr("(1000 * n_types) div n_tokens"))
      .orderBy("doc_id")

  private val x120 = GQuery(
    "x120_type_token_ratio", "ext-docs quality-signal lexical-diversity",
    (s, dir) => typeTokenRatio(docs(s, dir)),
    Some("""SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
              (1000 * len(list_distinct(string_split(text, ' '))))
                // len(string_split(text, ' ')) AS ttr_milli
            FROM documents ORDER BY doc_id"""))

  /** Per-language character-trigram profile — the raw feature table under
    * x11's n-gram language ID: the top-10 char trigrams per language by
    * exact count ((count desc, trigram asc) tie-break). Training data for
    * the identifier AND the drift check against it ("did lang=fr's
    * trigram profile move").
    *
    * Scale shape: the explode is len-per-doc rows of 3-char strings with
    * map-side combine into a langs×trigram-vocab grid; top-10 per lang
    * via one rank window over the GRID (never the raw explode).
    */
  def charTrigramProfile(d: DataFrame): DataFrame = {
    // kernel fan-out (round 15, Par scaladoc): ~600 substring allocs per
    // document ran on the scan's 1-4 byte-sized splits
    val grid = Par.fanOutScan(d, "doc_id")
      .select(col("lang"), explode(expr(
        "transform(sequence(1, greatest(length(text) - 2, 0)), " +
          "i -> substring(text, i, 3))")).as("tri"))
      .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("tri"))
    grid.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 10)
      .select(col("lang"), col("rnk"), col("tri"), col("n"))
      .orderBy("lang", "rnk")
  }

  private val x121 = GQuery(
    "x121_char_trigram_profile", "ext-docs language-id feature-table",
    (s, dir) => charTrigramProfile(docs(s, dir)),
    Some("""WITH g AS (
              SELECT lang, substr(text, i, 3) AS tri
              FROM documents,
                unnest(range(1, greatest(len(text) - 2, 0) + 1)) r(i)),
            c AS (SELECT lang, tri, COUNT(*) AS n FROM g GROUP BY 1, 2),
            rk AS (SELECT lang, tri, n,
                     CAST(ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n DESC, tri) AS BIGINT) AS rnk
                   FROM c)
            SELECT lang, rnk, tri, n FROM rk WHERE rnk <= 10
            ORDER BY lang, rnk"""))

  /** Exact-duplicate cluster-size histogram — the dedup REPORT: how many
    * clusters of k byte-identical documents exist, and how many documents
    * (and removable excess copies) they hold. x01 decides what to drop;
    * this is the table a data lead reads to see WHY the corpus shrank.
    *
    * Scale shape: text is hashed in the scan projection (md5 — the
    * fingerprint exchange discipline of the dedup family); two
    * cluster-then-histogram rollups, each map-side partial.
    */
  def dupClusterHistogram(d: DataFrame): DataFrame =
    d.select(md5(col("text")).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("k") * col("n_clusters"))
      .withColumn("n_excess", (col("k") - 1) * col("n_clusters"))
      .orderBy("k")

  private val x122 = GQuery(
    "x122_dup_cluster_histogram", "ext-docs dedup-report histogram",
    (s, dir) => dupClusterHistogram(docs(s, dir)),
    Some("""WITH c AS (SELECT md5(text) AS fp, COUNT(*) AS k
                       FROM documents GROUP BY fp)
            SELECT k, COUNT(*) AS n_clusters,
              k * COUNT(*) AS n_docs,
              (k - 1) * COUNT(*) AS n_excess
            FROM c GROUP BY k ORDER BY k"""))

  // Weighted sampling without replacement, per stratum: Efraimidis-Spirakis
  // A-ES — each document draws key u^(1/w) (u uniform, w = its weight) and
  // the k largest keys per language ARE a weighted sample without
  // replacement. One pass, no rejection loop, no global RNG state: the
  // uniform is the x42 discipline's content-independent reproducible coin,
  // here a pure-integer LCG mix of doc_id expressible identically in both
  // engines (md5 hex gives no numeric value DuckDB and Spark can both
  // exponentiate). Weight = n_chars: longer documents proportionally more
  // likely — the "sample by token mass, not doc count" correction every
  // mixture builder needs (x29/x82's proportions assume it).
  //
  // Scale shape: a narrow projection computes the key, then one per-lang
  // top-k. Spark 4 plans the rank-filter window with WindowGroupLimit, so
  // each input partition forwards at most k rows per lang to the exchange
  // — the same bounded-shuffle shape as c33's custom GroupedTopK operator,
  // via the built-in path. Nothing else shuffles; text never moves.
  private val x143 = GQuery(
    "x143_weighted_sample", "ext-text weighted-reservoir-sampling",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("key").desc, col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (((col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(1073741824L))
            .cast("double") / lit(1073741824.0)).as("u"))
        .withColumn("key", pow(col("u"), lit(1.0) / col("n_chars").cast("double")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(col("lang"), col("rank").cast("long").as("rank"),
          col("doc_id"), col("n_chars"))
        .orderBy("lang", "rank")
    },
    Some("""WITH t AS (SELECT doc_id, lang, n_chars,
              CAST((doc_id * 1103515245 + 12345) % 1073741824 AS DOUBLE)
                / 1073741824.0 AS u
            FROM documents),
            r AS (SELECT lang, doc_id, n_chars,
                    row_number() OVER (PARTITION BY lang
                      ORDER BY pow(u, 1.0 / CAST(n_chars AS DOUBLE)) DESC,
                               doc_id) AS rank
                  FROM t)
            SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars
            FROM r WHERE rank <= 5 ORDER BY lang, rank"""))

  // ------------------------------------------------------------------- x157
  // Leakage-free train/val/test splitting: duplicates must NEVER straddle
  // the split — a train copy of a test document is silent eval
  // contamination (the x24 decontamination problem created by your own
  // splitter). The fix is one line of discipline: draw the split coin on
  // the DUP-GROUP key (here x02's normalized-text group), not the doc id,
  // so every copy of a document lands in the same split by construction.
  //
  // The query PROVES the property instead of asserting it: both methods
  // run side by side — naive (coin on doc_id) vs group-aware (coin on the
  // group key) — and the output counts, per method, the groups whose
  // members straddle splits. The fixture corpus has NO exact duplicates
  // (x02 reports singleton groups), so the query plants them: every
  // doc_id % 5 == 0 document is re-added verbatim under doc_id + 100000
  // (the x34/x142 plant-then-detect discipline). The naive row then
  // exhibits a nonzero straddle count (~1/3 of two-member groups split
  // their coins) while the group-aware row's is structurally zero; the
  // DuckDB oracle hash-checks both. Coins are the x42 md5 discipline
  // (hex-threshold 80/10/10).
  //
  // Scale shape: one scan computes norm + both coins narrowly; the audit
  // is a two-level aggregation on the group key — (group, split)
  // distinct counts, then per-method rollup. Nothing shuffles text except
  // the group key itself (at 100 TB: hash the norm to 128 bits first).
  private val x157 = GQuery(
    "x157_leakage_free_split", "ext-text split-hygiene",
    (s, dir) => {
      def splitOf(key: org.apache.spark.sql.Column) = {
        val h = substring(md5(key), 1, 2)
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
      }
      val corpus = docs(s, dir).select(col("doc_id"), col("text"))
      val planted = corpus.unionByName(
        corpus.where(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      val base = planted
        .withColumn("g", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
        .select(col("doc_id"), col("g"),
          splitOf(concat(col("doc_id"), lit(":split"))).as("naive"),
          splitOf(concat(col("g"), lit(":split"))).as("grouped"))
      val audits = Seq("naive", "grouped").map { m =>
        base.groupBy(col("g"))
          .agg(countDistinct(col(m)).as("n_splits"), count(lit(1)).as("n_docs"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("n_splits") > 1, 1L).otherwise(0L)).cast("long")
              .as("n_straddling"),
            sum(when(col("n_splits") > 1, col("n_docs")).otherwise(0L))
              .cast("long").as("n_docs_leaking"))
          .select(lit(m).as("method"), col("n_groups"), col("n_straddling"),
            col("n_docs_leaking"))
      }
      audits.reduce(_ unionByName _).orderBy("method")
    },
    Some("""WITH planted AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0),
            base AS (
              SELECT doc_id,
                trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS g
              FROM planted),
            coins AS (
              SELECT doc_id, g,
                CASE WHEN substr(md5(doc_id || ':split'), 1, 2) < 'cc' THEN 'train'
                     WHEN substr(md5(doc_id || ':split'), 1, 2) < 'e6' THEN 'val'
                     ELSE 'test' END AS naive,
                CASE WHEN substr(md5(g || ':split'), 1, 2) < 'cc' THEN 'train'
                     WHEN substr(md5(g || ':split'), 1, 2) < 'e6' THEN 'val'
                     ELSE 'test' END AS grouped
              FROM base),
            per_g AS (
              SELECT g,
                COUNT(DISTINCT naive) AS ns_naive,
                COUNT(DISTINCT grouped) AS ns_grouped,
                COUNT(*) AS n_docs
              FROM coins GROUP BY g)
            SELECT 'grouped' AS method,
              CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(SUM(CASE WHEN ns_grouped > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_straddling,
              CAST(SUM(CASE WHEN ns_grouped > 1 THEN n_docs ELSE 0 END) AS BIGINT)
                AS n_docs_leaking
            FROM per_g
            UNION ALL
            SELECT 'naive',
              CAST(COUNT(*) AS BIGINT),
              CAST(SUM(CASE WHEN ns_naive > 1 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(SUM(CASE WHEN ns_naive > 1 THEN n_docs ELSE 0 END) AS BIGINT)
            FROM per_g
            ORDER BY method"""))

  // ------------------------------------------------------------------- x176
  // Bottom-k sample as a MERGEABLE summary: per source, the k documents
  // with the smallest md5(doc_id) rank. Unlike x42's fixed-threshold
  // hash sample (whose size drifts with the corpus), bottom-k yields an
  // EXACT-size uniform sample — and because "bottom k of a union is the
  // bottom k of each part's bottom k", per-shard summaries merge into
  // the corpus summary without touching the corpus again (the x141/x152
  // summary algebra, applied to sampling). The query runs the sharded
  // path (3 shards → merge) and the direct path side by side and emits
  // the x160-style self-certifying agreement column, hash-checked by
  // the oracle.
  //
  // Scale shape: each shard's bottom-k is a rank-filtered window over
  // the shard (k rows out per source×shard); the merge re-ranks
  // 3k rows per source. At 100 TB this is the distributed reservoir:
  // partial bottom-k per partition (map-side), tiny merge at the end —
  // no global sort, no fact-sized exchange.
  private lazy val x176 = GQuery(
    "x176_bottomk_sample", "ext-corpus mergeable-sampling bottom-k",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 10
      val ranked = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("h"),
          pmod(col("doc_id"), lit(3)).as("shard"))
      def bottomK(df: DataFrame, parts: Seq[String]): DataFrame = {
        val w = Window.partitionBy(parts.map(col): _*).orderBy(col("h"), col("doc_id"))
        df.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
      }
      val perShard = bottomK(ranked, Seq("source", "shard"))
      val merged = bottomK(perShard, Seq("source"))
        .select(col("source"), col("doc_id"), col("h"))
      val direct = bottomK(ranked, Seq("source"))
        .select(col("source"), col("doc_id"), lit(true).as("in_direct"))
      merged.join(direct, Seq("source", "doc_id"), "full_outer")
        .select(col("source"), col("doc_id"), col("h"),
          (col("h").isNotNull && coalesce(col("in_direct"), lit(false)))
            .as("merge_agrees"))
        .orderBy("source", "doc_id")
    },
    Some("""WITH r AS (
              SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
                doc_id % 3 AS shard
              FROM documents),
            per_shard AS (
              SELECT * FROM (
                SELECT doc_id, source, h, shard,
                  ROW_NUMBER() OVER (PARTITION BY source, shard
                    ORDER BY h, doc_id) AS rn
                FROM r) WHERE rn <= 10),
            merged AS (
              SELECT source, doc_id, h FROM (
                SELECT doc_id, source, h,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY h, doc_id) AS rn
                FROM per_shard) WHERE rn <= 10),
            direct AS (
              SELECT source, doc_id, TRUE AS in_direct FROM (
                SELECT doc_id, source,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY h, doc_id) AS rn
                FROM r) WHERE rn <= 10)
            SELECT COALESCE(m.source, d.source) AS source,
              COALESCE(m.doc_id, d.doc_id) AS doc_id, m.h,
              (m.h IS NOT NULL AND COALESCE(d.in_direct, FALSE)) AS merge_agrees
            FROM merged m FULL OUTER JOIN direct d
              ON m.source = d.source AND m.doc_id = d.doc_id
            ORDER BY source, doc_id"""))

  // ------------------------------------------------------------------- x191
  // Cluster-aware k-fold assignment (GroupKFold): folds are dealt to
  // exact-dup CLUSTERS (md5(text) groups), not documents, so a
  // duplicate can never sit in both a train and an eval fold — x157's
  // leakage rule carried into cross-validation. The fold is a pure hash
  // decision (first hex digit of the salted cluster key, mod 4 — 16 hex
  // values deal evenly into 4 folds), so assignment needs NO global
  // sort or window: at 100 TB it is a narrow projection, and two
  // engines (or two runs over different partitionings) deal identical
  // folds. Fully oracled; EdgeCorpusSpec-style audit lives in the
  // CurationSpec addition (every cluster in exactly one fold).
  private lazy val x191 = GQuery(
    "x191_group_kfold", "ext-curation cross-validation group-kfold",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("ckey"))
      .withColumn("fold",
        expr("pmod(locate(substring(md5(concat(ckey, ':cv')), 1, 1), " +
          "'0123456789abcdef') - 1, 4)").cast("int"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, source, md5(text) AS ckey,
              CAST((strpos('0123456789abcdef',
                substr(md5(md5(text) || ':cv'), 1, 1)) - 1) % 4 AS INT)
                AS fold
            FROM documents ORDER BY doc_id"""))

  // ------------------------------------------------------------------- x202
  // Temperature-based mixture realization (the mT5/XLM-R recipe): source
  // sampling weights ∝ n^α with α = 1/2, DERIVED from corpus counts
  // (x29 consumes externally-given proportions; this computes them).
  // α = 1/2 is the production default AND the exactness-friendly one:
  // sqrt is correctly rounded in IEEE 754, so s = round(sqrt(n)·1000)
  // is bit-identical cross-engine, and every weight and target after
  // that quantization is INTEGER arithmetic — no float sum ever
  // reassociates (a double Σ√n would be partition-order-dependent).
  // Targets for a budget of half the corpus realize by largest-
  // remainder apportionment (floor + top-up by remainder rank, ties to
  // source name), so Σ target = budget exactly — hash-checked.
  //
  // Scale shape: one source-grain aggregation; everything after runs on
  // the source domain (a handful of rows).
  private lazy val x202 = GQuery(
    "x202_temperature_mix", "ext-curation mixture temperature-weights",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perSource = Tables(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("s_milli",
          round(sqrt(col("n_docs").cast("double")) * 1000, 0).cast("long"))
      val all = Window.partitionBy()
      val budgeted = perSource
        .withColumn("sum_s", sum(col("s_milli")).over(all))
        // integer floor division (`div`), matching the oracle's `//`: a
        // double divide-then-truncate vs round-to-nearest differs by 1
        // whenever the corpus count is odd — a cross-engine hash hazard
        .withColumn("budget", expr("sum(n_docs) over () div 2"))
        .withColumn("weight_micro",
          expr("(1000000 * s_milli) div sum_s"))
        .withColumn("target_floor", expr("(budget * s_milli) div sum_s"))
        .withColumn("rem", expr("(budget * s_milli) % sum_s"))
      budgeted
        .withColumn("short",
          col("budget") - sum(col("target_floor")).over(all))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))))
        .withColumn("target",
          col("target_floor") + when(col("rk") <= col("short"), 1L).otherwise(0L))
        .select(col("source"), col("n_docs"), col("s_milli"),
          col("weight_micro"), col("target"))
        .orderBy("source")
    },
    Some("""WITH g AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY source),
            q AS (
              SELECT source, n_docs,
                CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000, 0) AS BIGINT)
                  AS s_milli
              FROM g),
            t AS (
              SELECT *, CAST(SUM(s_milli) OVER () AS BIGINT) AS sum_s,
                CAST(SUM(n_docs) OVER () // 2 AS BIGINT) AS budget
              FROM q),
            f AS (
              SELECT source, n_docs, s_milli,
                (1000000 * s_milli) // sum_s AS weight_micro,
                (budget * s_milli) // sum_s AS target_floor,
                (budget * s_milli) % sum_s AS rem, budget
              FROM t),
            r AS (
              SELECT *, budget - CAST(SUM(target_floor) OVER () AS BIGINT)
                  AS short,
                ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
              FROM f)
            SELECT source, n_docs, s_milli, weight_micro,
              target_floor + CAST(CASE WHEN rk <= short THEN 1 ELSE 0 END
                  AS BIGINT) AS target
            FROM r ORDER BY source"""))

  // ------------------------------------------------------------------- x219
  // Rank-based ROC-AUC (the Mann–Whitney U identity) — the standard
  // evaluation for any quality-signal threshold choice: here, how well the
  // x120 lexical-diversity score separates English documents from the rest
  // of the corpus. AUC = (Σ avg-rank(positives) − n₊(n₊+1)/2) / (n₊·n₋),
  // with ties carrying the textbook AVERAGE rank. Average ranks can be
  // half-integers, so everything runs in DOUBLED rank units
  // (2·avgrank = 2·(below+1) + ties − 1 — integer by construction), and
  // the final statistic quantizes to micros with one integer division:
  // engine-exact, hash-verifiable.
  //
  // Scale shape: the rank computation never forms a corpus-wide window —
  // scores quantize to ≤ 1001 integer values, so ranks come from ONE
  // map-side-combinable aggregate over the score domain plus a
  // domain-sized cumulative window (the x214 bound: facts never sort).
  /** (score, n, np) of the type-token-ratio quality signal labeled
    * pos=English — the shared substrate of the quality-signal family:
    * x219 (AUC), x251 (ROC curve) and x253 (F1 operating point) are all
    * reads of THIS one table, so the score definition and tie handling
    * can never drift between them (x251's trapezoid-identity spec pins
    * the family's coherence; this makes it structural).
    */
  private def ttrScoreCounts(d: DataFrame): DataFrame =
    scoreCounts(d, expr("(1000 * size(array_distinct(split(text, ' ')))) " +
      "div size(split(text, ' '))"))

  /** (score, n, np) for ANY integer feature with the pos=English label —
    * the generalized substrate (x263's stump scores token length through
    * the same machinery the ttr family uses).
    */
  private def scoreCounts(d: DataFrame,
      score: org.apache.spark.sql.Column): DataFrame =
    d.select((col("lang") === "en").as("pos"), score.as("score"))
      .groupBy("score").agg(count(lit(1)).as("n"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("np"))

  /** Descending-threshold confusion counts layered on [[ttrScoreCounts]]:
    * (score, n, np, tp, fp, p, nn) at "predict positive when score ≥ t".
    */
  private def confusionByThreshold(byScore: DataFrame): DataFrame = {
    val desc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byScore
      .withColumn("tp", sum(col("np")).over(desc))
      .withColumn("fp", sum(col("n") - col("np")).over(desc))
      .withColumn("p", sum(col("np")).over(all))
      .withColumn("nn", sum(col("n") - col("np")).over(all))
  }

  private val x219 = GQuery(
    "x219_auc_rank", "ext-text quality-signal roc-auc rank-statistic",
    (s, dir) => {
      val byScore = ttrScoreCounts(docs(s, dir))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      byScore
        .withColumn("below", coalesce(sum(col("n")).over(w), lit(0L)))
        .withColumn("rank2", lit(2L) * (col("below") + 1L) + col("n") - 1L)
        .agg(sum(col("np")).as("n_pos"),
          (sum(col("n")) - sum(col("np"))).as("n_neg"),
          sum(col("np") * col("rank2")).as("r2"))
        .select(col("n_pos"), col("n_neg"),
          expr("(1000000 * (r2 - n_pos * (n_pos + 1))) " +
            "div (2 * n_pos * n_neg)").as("auc_micro"))
    },
    Some("""WITH sc AS (
              SELECT (lang = 'en') AS pos,
                (1000 * len(list_distinct(string_split(text, ' '))))
                  // len(string_split(text, ' ')) AS score
              FROM documents),
            bys AS (
              SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
              FROM sc GROUP BY 1),
            g AS (
              SELECT *, COALESCE(CAST(SUM(n) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) AS below
              FROM bys),
            r AS (
              SELECT np, n, 2 * (below + 1) + n - 1 AS rank2 FROM g),
            f AS (
              SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
                CAST(SUM(n) - SUM(np) AS BIGINT) AS n_neg,
                CAST(SUM(np * rank2) AS BIGINT) AS r2
              FROM r)
            SELECT n_pos, n_neg,
              (1000000 * (r2 - n_pos * (n_pos + 1)))
                // (2 * n_pos * n_neg) AS auc_micro
            FROM f"""))

  // ------------------------------------------------------------------- x222
  // Cohen's kappa — chance-corrected agreement between two independent
  // quality raters, the standard check before trusting any single heuristic
  // (two filters that agree no better than chance are not measuring the
  // same thing). Rater A: lexical diversity (x120's ttr_milli >= 500);
  // rater B: document length (>= 55 tokens). κ = (p_o − p_e)/(1 − p_e)
  // clears denominators to κ_micro = ((a+d)·n − pe_num)·10⁶ div
  // (n² − pe_num) with pe_num = (a+b)(a+c) + (c+d)(b+d) — all integer
  // (n² ≤ 9·10¹⁸ holds to n = 3·10⁹ documents; beyond that the same
  // identity runs in DECIMAL(38,0)).
  //
  // Scale shape: one map-side-combinable 4-counter aggregate; nothing else.
  private val x222 = GQuery(
    "x222_cohens_kappa", "ext-text rater-agreement cohens-kappa",
    (s, dir) => {
      val rated = docs(s, dir).select(
        (expr("(1000 * size(array_distinct(split(text, ' ')))) " +
          "div size(split(text, ' '))") >= 500L).as("ra"),
        (size(split(col("text"), " ")) >= 55).as("rb"))
      rated.agg(
          sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("a"),
          sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          expr("((a + d) * (a + b + c + d) " +
            "- ((a + b) * (a + c) + (c + d) * (b + d))) * 1000000 " +
            "div ((a + b + c + d) * (a + b + c + d) " +
            "- ((a + b) * (a + c) + (c + d) * (b + d)))").as("kappa_micro"))
    },
    Some("""WITH rated AS (
              SELECT
                ((1000 * len(list_distinct(string_split(text, ' '))))
                  // len(string_split(text, ' ')) >= 500) AS ra,
                (len(string_split(text, ' ')) >= 55) AS rb
              FROM documents),
            cm AS (
              SELECT
                CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS a,
                CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS b,
                CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT) AS c,
                CAST(SUM(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT) AS d
              FROM rated)
            SELECT a, b, c, d,
              ((a + d) * (a + b + c + d)
                - ((a + b) * (a + c) + (c + d) * (b + d))) * 1000000
                // ((a + b + c + d) * (a + b + c + d)
                  - ((a + b) * (a + c) + (c + d) * (b + d))) AS kappa_micro
            FROM cm"""))

  // ------------------------------------------------------------------- x223
  // k-anonymity census — the privacy-side curation audit: under the
  // quasi-identifier (lang, source, length-bucket), how many documents sit
  // in groups small enough to re-identify? Reports group and row counts per
  // k-band; the k=1 band is the release blocker. Pure integer group-bys.
  //
  // Scale shape: one QI aggregate (map-side combinable), one band
  // aggregate over the GROUP table — the fact table is touched once.
  private val x223 = GQuery(
    "x223_k_anonymity", "ext-docs privacy k-anonymity census",
    (s, dir) => {
      val groups = docs(s, dir)
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100").as("len_bucket"))
        .agg(count(lit(1)).as("k"))
      groups
        .groupBy(when(col("k") === 1L, "1")
          .when(col("k") <= 4L, "2-4")
          .when(col("k") <= 9L, "5-9")
          .otherwise("10+").as("k_band"))
        .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_docs"))
        .orderBy("k_band")
    },
    Some("""WITH g AS (
              SELECT lang, source, n_chars // 100 AS len_bucket,
                CAST(COUNT(*) AS BIGINT) AS k
              FROM documents GROUP BY 1, 2, 3),
            b AS (
              SELECT CASE WHEN k = 1 THEN '1' WHEN k <= 4 THEN '2-4'
                WHEN k <= 9 THEN '5-9' ELSE '10+' END AS k_band, k
              FROM g)
            SELECT k_band, CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(SUM(k) AS BIGINT) AS n_docs
            FROM b GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x226
  // Balanced shard packing — assign documents to a fixed shard count so
  // per-shard token totals equalize: sort by token count descending and
  // deal boustrophedon (serpentine: 0..7, then 7..0, ...), the classic
  // greedy guarantee for balanced static partitioning of known sizes.
  // This is the assignment step behind every fixed-budget training-shard
  // build (x43's deterministic sharding balances COUNTS; this balances
  // TOKEN MASS).
  //
  // Scale shape: the global rank never runs as one corpus-wide window —
  // token counts quantize to ≤ 1000 values, so rank = domain-cumulative
  // offset (tiny window over the count DOMAIN) + row_number within the
  // count's partition (parallel window, partition-sized). Output is
  // shard-level: 8 rows.
  /** The ONE boustrophedon shard assignment (x226 packing, x233 export
    * manifest): rank by (n_tok desc, doc_id) via the count-domain offset
    * + per-count window (never a global sort), deal serpentine over 8
    * shards. Input needs (doc_id, n_tok, ...); output adds `shard` and
    * preserves the other columns.
    */
  private def serpentineShards(d: DataFrame): DataFrame = {
    val dom = d.groupBy("n_tok").agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("n_tok").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    d.join(dom.select(col("n_tok"), col("offset")), "n_tok")
      .withColumn("r", col("offset")
        + row_number().over(
          Window.partitionBy("n_tok").orderBy("doc_id")).cast("long") - 1L)
      .withColumn("shard",
        when(expr("(r div 8) % 2") === 0L, expr("r % 8"))
          .otherwise(expr("7 - (r % 8)")))
      .drop("offset", "r")
  }

  private val x226 = GQuery(
    "x226_shard_packing", "ext-docs shard-assignment balanced boustrophedon",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      serpentineShards(d)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
        .orderBy("shard")
    },
    Some("""WITH d AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
            r AS (
              SELECT n_tok,
                CAST(ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id)
                  AS BIGINT) - 1 AS r
              FROM d),
            a AS (
              SELECT n_tok,
                CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END
                  AS shard
              FROM r)
            SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS tok_total
            FROM a GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x233
  // Export manifest — the verifiable deliverable of a training-shard
  // build: per shard (x226's boustrophedon assignment), the document
  // count, token mass, and a CONTENT HASH (md5 over the doc_id-ordered
  // concatenation of per-document md5s) a downstream consumer re-derives
  // to prove the handoff lost nothing. This is the receipt every corpus
  // release ships next to its shards; content addressing follows x14's
  // md5 fingerprint discipline.
  //
  // Scale shape: per-doc hashing is scan-bound; each shard's digest folds
  // 32-char hashes (never text) through one shard-partitioned sort —
  // shard-sized lists of fingerprints, bounded by the packing balance.
  private val x233 = GQuery(
    "x233_export_manifest", "ext-docs shard-export content-manifest",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        md5(col("text")).as("h"))
      serpentineShards(d)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"),
          md5(concat_ws("",
            array_sort(collect_list(struct(col("doc_id"), col("h"))))
              .getField("h"))).as("content_hash"))
        .orderBy("shard")
    },
    Some("""WITH d AS (
              SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                md5(text) AS h
              FROM documents),
            r AS (
              SELECT doc_id, n_tok, h,
                CAST(ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id)
                  AS BIGINT) - 1 AS r
              FROM d),
            a AS (
              SELECT doc_id, n_tok, h,
                CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END
                  AS shard
              FROM r)
            SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS tok_total,
              md5(string_agg(h, '' ORDER BY doc_id)) AS content_hash
            FROM a GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x235
  // Chi-square independence audit of lang × source — the categorical
  // confounding check a curation pipeline runs before stratified
  // sampling: if language and source are dependent, per-source quotas
  // silently reshape the language mixture (and vice versa). Full
  // contingency over the DOMAIN LATTICE (absent cells contribute through
  // their expected counts — a groupBy alone would drop them), per-cell
  // contributions exact to the micro: (N·n_ij − r_i·c_j)²·10⁶ div
  // (N·r_i·c_j), with the squared deviation in DECIMAL(38,0)/HUGEINT
  // (the x220 headroom discipline). κ/z/MK siblings: x222, x187, x228.
  //
  // Scale shape: one fact aggregate to the (lang, source) grid, marginals
  // as rollups OF the grid, the lattice a langs × sources cross of two
  // dimension-sized tables (bounded domain — whitelisted like x171).
  /** The full lang × source chi-square lattice with exact per-cell micro
    * contributions — ONE definition shared by x235 (the per-cell audit)
    * and x247 (the Cramér's V normalization), so the spec-pinned
    * bit-identity of their chi² mass is structural, not hand-maintained.
    */
  private def chi2CellsOf(d: DataFrame): DataFrame = {
    val grid = d.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // marginals + lattice reread the grid
    val langs = grid.groupBy("lang").agg(sum(col("n")).as("r_i"))
    val sources = grid.groupBy("source").agg(sum(col("n")).as("c_j"))
    val total = grid.agg(sum(col("n")).as("n_total"))
    langs.crossJoin(sources).crossJoin(broadcast(total))
      .join(grid, Seq("lang", "source"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("dev", expr("n_total * n - r_i * c_j"))
      .withColumn("chi2_cell_micro",
        expr("cast((cast(dev as decimal(38,0)) * dev * 1000000) " +
          "div (cast(n_total as decimal(38,0)) * r_i * c_j) as bigint)"))
  }

  private val x235 = GQuery(
    "x235_chi2_independence", "ext-docs categorical-audit chi-square",
    (s, dir) => {
      chi2CellsOf(docs(s, dir))
        .withColumn("chi2_total_micro",
          sum(col("chi2_cell_micro")).over(Window.partitionBy()))
        .select(col("lang"), col("source"), col("n"),
          col("chi2_cell_micro"), col("chi2_total_micro"))
        .orderBy("lang", "source")
    },
    Some("""WITH grid AS (
              SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2),
            l AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS r_i
                  FROM grid GROUP BY 1),
            s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS c_j
                  FROM grid GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM grid),
            cells AS (
              SELECT l.lang, s.source, COALESCE(g.n, 0) AS n,
                t.n_total * COALESCE(g.n, 0) - l.r_i * s.c_j AS dev,
                l.r_i, s.c_j, t.n_total
              FROM l CROSS JOIN s CROSS JOIN t
              LEFT JOIN grid g ON g.lang = l.lang AND g.source = s.source),
            x AS (
              SELECT lang, source, n,
                CAST((CAST(dev AS HUGEINT) * dev * 1000000)
                  // (CAST(n_total AS HUGEINT) * r_i * c_j) AS BIGINT)
                  AS chi2_cell_micro
              FROM cells)
            SELECT lang, source, n, chi2_cell_micro,
              CAST(SUM(chi2_cell_micro) OVER () AS BIGINT)
                AS chi2_total_micro
            FROM x ORDER BY lang, source"""))

  // ------------------------------------------------------------------- x251
  // ROC curve table — the CURVE behind x219's AUC scalar (the x239→x220
  // read applied to classification): one row per distinct score
  // threshold of the same type-token-ratio signal over the same
  // pos=English labeling, with exact counts and integer-milli TPR/FPR at
  // "predict positive when score ≥ t". What a threshold DECISION actually
  // reads — AUC says the signal ranks well overall; this says which
  // cutoff buys which trade. Exact integers end to end (descending
  // cumulative counts over the ≤1001-value score domain).
  //
  // Scale shape: one fact aggregate to the score domain, domain-sized
  // descending windows — the x219 shape with the rollup deferred.
  private val x251 = GQuery(
    "x251_roc_curve", "ext-text quality-signal roc-curve thresholds",
    (s, dir) => {
      confusionByThreshold(ttrScoreCounts(docs(s, dir)))
        .select(col("score").as("threshold"), col("tp"), col("fp"),
          expr("(1000 * tp) div p").as("tpr_milli"),
          expr("(1000 * fp) div nn").as("fpr_milli"))
        .orderBy(col("threshold").desc)
    },
    Some("""WITH sc AS (
              SELECT (lang = 'en') AS pos,
                (1000 * len(list_distinct(string_split(text, ' '))))
                  // len(string_split(text, ' ')) AS score
              FROM documents),
            bys AS (
              SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
              FROM sc GROUP BY 1),
            g AS (
              SELECT score,
                CAST(SUM(np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tp,
                CAST(SUM(n - np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS fp,
                CAST(SUM(np) OVER () AS BIGINT) AS p,
                CAST(SUM(n - np) OVER () AS BIGINT) AS nn
              FROM bys)
            SELECT score AS threshold, tp, fp,
              (1000 * tp) // p AS tpr_milli,
              (1000 * fp) // nn AS fpr_milli
            FROM g ORDER BY threshold DESC"""))

  // ------------------------------------------------------------------- x259
  // Simpson diversity profile — corpus diversity along three axes (lang,
  // source, token vocabulary) in ONE pass each: Simpson's λ = P(two
  // random draws match) = Σ nᵢ(nᵢ−1) / (N(N−1)) and its inverse (the
  // EFFECTIVE number of categories — "this corpus behaves like k
  // equally-sized languages"), the diversity target a mixture curator
  // tracks per ingest. Simpson is the diversity index that is EXACT in
  // integers (Shannon's Σp·ln p is float-transcendental and would break
  // the engine's cross-engine hash discipline; λ needs only counts),
  // with DECIMAL(38,0)/HUGEINT headroom for nᵢ² at 100 TB.
  //
  // Scale shape: three category-keyed count aggregates unioned, one
  // dimension-grained rollup; the token branch pays the same single
  // explosion every Text operator pays.
  private val x259 = GQuery(
    "x259_diversity_profile", "ext-docs diversity simpson effective-categories",
    (s, dir) => {
      val d = docs(s, dir)
      val cats = d.select(lit("lang").as("dim"), col("lang").as("cat"))
        .unionAll(d.select(lit("source").as("dim"), col("source").as("cat")))
        .unionAll(d.select(lit("token").as("dim"),
          explode(split(col("text"), " ")).as("cat")))
      cats.groupBy("dim", "cat").agg(count(lit(1)).as("c"))
        .groupBy("dim").agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
          sum(expr("cast(c as decimal(38,0)) * (c - 1)")).as("ss"))
        .select(col("dim"), col("n"), col("k"),
          expr("""cast((1000000 * ss)
               div (cast(n as decimal(38,0)) * (n - 1)) as bigint)""")
            .as("simpson_micro"),
          expr("""case when ss = 0 then -1
               else cast((1000 * cast(n as decimal(38,0)) * (n - 1))
                 div ss as bigint) end""").as("eff_cats_milli"))
        .orderBy("dim")
    },
    Some("""WITH cats AS (
              SELECT 'lang' AS dim, lang AS cat FROM documents
              UNION ALL
              SELECT 'source' AS dim, source AS cat FROM documents
              UNION ALL
              SELECT 'token' AS dim, unnest(string_split(text, ' ')) AS cat
              FROM documents),
            cnt AS (
              SELECT dim, cat, CAST(COUNT(*) AS BIGINT) AS c
              FROM cats GROUP BY 1, 2),
            m AS (
              SELECT dim, CAST(SUM(c) AS BIGINT) AS n,
                CAST(COUNT(*) AS BIGINT) AS k,
                SUM(CAST(c AS HUGEINT) * (c - 1)) AS ss
              FROM cnt GROUP BY 1)
            SELECT dim, n, k,
              CAST((1000000 * ss)
                // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
                AS simpson_micro,
              CASE WHEN ss = 0 THEN -1
                ELSE CAST((1000 * CAST(n AS HUGEINT) * (n - 1))
                  // ss AS BIGINT) END AS eff_cats_milli
            FROM m ORDER BY dim"""))

  // ------------------------------------------------------------------- x263
  // Decision stump (CART's first node, Breiman et al. 1984): the best
  // single threshold split of DOCUMENT LENGTH for predicting lang=en by
  // exact Gini impurity decrease — the baseline every learned quality
  // classifier (x80) must beat, and the interpretable rule ("docs ≥ t
  // tokens are mostly English") an operator can read off directly.
  // Split "left = score ≥ t" reuses the descending confusion windows;
  // per-side weighted impurities are micro-quantized integers
  // (1e6·(m² − pos² − neg²) div (m·n), the x235 per-term discipline), and
  // the argmin is by the quantized metric itself with a smallest-
  // threshold tie-break — cross-engine argmax agreement structural, like
  // x253. n² products ride DECIMAL(38,0)/HUGEINT.
  //
  // Scale shape: one fact aggregate to the ≤|length-domain| grid,
  // domain-sized windows, one TakeOrdered(1).
  private val x263 = GQuery(
    "x263_decision_stump", "ext-text decision-stump gini-split",
    (s, dir) => {
      val byScore = scoreCounts(docs(s, dir),
        size(split(col("text"), " ")).cast("long"))
      confusionByThreshold(byScore)
        .withColumn("ml", col("tp") + col("fp"))
        .withColumn("mr", col("p") + col("nn") - col("ml"))
        .where(col("mr") > 0) // a split needs a non-empty right side
        .withColumn("nn_tot", col("p") + col("nn"))
        .withColumn("gini_split_micro", expr(
          """cast((1000000 * (cast(ml as decimal(38,0)) * ml
                - cast(tp as decimal(38,0)) * tp
                - cast(ml - tp as decimal(38,0)) * (ml - tp)))
              div (cast(ml as decimal(38,0)) * nn_tot) as bigint)
            + cast((1000000 * (cast(mr as decimal(38,0)) * mr
                - cast(p - tp as decimal(38,0)) * (p - tp)
                - cast(mr - p + tp as decimal(38,0)) * (mr - p + tp)))
              div (cast(mr as decimal(38,0)) * nn_tot) as bigint)"""))
        .withColumn("gini_parent_micro", expr(
          """cast((1000000 * (cast(nn_tot as decimal(38,0)) * nn_tot
                - cast(p as decimal(38,0)) * p
                - cast(nn as decimal(38,0)) * nn))
              div (cast(nn_tot as decimal(38,0)) * nn_tot) as bigint)"""))
        .orderBy(col("gini_split_micro"), col("score"))
        .limit(1)
        .select(col("score").as("threshold"),
          col("ml").as("n_left"), col("tp").as("pos_left"),
          col("mr").as("n_right"), (col("p") - col("tp")).as("pos_right"),
          col("gini_parent_micro"), col("gini_split_micro"),
          (col("gini_parent_micro") - col("gini_split_micro"))
            .as("gain_micro"))
    },
    Some("""WITH sc AS (
              SELECT (lang = 'en') AS pos,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS score
              FROM documents),
            bys AS (
              SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
              FROM sc GROUP BY 1),
            g AS (
              SELECT score,
                CAST(SUM(np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tp,
                CAST(SUM(n) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS ml,
                CAST(SUM(np) OVER () AS BIGINT) AS p,
                CAST(SUM(n) OVER () AS BIGINT) AS nn_tot
              FROM bys),
            e AS (
              SELECT score, ml, tp, nn_tot - ml AS mr, p,
                nn_tot, nn_tot - p AS nn
              FROM g WHERE nn_tot - ml > 0),
            sp AS (
              SELECT score, ml, tp, mr, p, nn_tot,
                CAST((1000000 * (CAST(ml AS HUGEINT) * ml
                    - CAST(tp AS HUGEINT) * tp
                    - CAST(ml - tp AS HUGEINT) * (ml - tp)))
                  // (CAST(ml AS HUGEINT) * nn_tot) AS BIGINT)
                + CAST((1000000 * (CAST(mr AS HUGEINT) * mr
                    - CAST(p - tp AS HUGEINT) * (p - tp)
                    - CAST(mr - p + tp AS HUGEINT) * (mr - p + tp)))
                  // (CAST(mr AS HUGEINT) * nn_tot) AS BIGINT)
                  AS gini_split_micro,
                CAST((1000000 * (CAST(nn_tot AS HUGEINT) * nn_tot
                    - CAST(p AS HUGEINT) * p
                    - CAST(nn_tot - p AS HUGEINT) * (nn_tot - p)))
                  // (CAST(nn_tot AS HUGEINT) * nn_tot) AS BIGINT)
                  AS gini_parent_micro
              FROM e)
            SELECT score AS threshold, ml AS n_left, tp AS pos_left,
              mr AS n_right, p - tp AS pos_right,
              gini_parent_micro, gini_split_micro,
              gini_parent_micro - gini_split_micro AS gain_micro
            FROM sp ORDER BY gini_split_micro, score LIMIT 1"""))

  // ------------------------------------------------------------------- x257
  // Capture–recapture corpus-size estimation (Chapman's nearly-unbiased
  // estimator, 1951): two INDEPENDENT deterministic hash samples (md5
  // over doc_id with distinct salts — the x42 cross-engine sampling
  // idiom) play the two "captures"; the overlap estimates the population:
  // N̂ = (n₁+1)(n₂+1)/(m+1) − 1. The estimator a federated/streaming
  // setting uses when COUNT(*) itself is unaffordable or the frames are
  // owned by different parties — audited here against the exactly-known
  // corpus size, the c21/x152 estimate-vs-exact discipline. Integer
  // division only; the m+1 denominator makes the zero-overlap case
  // total.
  //
  // Scale shape: two predicate scans + one 1-row rollup each, overlap by
  // a key-equi semi count — no shuffle wider than the samples.
  private val x257 = GQuery(
    "x257_capture_recapture", "ext-docs population-estimation chapman",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
      def capture(salt: String) =
        d.where(substring(md5(concat(col("doc_id"), lit(salt))), 1, 2)
          <= "3f")
      val a = capture(":capA")
      val b = capture(":capB")
      val n1 = a.agg(count(lit(1)).as("n1"))
      val n2 = b.agg(count(lit(1)).as("n2"))
      val m = a.join(b, "doc_id").agg(count(lit(1)).as("m"))
      val truth = d.agg(count(lit(1)).as("n_true"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m))
        .crossJoin(broadcast(truth))
        .select(col("n1"), col("n2"), col("m"),
          expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").as("n_hat"),
          col("n_true"))
    },
    Some("""WITH a AS (SELECT doc_id FROM documents
                       WHERE substr(md5(doc_id || ':capA'), 1, 2) <= '3f'),
            b AS (SELECT doc_id FROM documents
                  WHERE substr(md5(doc_id || ':capB'), 1, 2) <= '3f'),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m
                  FROM a JOIN b USING (doc_id)),
            c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM a),
            d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM b),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true FROM documents)
            SELECT c.n1, d.n2, m.m,
              (c.n1 + 1) * (d.n2 + 1) // (m.m + 1) - 1 AS n_hat,
              t.n_true
            FROM c, d, m, t"""))

  // ------------------------------------------------------------------- x253
  // F1-optimal operating point — the DECISION x251's curve informs: the
  // threshold maximizing milli-quantized F1 (2000·tp div (2tp+fp+fn)),
  // ties broken toward the smallest threshold (deterministic in both
  // engines). One row: the chosen cutoff with its exact confusion counts
  // and milli precision/recall/F1 — what actually ships into a quality
  // gate config. Exact integers end to end; F1's milli quantization is
  // the selection metric itself, so cross-engine argmax agreement is
  // structural, not numerical luck.
  //
  // Scale shape: x251's domain-grid windows + one TakeOrdered(1).
  private val x253 = GQuery(
    "x253_f1_operating_point", "ext-text quality-signal f1-threshold",
    (s, dir) => {
      confusionByThreshold(ttrScoreCounts(docs(s, dir)))
        .withColumn("fn", col("p") - col("tp"))
        .withColumn("f1_milli",
          expr("(2000 * tp) div (2 * tp + fp + fn)"))
        .orderBy(col("f1_milli").desc, col("score"))
        .limit(1)
        .select(col("score").as("threshold"), col("tp"), col("fp"),
          col("fn"),
          expr("(1000 * tp) div (tp + fp)").as("precision_milli"),
          expr("(1000 * tp) div p").as("recall_milli"),
          col("f1_milli"))
    },
    Some("""WITH sc AS (
              SELECT (lang = 'en') AS pos,
                (1000 * len(list_distinct(string_split(text, ' '))))
                  // len(string_split(text, ' ')) AS score
              FROM documents),
            bys AS (
              SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
              FROM sc GROUP BY 1),
            g AS (
              SELECT score,
                CAST(SUM(np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tp,
                CAST(SUM(n - np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS fp,
                CAST(SUM(np) OVER () AS BIGINT) AS p
              FROM bys),
            f AS (
              SELECT score AS threshold, tp, fp, p - tp AS fn,
                (1000 * tp) // (tp + fp) AS precision_milli,
                (1000 * tp) // p AS recall_milli,
                (2000 * tp) // (2 * tp + fp + (p - tp)) AS f1_milli
              FROM g)
            SELECT threshold, tp, fp, fn, precision_milli, recall_milli,
              f1_milli
            FROM f ORDER BY f1_milli DESC, threshold LIMIT 1"""))

  // ------------------------------------------------------------------- x247
  // Cramér's V — the [0,1]-normalized effect size behind x235's raw χ²
  // (χ² grows with N even for a fixed association; V = √(χ²/(N·min(r−1,
  // c−1))) is what a "HOW confounded is lang × source?" decision actually
  // compares across corpora). The χ² mass is x235's exact per-cell
  // micro-quantized total (integer, identical in both engines); N and the
  // domain cardinalities are integers; the ONLY float steps are one
  // division of those exact values, one correctly-rounded sqrt, and the
  // round to micros — deterministic cross-engine like the x231 finish.
  //
  // Scale shape: identical to x235 (domain-lattice sized) plus a 1-row
  // rollup.
  private val x247 = GQuery(
    "x247_cramers_v", "ext-docs categorical-audit cramers-v",
    (s, dir) => {
      // the chi2 mass is x235's lattice, by construction (chi2CellsOf)
      chi2CellsOf(docs(s, dir))
        .agg(sum(col("chi2_cell_micro")).as("chi2_micro"),
          first(col("n_total")).as("n_total"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"))
        .select(col("n_total"), col("n_langs"), col("n_sources"),
          col("chi2_micro"),
          expr("""cast(round(sqrt(
               cast(chi2_micro as double)
               / cast(1000000 * n_total
                   * least(n_langs - 1, n_sources - 1) as double))
             * 1000000, 0) as bigint)""").as("cramers_v_micro"))
    },
    Some("""WITH grid AS (
              SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2),
            l AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS r_i
                  FROM grid GROUP BY 1),
            s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS c_j
                  FROM grid GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM grid),
            dims AS (
              SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM l) AS n_langs,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_sources),
            x AS (
              SELECT CAST(SUM(
                  CAST((CAST(t.n_total * COALESCE(g.n, 0)
                      - l.r_i * s.c_j AS HUGEINT)
                    * (t.n_total * COALESCE(g.n, 0) - l.r_i * s.c_j)
                    * 1000000)
                  // (CAST(t.n_total AS HUGEINT) * l.r_i * s.c_j) AS BIGINT))
                AS BIGINT) AS chi2_micro,
                MAX(t.n_total) AS n_total
              FROM l CROSS JOIN s CROSS JOIN t
              LEFT JOIN grid g ON g.lang = l.lang AND g.source = s.source)
            SELECT x.n_total, dims.n_langs, dims.n_sources, x.chi2_micro,
              CAST(round(sqrt(
                  CAST(x.chi2_micro AS DOUBLE)
                  / CAST(1000000 * x.n_total
                      * least(dims.n_langs - 1, dims.n_sources - 1)
                    AS DOUBLE))
                * 1000000, 0) AS BIGINT) AS cramers_v_micro
            FROM x, dims"""))

  // ------------------------------------------------------------------- x264
  // Precision–recall curve — the companion x251 (ROC) cannot replace
  // under class imbalance: with 10⁴:1 negative skew (the regime of every
  // web-corpus quality filter) FPR stays near zero for ANY cutoff while
  // precision collapses, so the PR curve is what a curation-threshold
  // decision actually reads (Davis & Goadrich 2006). Same signal, same
  // labeling, same descending-threshold confusion counts as x219/x251/
  // x253 — one more read of the shared substrate, so the family cannot
  // drift. tp+fp ≥ 1 at every emitted threshold by construction (the
  // row's own score bucket is included), so the precision division is
  // total; recall divides by total positives p, which CAN be zero (no
  // lang='en' rows), so it is guarded to NULL in both engines.
  //
  // Scale shape: x251's — one fact aggregate to the ≤1001-value score
  // domain, domain-sized descending windows, no fact-sized sort.
  private val x264 = GQuery(
    "x264_pr_curve", "ext-text quality-signal pr-curve thresholds",
    (s, dir) => {
      confusionByThreshold(ttrScoreCounts(docs(s, dir)))
        .select(col("score").as("threshold"), col("tp"), col("fp"),
          expr("(1000 * tp) div (tp + fp)").as("precision_milli"),
          // guarded (round-10 ADVICE): a corpus with NO positives (p=0,
          // e.g. no lang='en' rows) yields a defined NULL recall in both
          // engines rather than an unguarded division by zero
          expr("case when p > 0 then (1000 * tp) div p end")
            .as("recall_milli"))
        .orderBy(col("threshold").desc)
    },
    Some("""WITH sc AS (
              SELECT (lang = 'en') AS pos,
                (1000 * len(list_distinct(string_split(text, ' '))))
                  // len(string_split(text, ' ')) AS score
              FROM documents),
            bys AS (
              SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
              FROM sc GROUP BY 1),
            g AS (
              SELECT score,
                CAST(SUM(np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tp,
                CAST(SUM(n - np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS fp,
                CAST(SUM(np) OVER () AS BIGINT) AS p
              FROM bys)
            SELECT score AS threshold, tp, fp,
              (1000 * tp) // (tp + fp) AS precision_milli,
              CASE WHEN p > 0 THEN (1000 * tp) // p END AS recall_milli
            FROM g ORDER BY threshold DESC"""))

  // ------------------------------------------------------------------- x265
  // Average precision — the SCALAR of x264's curve, as x219's AUC is the
  // scalar of x251's: the step-interpolated AP = Σₜ Δrecallₜ·precisionₜ
  // ranking metric every retrieval/filter comparison tabulates. Clearing
  // the recall denominator gives AP = (Σₜ Δtpₜ·precₜ)/p with Δtp the
  // positives gained at threshold t, so quantizing precision to micros
  // FIRST (integer div, identical in both engines) makes the whole sum —
  // and the final division by p — exact integers: cross-engine agreement
  // is structural, not numerical luck (the x253 argmax discipline applied
  // to a sum).
  //
  // Scale shape: x264's domain windows + one 1-row rollup.
  private val x265 = GQuery(
    "x265_average_precision", "ext-text quality-signal average-precision",
    (s, dir) => {
      val desc = Window.orderBy(col("score").desc)
      confusionByThreshold(ttrScoreCounts(docs(s, dir)))
        .withColumn("dtp",
          col("tp") - coalesce(lag(col("tp"), 1).over(desc), lit(0L)))
        .withColumn("prec_micro",
          expr("(1000000 * tp) div (tp + fp)"))
        .agg(first(col("p")).as("n_pos"),
          sum(col("dtp") * col("prec_micro")).as("mass"))
        .select(col("n_pos"),
          // guarded (round-10 ADVICE): zero positives → NULL AP in both
          // engines, not a division by zero
          expr("case when n_pos > 0 then mass div n_pos end")
            .as("ap_micro"))
    },
    Some("""WITH sc AS (
              SELECT (lang = 'en') AS pos,
                (1000 * len(list_distinct(string_split(text, ' '))))
                  // len(string_split(text, ' ')) AS score
              FROM documents),
            bys AS (
              SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
              FROM sc GROUP BY 1),
            g AS (
              SELECT score,
                CAST(SUM(np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS tp,
                CAST(SUM(n - np) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS fp,
                CAST(SUM(np) OVER () AS BIGINT) AS p
              FROM bys),
            d AS (
              SELECT p, tp - COALESCE(LAG(tp) OVER (ORDER BY score DESC), 0)
                  AS dtp,
                (1000000 * tp) // (tp + fp) AS prec_micro
              FROM g),
            m AS (
              SELECT CAST(MAX(p) AS BIGINT) AS n_pos,
                CAST(SUM(dtp * prec_micro) AS BIGINT) AS mass
              FROM d)
            SELECT n_pos,
              CASE WHEN n_pos > 0 THEN mass // n_pos END AS ap_micro
            FROM m"""))

  // ------------------------------------------------------------------- x266
  // Calibration table + expected calibration error (ECE, Naeini et al.
  // 2015) — x219/x264 grade how the signal RANKS; this grades whether its
  // VALUE means what it says: treating the milli-scaled TTR score as a
  // predicted probability of lang=en, bin into 10 fixed-width bins and
  // compare each bin's mean predicted milli against its empirical
  // positive rate. ECE = Σ nᵦ·|gap|/N is the number a scorer has to beat
  // before its raw scores may gate anything (an uncalibrated score needs
  // x97's quantile calibration first — this measures how much). All
  // integer: per-bin means and rates quantize by integer division before
  // the weighted rollup, so both engines sum identical integers.
  //
  // Scale shape: one map-side-combinable 10-bin aggregate over the fact
  // scan; the ECE constant rides a 10-row window — nothing fact-sized
  // moves.
  private val x266 = GQuery(
    "x266_calibration_ece", "ext-text quality-signal calibration-ece",
    (s, dir) => {
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      docs(s, dir)
        .select((col("lang") === "en").as("pos"),
          expr("(1000 * size(array_distinct(split(text, ' ')))) " +
            "div size(split(text, ' '))").as("score"))
        .groupBy(expr("least(score div 100, 9)").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("score")).as("ssum"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("np"))
        .withColumn("mean_pred_milli", expr("ssum div n"))
        .withColumn("emp_milli", expr("(1000 * np) div n"))
        .withColumn("gap_milli", col("mean_pred_milli") - col("emp_milli"))
        .withColumn("wnum", sum(col("n") * abs(col("gap_milli"))).over(all))
        .withColumn("wden", sum(col("n")).over(all))
        .withColumn("ece_milli", expr("wnum div wden"))
        .select(col("bin"), col("n"), col("mean_pred_milli"),
          col("emp_milli"), col("gap_milli"), col("ece_milli"))
        .orderBy("bin")
    },
    Some("""WITH sc AS (
              SELECT (lang = 'en') AS pos,
                (1000 * len(list_distinct(string_split(text, ' '))))
                  // len(string_split(text, ' ')) AS score
              FROM documents),
            b AS (
              SELECT least(score // 100, 9) AS bin,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(score) AS BIGINT) AS ssum,
                CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
              FROM sc GROUP BY 1),
            g AS (
              SELECT bin, n, ssum // n AS mean_pred_milli,
                (1000 * np) // n AS emp_milli
              FROM b)
            SELECT bin, n, mean_pred_milli, emp_milli,
              mean_pred_milli - emp_milli AS gap_milli,
              CAST(SUM(n * abs(mean_pred_milli - emp_milli)) OVER ()
                // SUM(n) OVER () AS BIGINT) AS ece_milli
            FROM g ORDER BY bin"""))

  // ------------------------------------------------------------------- x267
  // Fleiss' kappa (1971) — x222's two-rater agreement generalized to the
  // panel: THREE independent binary quality raters (lexical diversity,
  // document length, mean bytes-per-token) judge every document, and the
  // chance-corrected panel agreement is the go/no-go before an ensemble
  // filter ships (raters that agree no better than chance measure
  // different things; near-1 means the panel is redundant). For n=3
  // raters / 2 categories only the per-document positive-vote count
  // c ∈ {0..3} matters: Pᵢ = (2c²−6c+6)/6, and clearing every
  // denominator gives κ_micro = 10⁶·(3N·S − 2·(T² + (3N−T)²)) div
  // (18N² − 2·(T² + (3N−T)²)) with S = Σ(2c²−6c+6), T = Σc — exact
  // integers end to end; N² rides DECIMAL(38,0)/HUGEINT (good to
  // N ≈ 10¹⁸ documents).
  //
  // Scale shape: one map-side-combinable 3-counter aggregate over the
  // fact scan; nothing else moves.
  private val x267 = GQuery(
    "x267_fleiss_kappa", "ext-text rater-agreement fleiss-kappa",
    (s, dir) => {
      val votes = docs(s, dir).select(
        (when(expr("(1000 * size(array_distinct(split(text, ' ')))) " +
            "div size(split(text, ' '))") >= 500L, 1L).otherwise(0L)
          + when(size(split(col("text"), " ")) >= 55, 1L).otherwise(0L)
          + when(expr("n_chars div size(split(text, ' '))") >= 5L, 1L)
            .otherwise(0L)).as("c"))
      votes
        .agg(count(lit(1)).as("n_docs"), sum(col("c")).as("t"),
          sum(lit(2L) * col("c") * col("c") - lit(6L) * col("c") + lit(6L))
            .as("s"))
        .select(col("n_docs"), col("t"), col("s"),
          expr("""cast((1000000 * (3 * cast(n_docs as decimal(38,0)) * s
                - 2 * (cast(t as decimal(38,0)) * t
                  + cast(3 * n_docs - t as decimal(38,0))
                    * (3 * n_docs - t))))
              div (18 * cast(n_docs as decimal(38,0)) * n_docs
                - 2 * (cast(t as decimal(38,0)) * t
                  + cast(3 * n_docs - t as decimal(38,0))
                    * (3 * n_docs - t))) as bigint)""").as("kappa_micro"))
    },
    Some("""WITH votes AS (
              SELECT
                (CASE WHEN (1000 * len(list_distinct(string_split(text, ' '))))
                    // len(string_split(text, ' ')) >= 500
                  THEN 1 ELSE 0 END
                + CASE WHEN len(string_split(text, ' ')) >= 55
                  THEN 1 ELSE 0 END
                + CASE WHEN n_chars // len(string_split(text, ' ')) >= 5
                  THEN 1 ELSE 0 END) AS c
              FROM documents),
            m AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(c) AS BIGINT) AS t,
                CAST(SUM(2 * c * c - 6 * c + 6) AS BIGINT) AS s
              FROM votes)
            SELECT n_docs, t, s,
              CAST((1000000 * (3 * CAST(n_docs AS HUGEINT) * s
                  - 2 * (CAST(t AS HUGEINT) * t
                    + CAST(3 * n_docs - t AS HUGEINT) * (3 * n_docs - t))))
                // (18 * CAST(n_docs AS HUGEINT) * n_docs
                  - 2 * (CAST(t AS HUGEINT) * t
                    + CAST(3 * n_docs - t AS HUGEINT) * (3 * n_docs - t)))
                AS BIGINT) AS kappa_micro
            FROM m"""))

  // ------------------------------------------------------------------- x275
  // Distinct l-diversity census (Machanavajjhala et al. 2007) — the audit
  // k-anonymity (x223) provably cannot cover: a group of 50 documents is
  // 50-anonymous yet leaks its sensitive attribute completely if all 50
  // share one value (the homogeneity attack). Quasi-identifier here is
  // (lang, length-bucket) with `source` as the sensitive attribute: per
  // QI group, l = COUNT(DISTINCT source), banded like x223 so the l=1
  // band is the release blocker and min_l is the headline number every
  // row carries. Pure integer group-bys.
  //
  // Scale shape: one (QI, sensitive) aggregate (map-side combinable),
  // one QI-grained distinct rollup, one band aggregate over the GROUP
  // table; the fact table is touched once. The min_l constant rides a
  // band-domain window.
  private val x275 = GQuery(
    "x275_l_diversity", "ext-docs privacy l-diversity census",
    (s, dir) => {
      val all = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val groups = docs(s, dir)
        .groupBy(col("lang"), expr("n_chars div 100").as("len_bucket"),
          col("source"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("lang"), col("len_bucket"))
        .agg(countDistinct(col("source")).as("l"), sum(col("cnt")).as("k"))
      groups
        .groupBy(when(col("l") === 1L, "1").when(col("l") <= 2L, "2")
          .when(col("l") <= 4L, "3-4").otherwise("5+").as("l_band"))
        .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_docs"),
          min(col("l")).as("band_min_l"))
        .withColumn("min_l", min(col("band_min_l")).over(all))
        .drop("band_min_l")
        .orderBy("l_band")
    },
    Some("""WITH g AS (
              SELECT lang, n_chars // 100 AS len_bucket,
                CAST(COUNT(DISTINCT source) AS BIGINT) AS l,
                CAST(COUNT(*) AS BIGINT) AS k
              FROM documents GROUP BY 1, 2),
            b AS (
              SELECT CASE WHEN l = 1 THEN '1' WHEN l <= 2 THEN '2'
                WHEN l <= 4 THEN '3-4' ELSE '5+' END AS l_band, l, k
              FROM g)
            SELECT l_band, CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(SUM(k) AS BIGINT) AS n_docs,
              CAST(MIN(MIN(l)) OVER () AS BIGINT) AS min_l
            FROM b GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x341
  // t-closeness census (Li, Li & Venkatasubramanian 2007) — the third
  // privacy audit l-diversity (x275) provably cannot cover: a group can
  // be 10-diverse yet still leak if its sensitive-value DISTRIBUTION
  // differs sharply from the table's (the skewness attack). Same QI as
  // x223/x275 — (lang, length-bucket) — with `source` sensitive; for a
  // categorical attribute under uniform ground distance, the paper's EMD
  // reduces to total variation distance, which stays in exact integers:
  // t·2·n_g·N = Σ_s |c_gs·N − C_s·n_g| (sources absent from the group
  // contribute C_s·n_g each, folded in closed form as (N − Σpresent)·n_g
  // rather than densifying the group×source grid). Banded like x275 with
  // the release-blocking max_t riding every row.
  //
  // Scale shape: one (QI, sensitive) aggregate off the fact table, a
  // broadcast of the source-domain marginal, one QI-partitioned window
  // over the skinny group×source table, one band rollup. The counts
  // enter the |·| products as DECIMAL(38,0): c·N is ~10²⁴ at 10¹² rows,
  // far past BIGINT.
  private val x341 = GQuery(
    "x341_t_closeness", "ext-docs privacy t-closeness census",
    (s, dir) => {
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val g = docs(s, dir)
        .groupBy(col("lang"), expr("n_chars div 100").as("len_bucket"),
          col("source"))
        .agg(count(lit(1)).as("c"))
      val glob = g.groupBy(col("source")).agg(sum(col("c")).as("cs"))
        .withColumn("n_total", sum(col("cs")).over(wAll))
      val wG = Window.partitionBy(col("lang"), col("len_bucket"))
      val grp = g.join(broadcast(glob), "source")
        .withColumn("n_g", sum(col("c")).over(wG))
        .groupBy(col("lang"), col("len_bucket"))
        .agg(max(col("n_g")).as("n_g"), max(col("n_total")).as("n_total"),
          sum(abs(col("c").cast("decimal(38,0)") * col("n_total")
            - col("cs").cast("decimal(38,0)") * col("n_g"))).as("present"),
          sum(col("cs")).as("present_cs"))
        .withColumn("t_milli", expr(
          """cast((1000 * (present
                 + cast(n_total - present_cs as decimal(38,0)) * n_g))
               div (2 * cast(n_g as decimal(38,0)) * n_total) as bigint)"""))
      grp
        .groupBy(when(col("t_milli") < 100, "a:0-99")
          .when(col("t_milli") < 300, "b:100-299")
          .when(col("t_milli") < 600, "c:300-599")
          .otherwise("d:600+").as("t_band"))
        .agg(count(lit(1)).as("n_groups"), sum(col("n_g")).as("n_docs"),
          max(col("t_milli")).as("band_max_t"))
        .withColumn("max_t_milli", max(col("band_max_t")).over(wAll))
        .orderBy("t_band")
    },
    Some("""WITH g AS (
              SELECT lang, n_chars // 100 AS len_bucket, source,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM documents GROUP BY 1, 2, 3),
            gmar AS (
              SELECT source, CAST(SUM(c) AS BIGINT) AS cs,
                CAST(SUM(SUM(c)) OVER () AS BIGINT) AS n_total
              FROM g GROUP BY 1),
            wg AS (
              SELECT g.lang, g.len_bucket, g.c, gmar.cs, gmar.n_total,
                CAST(SUM(g.c) OVER (PARTITION BY g.lang, g.len_bucket)
                  AS BIGINT) AS n_g
              FROM g JOIN gmar USING (source)),
            grp AS (
              SELECT lang, len_bucket, MAX(n_g) AS n_g,
                MAX(n_total) AS n_total,
                SUM(ABS(CAST(c AS HUGEINT) * n_total
                  - CAST(cs AS HUGEINT) * n_g)) AS present,
                CAST(SUM(cs) AS BIGINT) AS present_cs
              FROM wg GROUP BY 1, 2),
            t AS (
              SELECT *, CAST((1000 * (present
                    + CAST(n_total - present_cs AS HUGEINT) * n_g))
                  // (2 * CAST(n_g AS HUGEINT) * n_total) AS BIGINT)
                AS t_milli
              FROM grp)
            SELECT CASE WHEN t_milli < 100 THEN 'a:0-99'
                WHEN t_milli < 300 THEN 'b:100-299'
                WHEN t_milli < 600 THEN 'c:300-599'
                ELSE 'd:600+' END AS t_band,
              CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(SUM(n_g) AS BIGINT) AS n_docs,
              CAST(MAX(t_milli) AS BIGINT) AS band_max_t,
              CAST(MAX(MAX(t_milli)) OVER () AS BIGINT) AS max_t_milli
            FROM t GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x352
  // Dataset card (the per-source rows of a "Datasheets for Datasets"
  // release table, Gebru et al. 2021) — the one-glance composition,
  // volume, duplication and language-concentration summary a corpus
  // release ships with, per source plus the '__all__' rollup arm: doc /
  // language counts, total chars and whitespace tokens, mean length,
  // exact-duplicate rate (md5 text identity, the x01 tier), and the
  // dominant language with its share (rank-1 by count, ties to the
  // lexicographically first lang — deterministic both engines). Every
  // cell an integer or a floor-division milli.
  //
  // Scale shape: one corpus scan feeding a source-domain rollup (the
  // md5-distinct is the only wide aggregate, and it is the x01 dedup
  // shuffle the release pipeline already paid for); the top-lang rank
  // rides a (source, lang)-domain window, never the fact table.
  private val x352 = GQuery(
    "x352_dataset_card", "ext-docs release datasheet per source",
    (s, dir) => {
      val base = docs(s, dir)
        .select(col("source"), col("lang"), col("n_chars"), col("text"))
      val both = base.unionAll(base.withColumn("source", lit("__all__")))
      val per = both.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
          countDistinct(md5(col("text"))).as("n_unique"))
      val wr = Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("lang"))
      val top = both.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(wr))
        .where(col("rk") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("c").as("top_lang_docs"))
      per.join(top, "source")
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("total_chars"), col("total_tokens"),
          expr("cast(total_chars div n_docs as bigint)").as("mean_chars"),
          expr("cast((1000 * (n_docs - n_unique)) div n_docs as bigint)")
            .as("dup_milli"),
          col("top_lang"),
          expr("cast((1000 * top_lang_docs) div n_docs as bigint)")
            .as("top_lang_milli"))
        .orderBy("source")
    },
    Some("""WITH base AS (
              SELECT source, lang, n_chars, text FROM documents
              UNION ALL
              SELECT '__all__' AS source, lang, n_chars, text
              FROM documents),
            per AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                  AS total_tokens,
                CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
              FROM base GROUP BY 1),
            lc AS (
              SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
              FROM base GROUP BY 1, 2),
            top AS (
              SELECT source, lang AS top_lang, c AS top_lang_docs
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY c DESC, lang) AS rk FROM lc)
              WHERE rk = 1)
            SELECT p.source, p.n_docs, p.n_langs, p.total_chars,
              p.total_tokens,
              CAST(p.total_chars // p.n_docs AS BIGINT) AS mean_chars,
              CAST((1000 * (p.n_docs - p.n_unique)) // p.n_docs AS BIGINT)
                AS dup_milli,
              t.top_lang,
              CAST((1000 * t.top_lang_docs) // p.n_docs AS BIGINT)
                AS top_lang_milli
            FROM per p JOIN top t ON p.source = t.source
            ORDER BY 1"""))

  // ------------------------------------------------------------------- x363
  // Shard balance audit — the acceptance check run AFTER x36's
  // deterministic shuffle and before a training job trusts its shards:
  // per shard, the total-variation distance between the shard's SOURCE
  // mix and the corpus mix, in ppm. A well-mixed shuffle puts every
  // shard's TVD near 0; a shard that over-drew one source (a broken
  // hash, a sorted input leaking through) flags immediately. The shard
  // assignment is trainingShuffle's OWN rule (the x31 no-drift
  // discipline — auditing a re-implementation would certify nothing).
  // Exact integers: TVD = ½ Σ_s |n_ss/n_shard − n_s/N| cross-multiplies
  // to |n_ss·N − n_s·n_shard| over a common denominator; sources ABSENT
  // from a shard contribute their full expected mass, folded in closed
  // form as n_shard·(N − Σ_observed n_s) — no dense shard×source
  // lattice is ever materialized. The 2 % flag threshold is the
  // conventional mix-tolerance read, emitted so the flag math itself
  // hash-verifies. Products ride DECIMAL(38,0)/HUGEINT (n_ss·N wraps
  // BIGINT past ~10⁹·10¹⁰ docs — the x270 headroom discipline).
  //
  // Scale shape: one shard assignment scan → (shard, source) rollup
  // (map-side combinable, ≤ 16·|sources| rows) → two domain-sized
  // rollups join back → one |shards|-row output. The window-rank `pos`
  // of x36 is deliberately NOT computed — membership alone decides
  // balance, so the audit is cheaper than the shuffle it audits.
  private val x363 = GQuery(
    "x363_shard_balance_audit", "ext-text shard-mix balance audit",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"))
      val cells = trainingShuffle(d, shardHexChars = 1)
        .join(d, Seq("doc_id"))
        .groupBy(col("shard"), col("source"))
        .agg(count(lit(1)).as("n_ss"))
        .localCheckpoint(true) // source totals, shard totals, dev scan
      val srcTot = cells.groupBy(col("source")).agg(sum(col("n_ss")).as("n_src"))
      val shardTot = cells.groupBy(col("shard")).agg(sum(col("n_ss")).as("n_shard"))
      val n = d.agg(count(lit(1)).as("n_total"))
      cells.join(srcTot, Seq("source")).join(shardTot, Seq("shard"))
        .crossJoin(broadcast(n))
        .groupBy(col("shard"), col("n_shard"), col("n_total"))
        .agg(sum(expr(
            """abs(cast(n_ss as decimal(38,0)) * n_total
                 - cast(n_src as decimal(38,0)) * n_shard)""")).as("num_obs"),
          sum(col("n_src")).as("obs_src"))
        .select(col("shard"), col("n_shard").as("n_docs"),
          expr("""cast((1000000 * (num_obs
                 + cast(n_shard as decimal(38,0)) * (n_total - obs_src)))
               div (2 * cast(n_shard as decimal(38,0)) * n_total)
             as bigint)""").as("tvd_ppm"))
        .withColumn("balanced", col("tvd_ppm") <= 20000L)
        .orderBy("shard")
    },
    Some("""WITH d AS (SELECT doc_id, source FROM documents),
            a AS (SELECT substr(md5(doc_id || ':42'), 1, 1) AS shard, source
                  FROM d),
            cells AS (SELECT shard, source, CAST(COUNT(*) AS BIGINT) AS n_ss
                      FROM a GROUP BY 1, 2),
            st AS (SELECT source, CAST(SUM(n_ss) AS BIGINT) AS n_src
                   FROM cells GROUP BY 1),
            sh AS (SELECT shard, CAST(SUM(n_ss) AS BIGINT) AS n_shard
                   FROM cells GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM d),
            g AS (SELECT cells.shard, n_shard, n_total,
                SUM(abs(CAST(n_ss AS HUGEINT) * n_total
                  - CAST(n_src AS HUGEINT) * n_shard)) AS num_obs,
                CAST(SUM(n_src) AS HUGEINT) AS obs_src
              FROM cells JOIN st USING (source) JOIN sh USING (shard)
              CROSS JOIN n
              GROUP BY 1, 2, 3)
            SELECT shard, n_shard AS n_docs,
              CAST((1000000 * (num_obs
                  + CAST(n_shard AS HUGEINT) * (n_total - obs_src)))
                // (2 * CAST(n_shard AS HUGEINT) * n_total) AS BIGINT)
                AS tvd_ppm,
              (1000000 * (num_obs
                  + CAST(n_shard AS HUGEINT) * (n_total - obs_src)))
                // (2 * CAST(n_shard AS HUGEINT) * n_total) <= 20000
                AS balanced
            FROM g ORDER BY shard"""))

  // ------------------------------------------------------------------- x371
  // Neyman allocation (Neyman 1934) — the OPTIMAL stratified sampling
  // plan x21's proportional split approximates: allocate a 10 000-doc
  // budget across language strata ∝ N_h·S_h (stratum size × stratum
  // std-dev of n_chars), the allocation that minimizes the estimator
  // variance for a fixed budget. A high-variance stratum earns MORE
  // than its proportional share — the table emits both allocations so
  // the divergence is the readable payload. Arithmetic discipline: the
  // variance numerator n·Σx²−(Σx)² is exact DECIMAL(38,0)/HUGEINT; the
  // one unavoidable sqrt rides the x228 round-after-sqrt rule (both
  // engines evaluate the IDENTICAL double from the identical exact
  // integers, so the milli-quantized S_h matches), and everything after
  // quantization is integer cross-multiplied floor division. A
  // single-doc stratum has variance 0 and honestly earns 0.
  //
  // Scale shape: one fact scan to a 3-moment per-language rollup
  // (map-side combinable), then |langs|-domain window arithmetic.
  private val x371 = GQuery(
    "x371_neyman_allocation", "ext-text sampling neyman allocation",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      docs(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_h"),
          sum(col("n_chars").cast("decimal(38,0)")).as("sx"),
          sum(col("n_chars").cast("decimal(38,0)") * col("n_chars")).as("sxx"))
        .withColumn("sd_milli", expr(
          """cast(round(sqrt(cast(n_h * sxx - sx * sx as double))
               / n_h * 1000, 0) as bigint)"""))
        .withColumn("w_h", col("n_h") * col("sd_milli"))
        .withColumn("tot_w", sum(col("w_h")).over(wAll))
        .withColumn("tot_n", sum(col("n_h")).over(wAll))
        .select(col("lang"), col("n_h"), col("sd_milli"),
          expr("""cast(case when tot_w > 0
               then (10000 * w_h) div tot_w end as bigint)""")
            .as("neyman_alloc"),
          expr("cast((10000 * n_h) div tot_n as bigint)")
            .as("proportional_alloc"))
        .orderBy("lang")
    },
    Some("""WITH g AS (
              SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_h,
                SUM(CAST(n_chars AS HUGEINT)) AS sx,
                SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sxx
              FROM documents GROUP BY 1),
            sdv AS (
              SELECT lang, n_h,
                CAST(round(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE))
                  / n_h * 1000, 0) AS BIGINT) AS sd_milli
              FROM g),
            w AS (
              SELECT *, n_h * sd_milli AS w_h,
                CAST(SUM(n_h * sd_milli) OVER () AS BIGINT) AS tot_w,
                CAST(SUM(n_h) OVER () AS BIGINT) AS tot_n
              FROM sdv)
            SELECT lang, n_h, sd_milli,
              CAST(CASE WHEN tot_w > 0 THEN (10000 * w_h) // tot_w END
                AS BIGINT) AS neyman_alloc,
              CAST((10000 * n_h) // tot_n AS BIGINT) AS proportional_alloc
            FROM w ORDER BY lang"""))

  // ------------------------------------------------------------------- x372
  // Reshard move plan — the migration-cost table read BEFORE growing
  // x36's shard count (the consistent-hashing motivation, Karger et al.
  // 1997, measured on this corpus's own assignment hash): for each
  // growth path, how many documents change shards. Mod-hashing pays
  // catastrophically (16→17 moves ~16/17 of the corpus; even the
  // friendly 16→32 doubling moves half), while x36's hex-PREFIX scheme
  // splits shards in place — width 1→2 moves ZERO docs across old
  // boundaries, the property that makes it the production choice and
  // why its growth factor is locked to 16. All three counts are exact
  // integer comparisons on the same md5(doc_id:42) hash the shuffle
  // itself uses (the x31 no-drift discipline).
  //
  // Scale shape: one map-only scan per strategy over the assignment
  // hash (explode of a 3-literal strategy lattice inside the scan), one
  // 3-row rollup. Nothing shuffles but the rollup.
  private val x372 = GQuery(
    "x372_reshard_move_plan", "ext-text layout reshard migration cost",
    (s, dir) => {
      docs(s, dir)
        .select(expr(
          "CAST(conv(substring(md5(concat(doc_id, ':42')), 1, 8), 16, 10) AS BIGINT)")
          .as("h"),
          // old assignment (x36's width-1 shard) and the width-2 target:
          // the prefix check below is the scheme's refinement property,
          // measured rather than asserted
          expr("substring(md5(concat(doc_id, ':42')), 1, 1)").as("p1"),
          expr("substring(md5(concat(doc_id, ':42')), 1, 2)").as("p2"))
        .select(col("h"), col("p1"), col("p2"), explode(expr(
          """array('mod_16_to_17', 'mod_16_to_32', 'prefix_16_to_256')"""))
          .as("strategy"))
        .withColumn("moved", expr(
          """case strategy
               when 'mod_16_to_17' then cast(h % 16 != h % 17 as long)
               when 'mod_16_to_32' then cast(h % 16 != h % 32 as long)
               else cast(substring(p2, 1, 1) != p1 as long)
             end"""))
        .groupBy(col("strategy"))
        .agg(count(lit(1)).as("n_docs"), sum(col("moved")).as("n_moved"))
        .withColumn("move_ppm", expr("(1000000 * n_moved) div n_docs"))
        .orderBy("strategy")
    },
    Some("""WITH h AS (
              SELECT CAST(CAST(CONCAT('0x',
                  substr(md5(doc_id || ':42'), 1, 8)) AS UBIGINT) AS BIGINT)
                  AS h,
                substr(md5(doc_id || ':42'), 1, 1) AS p1,
                substr(md5(doc_id || ':42'), 1, 2) AS p2
              FROM documents),
            f AS (
              SELECT strategy,
                CASE strategy
                  WHEN 'mod_16_to_17' THEN
                    CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END
                  WHEN 'mod_16_to_32' THEN
                    CASE WHEN h % 16 <> h % 32 THEN 1 ELSE 0 END
                  ELSE CASE WHEN substr(p2, 1, 1) <> p1
                    THEN 1 ELSE 0 END
                END AS moved
              FROM h CROSS JOIN (SELECT unnest(['mod_16_to_17',
                'mod_16_to_32', 'prefix_16_to_256']) AS strategy))
            SELECT strategy, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(moved) AS BIGINT) AS n_moved,
              (1000000 * CAST(SUM(moved) AS BIGINT))
                // CAST(COUNT(*) AS BIGINT) AS move_ppm
            FROM f GROUP BY 1 ORDER BY 1"""))

  // ------------------------------------------------------------------- x393
  // Split balance audit — is x157's hash split biased by language? Per
  // (lang, split) cell: docs, the lang's observed split share in exact
  // millis, the DESIGN share (md5 first-two-hex thresholds 'cc'/'e6' =
  // 204/26/26 of 256 → 796/101/101 milli, floor), and the deviation. A
  // sound hash split deviates only by sampling noise; a systematic
  // dev_milli on one language means the split KEY correlates with
  // language (e.g. id ranges assigned per source) and the x21/x371
  // stratified plans should be keyed differently. Uses x157's exact
  // split rule (md5(doc_id || ':split')) so the audit and the split
  // can never drift.
  //
  // Scale shape: one map-side projection, a (lang, split) dimension-
  // grid rollup, a lang-domain broadcast of totals.
  private val x393 = GQuery(
    "x393_split_balance_audit", "ext-text split-hygiene balance",
    (s, dir) => {
      val d = docs(s, dir)
        .select(col("lang"),
          expr("""case when substring(md5(concat(cast(doc_id as string),
               ':split')), 1, 2) < 'cc' then 'train'
             when substring(md5(concat(cast(doc_id as string),
               ':split')), 1, 2) < 'e6' then 'val'
             else 'test' end""").as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
      val l = d.groupBy(col("lang")).agg(sum(col("n_docs")).as("n_lang"))
      d.join(l, Seq("lang"))
        .select(col("lang"), col("split"), col("n_docs"), col("n_lang"),
          expr("(1000 * n_docs) div n_lang").as("share_milli"),
          expr("""cast(case split when 'train' then 796
               when 'val' then 101 else 101 end as bigint)""")
            .as("expected_milli"))
        .withColumn("dev_milli", expr("share_milli - expected_milli"))
        .orderBy("lang", "split")
    },
    Some("""WITH d AS (SELECT lang,
                    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                        1, 2) < 'cc' THEN 'train'
                      WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                        1, 2) < 'e6' THEN 'val'
                      ELSE 'test' END AS split
                  FROM documents),
            g AS (SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM d GROUP BY 1, 2),
            l AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_lang
                  FROM g GROUP BY 1)
            SELECT g.lang, g.split, g.n_docs, l.n_lang,
              (1000 * g.n_docs) // l.n_lang AS share_milli,
              CAST(CASE g.split WHEN 'train' THEN 796 WHEN 'val' THEN 101
                ELSE 101 END AS BIGINT) AS expected_milli,
              (1000 * g.n_docs) // l.n_lang
                - CASE g.split WHEN 'train' THEN 796 WHEN 'val' THEN 101
                    ELSE 101 END AS dev_milli
            FROM g JOIN l USING (lang) ORDER BY lang, split"""))

  val queries: Seq[GQuery] =
    Seq(x34, x35, x36, x37, x38, x41, x42, x43, x44, x51, x79, x82, x84, x87,
      x90, x93, x94, x96, x97, x98, x104, x119, x120, x121, x122, x143, x157,
      x176, x191, x202, x219, x222, x223, x226, x233, x235, x247, x251, x253,
      x257, x259, x263, x264, x265, x266, x267, x275, x341, x352, x363,
      x371, x372, x393)
}
