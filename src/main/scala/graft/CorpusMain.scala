package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus materialization CLI — the end-to-end artifact of the
  * LLM-pipeline operator family: documents in → deduplicated,
  * quality-gated, fingerprinted corpus out, written partitioned by
  * language (the read-side pruning key for per-language training jobs).
  *
  * Base pipeline (all one narrow pass + one fingerprint-keyed window
  * shuffle — document text is projected away before the only exchange,
  * the x19 shape):
  *   1. content fingerprint (xxhash64) + token stats in the scan projection
  *   2. exact dedup: keep the min-doc_id copy per fingerprint
  *   3. quality gate: n_tokens >= 20 and uniq_ratio >= 0.3
  *   4. tiering + md5 content digest (x12/x14 semantics)
  *   5. partitionBy(lang) parquet write
  *
  * Opt-in stages (round 10) — each is the SAME code as its oracle-
  * verified registry row (the x31 discipline: the CLI cannot drift from
  * what correctness pins), composed between the base gate and the write:
  *   - `neardup`   — exact near-duplicate keeper: drop every document
  *     that is not its transitive cluster's minimum id
  *     ([[graft.queries.Dedup.allPairsClusters]] — the x225/x236 exact
  *     prefix-filter tier; lossless, no LSH seeds).
  *   - `decontam`  — benchmark decontamination: drop every document
  *     sharing a word-6-gram with the held-out benchmark slice
  *     ([[graft.queries.Text.contaminationHits]] — x24's exact hash
  *     join; x39's Bloom form is the same decision at sketch cost).
  *   - `substrclean` — substring-dedup annotation: per-document cleaned
  *     length, cut count, and cleaned-content fingerprint from Lee et
  *     al.'s ExactSubstr surgery ([[graft.queries.CorpusOps
  *     .substringClean]] — x87), carried as columns so a downstream
  *     trainer can choose the cleaned text without re-running the sweep.
  *
  * Usage: runMain graft.CorpusMain <sfDir> <outDir> [stage,stage,...]
  */
object CorpusMain {

  final case class CorpusStats(rowsIn: Long, kept: Long, langs: Long)

  val KnownStages: Set[String] = Set("neardup", "decontam", "substrclean")

  def run(spark: SparkSession, sfDir: String, outDir: String,
      stages: Set[String] = Set.empty): CorpusStats = {
    val unknown = stages -- KnownStages
    require(unknown.isEmpty,
      s"unknown stages: ${unknown.mkString(",")} (known: ${KnownStages.mkString(",")})")
    val docs = Tables(spark, sfDir, "documents")
    val rowsIn = docs.count()

    // selection shared with the oracle-verified x19 query — one definition,
    // so the shipped corpus cannot drift from what correctness checks pin
    var corpus: DataFrame = graft.queries.Dedup
      .cleanCorpus(docs, extras = Seq("digest" -> md5(col("text"))))
      .withColumn("quality",
        when(col("n_tokens") >= 50 && col("uniq_ratio") >= 0.5, "good")
          .otherwise("ok"))
      .select("doc_id", "lang", "source", "n_tokens", "uniq_ratio", "quality", "digest")

    if (stages("neardup")) {
      // x236's labels: a document survives iff it IS its cluster keeper.
      // Semi-join on the keeper set — the label table is corpus-keyed and
      // the join carries (long, long) only.
      val keepers = graft.queries.Dedup.allPairsClusters(docs)
        .where(col("doc_id") === col("keeper")).select("doc_id")
      corpus = corpus.join(keepers, Seq("doc_id"), "left_semi")
    }
    if (stages("decontam")) {
      // x24's hit set: any document with >= 1 leaked benchmark shingle
      // leaves. Anti-join on the (rare-by-construction) hit table.
      val hits = graft.queries.Text.contaminationHits(docs).select("doc_id")
      corpus = corpus.join(hits, Seq("doc_id"), "left_anti")
    }
    if (stages("substrclean")) {
      // x87's surgery stats as annotation columns; documents untouched by
      // the sweep carry their original length and the n_cut=0 marker
      // (clean_fp = md5 of the UNMODIFIED text then, by x87's definition).
      val cs = graft.queries.CorpusOps.substringClean(docs, k = 20)
        .select("doc_id", "clean_len", "n_cut", "clean_fp")
      corpus = corpus.join(cs, Seq("doc_id"), "left")
    }

    corpus.write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(outDir)

    val out = spark.read.parquet(outDir)
    CorpusStats(rowsIn, out.count(), out.select("lang").distinct().count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2 || args.length == 3,
      "usage: CorpusMain <sfDir> <outDir> [stage,stage,...]")
    val stages = if (args.length == 3)
      args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
    else Set.empty[String]
    val spark = GraftSession.local("graft-corpus", 8)
    val st = run(spark, args(0), args(1), stages)
    println(s"CORPUS rows_in=${st.rowsIn} kept=${st.kept} langs=${st.langs}")
    spark.stop()
  }
}
