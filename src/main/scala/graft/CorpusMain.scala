package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus materialization CLI — the end-to-end artifact of the
  * LLM-pipeline operator family: documents in → deduplicated,
  * quality-gated, fingerprinted corpus out, written partitioned by
  * language (the read-side pruning key for per-language training jobs).
  *
  * Pipeline (all one narrow pass + one fingerprint-keyed window shuffle —
  * document text is projected away before the only exchange, the x19 shape):
  *   1. content fingerprint (xxhash64) + token stats in the scan projection
  *   2. exact dedup: keep the min-doc_id copy per fingerprint
  *   3. quality gate: n_tokens >= 20 and uniq_ratio >= 0.3
  *   4. tiering + md5 content digest (x12/x14 semantics)
  *   5. partitionBy(lang) parquet write
  *
  * Usage: runMain graft.CorpusMain <sfDir> <outDir>
  */
object CorpusMain {

  final case class CorpusStats(rowsIn: Long, kept: Long, langs: Long)

  def run(spark: SparkSession, sfDir: String, outDir: String): CorpusStats = {
    val docs = Tables(spark, sfDir, "documents")
    val rowsIn = docs.count()

    // selection shared with the oracle-verified x19 query — one definition,
    // so the shipped corpus cannot drift from what correctness checks pin
    val corpus: DataFrame = graft.queries.Dedup
      .cleanCorpus(docs, extras = Seq("digest" -> md5(col("text"))))
      .withColumn("quality",
        when(col("n_tokens") >= 50 && col("uniq_ratio") >= 0.5, "good")
          .otherwise("ok"))
      .select("doc_id", "lang", "source", "n_tokens", "uniq_ratio", "quality", "digest")

    corpus.write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(outDir)

    val out = spark.read.parquet(outDir)
    CorpusStats(rowsIn, out.count(), out.select("lang").distinct().count())
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CorpusMain <sfDir> <outDir>")
    val spark = GraftSession.local("graft-corpus", 8)
    val st = run(spark, args(0), args(1))
    println(s"CORPUS rows_in=${st.rowsIn} kept=${st.kept} langs=${st.langs}")
    spark.stop()
  }
}
