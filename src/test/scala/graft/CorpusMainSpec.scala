package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._

/** End-to-end corpus materialization: documents in → partitioned,
  * deduplicated, quality-gated parquet corpus out, consistent with the
  * oracle-verified x19 selection.
  */
class CorpusMainSpec extends SparkSpec {

  test("materialized corpus matches x19 selection and partitions by lang") {
    val out = Files.createTempDirectory("graft-corpus").resolve("corpus").toString
    val st = CorpusMain.run(spark, sf001, out)
    assert(st.rowsIn == 500)

    // selection must agree with the oracle-verified clean-corpus query
    val x19Ids = SparkEntry.queries("x19_clean_corpus")(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val corpus = spark.read.parquet(out)
    val keptIds = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == x19Ids, "CLI selection == x19 oracle selection")
    assert(st.kept == x19Ids.size && st.langs >= 2)

    // physical layout: hive-style lang= partitions for read-side pruning
    val dirs = Files.list(java.nio.file.Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lang=")).toList
    assert(dirs.size == st.langs, s"one partition dir per language: $dirs")

    // dedup + digest invariants
    assert(corpus.select("digest").distinct().count() == st.kept,
      "one distinct content digest per kept row")
    assert(corpus.where(col("quality").isin("good", "ok")).count() == st.kept)
  }
}
