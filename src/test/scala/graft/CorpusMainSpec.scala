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

  // ---- opt-in stages (round 10): each must be FLAG-SET-EQUAL with its
  // standalone oracle-verified registry query — the x31 discipline makes
  // this structural (same code), these rows prove the composition didn't
  // break it (joins, ordering, base-gate interaction).

  private def baseIds: Set[Long] =
    SparkEntry.queries("x19_clean_corpus")(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("neardup stage keeps exactly x236's cluster keepers") {
    val out = Files.createTempDirectory("graft-corpus-nd").resolve("c").toString
    CorpusMain.run(spark, sf001, out, stages = Set("neardup"))
    val kept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keepers = SparkEntry.queries("x236_allpairs_clusters")(spark, sf001)
      .where(col("doc_id") === col("keeper"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (baseIds intersect keepers),
      "CLI neardup selection == base gate ∩ x236 keepers")
  }

  test("decontam stage drops exactly x24's contaminated set") {
    val out = Files.createTempDirectory("graft-corpus-dc").resolve("c").toString
    CorpusMain.run(spark, sf001, out, stages = Set("decontam"))
    val kept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hits = SparkEntry.queries("x24_decontaminate")(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (baseIds diff hits),
      "CLI decontam selection == base gate minus x24 hits")
  }

  test("substrclean stage carries x87's columns verbatim") {
    val out = Files.createTempDirectory("graft-corpus-sc").resolve("c").toString
    CorpusMain.run(spark, sf001, out, stages = Set("substrclean"))
    val got = spark.read.parquet(out)
      .select("doc_id", "clean_len", "n_cut", "clean_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val ref = SparkEntry.queries("x87_substring_clean")(spark, sf001)
      .select("doc_id", "clean_len", "n_cut", "clean_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .filter { case (id, _, _, _) => baseIds(id) }.toSet
    assert(got == ref, "CLI substrclean columns == x87 rows on the kept set")
  }

  test("unknown stage names are rejected loudly") {
    val out = Files.createTempDirectory("graft-corpus-bad").resolve("c").toString
    intercept[IllegalArgumentException] {
      CorpusMain.run(spark, sf001, out, stages = Set("neardup", "typo"))
    }
  }
}
