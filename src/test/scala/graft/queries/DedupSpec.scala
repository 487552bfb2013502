package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Semantics of the hash-seeded dedup operators (no SQL oracle — these
  * assertions are their correctness gate).
  */
class DedupSpec extends SparkSpec {

  private def clusters(name: String) =
    SparkEntry.queries(name)(spark, sf001).cache()

  for (name <- Seq("x03_dedup_minhash_lsh", "x04_dedup_simhash")) {
    test(s"$name: one row per doc, keeper <= doc_id, keepers are roots") {
      val df = clusters(name)
      val docs = Tables(spark, sf001, "documents")
      assert(df.count() == docs.count(), "cluster assignment must cover corpus")
      assert(df.where(col("keeper") > col("doc_id")).count() == 0)
      // exact duplicates (identical text) must collapse to one keeper
      val exactDupGroups = docs.groupBy("text")
        .agg(collect_list("doc_id").as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(col("ids")).as("doc_id"), col("ids"))
      val joined = exactDupGroups.join(df, "doc_id")
        .groupBy("ids").agg(countDistinct("keeper").as("nk"))
      assert(joined.where(col("nk") > 1).count() == 0,
        s"$name: identical texts assigned different keepers")
    }
  }

  test("x03 minhash: permuted near-identical docs cluster, disjoint docs do not") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " other1 other2"
    val disjoint = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = Seq((0L, base), (1L, nearDup), (2L, disjoint)).toDF("doc_id", "text")
    df.createOrReplaceTempView("___dedup_probe") // not used; direct API below

    val k = 32
    val sigs = df.select(col("doc_id"),
      graft.functions.HashFunctions.minhashSig(
        array_distinct(split(col("text"), " ")), k).as("sig"))
    val agg = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        graft.functions.HashFunctions.sigAgreement(col("a.sig"), col("b.sig")).as("agree"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(agg((0L, 1L)) >= math.ceil(0.7 * k).toLong, s"near-dups agree: ${agg((0L, 1L))}/$k")
    assert(agg((0L, 2L)) <= k / 4, s"disjoint docs must not agree: ${agg((0L, 2L))}/$k")
  }

  test("shingled (ngram=3) minhash keeps word order; unigram cannot") {
    import spark.implicits._
    val k = 32
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val shuffled = new scala.util.Random(7)
      .shuffle((1 to 60).map(i => s"tok$i").toList).mkString(" ")
    val nearDup = ((1 to 58).map(i => s"tok$i") ++ Seq("other1", "other2")).mkString(" ")
    val df = Seq((0L, base), (1L, shuffled), (2L, nearDup)).toDF("doc_id", "text")
    def agreeWith(ngram: Int): Map[(Long, Long), Long] = {
      val sigs = df.select(col("doc_id"),
        graft.functions.HashFunctions.minhashSig(split(col("text"), " "), k, ngram).as("sig"))
      sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
          graft.functions.HashFunctions.sigAgreement(col("a.sig"), col("b.sig")).as("agree"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val uni = agreeWith(1)
    val tri = agreeWith(3)
    // unigram token sets are order-blind: the shuffled doc looks identical
    assert(uni((0L, 1L)) == k.toLong, "unigram: same token set => same signature")
    // 3-gram shingles see the reordering: near-zero agreement
    assert(tri((0L, 1L)) <= k / 4, s"shingles must punish reordering: ${tri((0L, 1L))}/$k")
    // while a genuine near-duplicate (shared prefix run) still agrees highly
    assert(tri((0L, 2L)) >= math.ceil(0.7 * k).toLong,
      s"shingles keep near-dup recall: ${tri((0L, 2L))}/$k")
  }
}
