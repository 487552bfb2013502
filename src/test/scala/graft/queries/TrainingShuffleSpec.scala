package graft.queries

import graft.{SparkSpec, Tables}

/** Gates for the x36 deterministic training shuffle: the shard-key width
  * parameter must be exactly realized (the scale knob the scaladoc
  * promises — 16^w shards, sized with the cluster), and per-shard
  * positions must be a contiguous ranking.
  */
class TrainingShuffleSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("realized shard set matches the width parameter exactly (w = 1, 2, 3)") {
    val d = Tables(spark, sf001, "documents")
    val ids = d.select("doc_id").collect().map(_.getLong(0))
    for (w <- Seq(1, 2, 3)) {
      // the md5 coin is deterministic, so the exact shard set is computable
      // driver-side — not just bounds, byte-for-byte agreement
      val expected = ids.map(i => md5hex(s"$i:42").take(w)).toSet
      val got = CorpusOps.trainingShuffle(d, w)
        .select("shard").distinct().collect().map(_.getString(0)).toSet
      assert(got == expected, s"width $w: realized shards diverge from md5")
      assert(got.forall(_.length == w))
    }
  }

  test("positions are a contiguous 1..n ranking within every shard") {
    val rows = CorpusOps.trainingShuffle(Tables(spark, sf001, "documents"), 2)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(rows.length == Tables(spark, sf001, "documents").count())
    for ((shard, ps) <- rows.groupBy(_._1))
      assert(ps.map(_._2).sorted.toSeq == (1L to ps.length).toSeq,
        s"shard $shard positions are not contiguous")
  }
}
