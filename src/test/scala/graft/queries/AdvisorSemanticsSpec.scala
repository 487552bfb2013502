package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Pins the decision semantics of the round-11 advisor rows that a
  * value-hash oracle alone cannot distinguish from a lucky constant:
  * the x354 verdict logic must actually DISCRIMINATE (the self-review
  * found its negative control certifying as 'fk' — these tests make
  * that regression impossible to reintroduce silently), and the x357
  * SRM flag must fire exactly at the χ² critical value.
  */
class AdvisorSemanticsSpec extends SparkSpec {

  test("x354: the spurious-IND control reads 'inclusion', never 'fk'") {
    val rows = SparkEntry.queries("x354_fk_discovery")(spark, sf001)
      .collect().map(r => (r.getAs[String]("child"),
        r.getAs[String]("parent"), r.getAs[String]("verdict"),
        r.getAs[Long]("containment_milli"), r.getAs[Long]("coverage_milli")))
    val control = rows.find(r => r._1 == "lineitem.l_suppkey" &&
      r._2 == "customer.c_custkey").get
    // the control IS a true numeric inclusion (containment 1000) — the
    // whole point of the coverage leg is that this must NOT read 'fk'
    assert(control._4 == 1000L, s"control containment: $control")
    assert(control._3 == "inclusion", s"control verdict: $control")
    assert(control._5 < 500L, s"control coverage: $control")
    // every real FK on the menu still certifies
    val real = rows.filter(r => r._2 != "customer.c_custkey" ||
      r._1 == "orders.o_custkey")
    assert(real.nonEmpty && real.forall(_._3 == "fk"),
      s"real FKs must read fk: ${real.mkString("; ")}")
  }

  test("x357: chi2 is exact and the flag fires at the critical value") {
    val rows = SparkEntry.queries("x357_srm_guard")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val chi2 = r.getAs[Long]("chi2_micro")
      val d = BigInt(na - nb)
      assert(chi2 == (BigInt(1000000) * d * d / BigInt(na + nb)).toLong,
        s"chi2 mismatch for $r")
      assert(r.getAs[Boolean]("srm_flag") == (chi2 >= 3841459L))
    }
  }

  test("x356: RI/ARI match a driver-side reimplementation on the fixture") {
    val row = SparkEntry.queries("x356_clustering_agreement")(spark, sf001)
      .collect().head
    // independent pair-counting from the two label tables
    val a = Dedup.storedClusters(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SparkEntry.queries("x333_simhash_exact")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = a.size
    def pairs(m: Map[Long, Long]): Long = m.values.groupBy(identity)
      .map { case (_, v) => val s = v.size.toLong; s * (s - 1) / 2 }.sum
    val pij = a.keys.toSeq.map(k => (a(k), b(k))).groupBy(identity)
      .map { case (_, v) => val s = v.size.toLong; s * (s - 1) / 2 }.sum
    val (pa, pb) = (pairs(a), pairs(b))
    val pn = n.toLong * (n - 1) / 2
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("pairs_both") == pij)
    assert(row.getAs[Long]("pairs_exact") == pa)
    assert(row.getAs[Long]("pairs_simhash") == pb)
    val ri = BigInt(1000) * (BigInt(pn) + 2 * BigInt(pij) - pa - pb) / pn
    assert(row.getAs[Long]("rand_milli") == ri.toLong)
    val num = BigInt(2000) * (BigInt(pij) * pn - BigInt(pa) * pb)
    val den = BigInt(pn) * (BigInt(pa) + pb) - 2 * BigInt(pa) * pb
    if (den != 0) assert(row.getAs[Long]("ari_milli") == (num / den).toLong)
  }

  test("x387 trigger advisor: distribution replays against a driver-side recount") {
    val rows = SparkEntry.queries("x387_trigger_interval_advisor")(spark, sf001)
      .orderBy("trigger_sec").collect()
    assert(rows.map(_.getAs[Long]("trigger_sec")).toSeq == Seq(60L, 300L, 900L))
    val ts = graft.Tables(spark, sf001, "events")
      .selectExpr("unix_micros(ts) as us").collect().map(_.getLong(0))
    rows.foreach { r =>
      val t = r.getAs[Long]("trigger_sec")
      val counts = ts.groupBy(us => us / (t * 1000000L)).values
        .map(_.length.toLong).toSeq.sorted
      val nb = counts.length.toLong
      def nearestRank(p: Int): Long =
        counts(((nb * p + 99) / 100 - 1).toInt.max(0))
      assert(r.getAs[Long]("n_batches") == nb)
      assert(r.getAs[Long]("rows_p50") == nearestRank(50), s"p50 at $t")
      assert(r.getAs[Long]("rows_p95") == nearestRank(95), s"p95 at $t")
      assert(r.getAs[Long]("rows_max") == counts.last)
      assert(r.getAs[Long]("max_share_milli") == 1000L * counts.last / counts.sum)
      assert(r.getAs[Long]("rows_p50") <= r.getAs[Long]("rows_p95"))
      assert(r.getAs[Long]("rows_p95") <= r.getAs[Long]("rows_max"))
    }
    // a longer trigger can only merge buckets: batch counts shrink
    val nbs = rows.map(_.getAs[Long]("n_batches"))
    assert(nbs.zip(nbs.tail).forall { case (a, b) => a >= b })
  }
}
