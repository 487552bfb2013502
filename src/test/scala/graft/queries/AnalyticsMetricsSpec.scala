package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Statistical identities behind the x219/x220/x222/x226 metric operators —
  * each oracle pins cross-engine equality; these pin that the IMPLEMENTED
  * formula is the statistic it claims to be (rank identity vs pairwise
  * definition, bound checks, the packing guarantee).
  */
class AnalyticsMetricsSpec extends SparkSpec {

  test("x219 rank-form AUC equals the pairwise (Mann-Whitney) definition") {
    // AUC = P(score_pos > score_neg) + 0.5 P(tie), computed literally over
    // the pos x neg pair grid at sf0.001 — the definition the domain-window
    // rank identity must reproduce exactly
    val sc = Tables(spark, sf001, "documents").select(
      (col("lang") === "en").as("pos"),
      expr("(1000 * size(array_distinct(split(text, ' ')))) " +
        "div size(split(text, ' '))").as("score"))
    val p = sc.where(col("pos")).select(col("score").as("sp"))
    val n = sc.where(!col("pos")).select(col("score").as("sn"))
    val pair = p.crossJoin(n)
      .agg((sum(when(col("sp") > col("sn"), 2L)
        .when(col("sp") === col("sn"), 1L).otherwise(0L))).as("w2"),
        count(lit(1)).as("np"))
      .select(expr("(1000000 * w2) div (2 * np)").as("auc_micro"))
      .head().getLong(0)
    val fast = SparkEntry.queries("x219_auc_rank")(spark, sf001)
      .select("auc_micro").head().getLong(0)
    assert(fast === pair, s"rank identity $fast != pairwise $pair")
  }

  test("x220 gini is in [0, 1e6) and sums cover all ordered customers") {
    val g = SparkEntry.queries("x220_gini_concentration")(spark, sf001)
      .collect()
    assert(g.length === 5)
    g.foreach { r =>
      val gini = r.getAs[Long]("gini_micro")
      assert(gini >= 0L && gini < 1000000L, s"gini out of range: $r")
    }
    val custWithOrders = Tables(spark, sf001, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(g.map(_.getAs[Long]("n")).sum === custWithOrders)
  }

  test("x222 kappa is within [-1e6, 1e6] and the confusion matrix covers the corpus") {
    val r = SparkEntry.queries("x222_cohens_kappa")(spark, sf001).head()
    val total = r.getAs[Long]("a") + r.getAs[Long]("b") +
      r.getAs[Long]("c") + r.getAs[Long]("d")
    assert(total === Tables(spark, sf001, "documents").count())
    val k = r.getAs[Long]("kappa_micro")
    assert(k >= -1000000L && k <= 1000000L, s"kappa out of range: $k")
  }

  test("x232 k-center: radii are non-increasing and the picks cover at the last radius") {
    val picks = SparkEntry.queries("x232_kcenter_coreset")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(picks.map(_._1).toSeq == (0 until 8))
    val radii = picks.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"farthest-first radii must be non-increasing: ${radii.toSeq}")
    // covering: every vector is within the NEXT radius (<= the last pick's
    // distance) of some center — the Gonzalez guarantee the coreset is for
    val e = Tables(spark, sf001, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000, 0) as bigint))")
        .as("v"))
    val centers = e.where(col("vec_id").isin(picks.map(_._2): _*))
      .collect().map(_.getSeq[Long](1))
    val maxMin = e.collect().map { r =>
      val v = r.getSeq[Long](1)
      centers.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.max
    assert(maxMin <= radii.last,
      s"a point sits farther ($maxMin) than the last selection radius (${radii.last})")
  }

  test("x244 spearman equals a driver-side tie-corrected rank correlation") {
    val cust = Tables(spark, sf001, "orders")
      .join(Tables(spark, sf001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(12,2)")) * 100)
        .cast("long").as("cents"), count(lit(1)).as("n_orders"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      // 2x tie-average rank: 2*minrank + ties - 1, over the value multiset
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val minRank = sorted.indexOf(v) + 1L
        v -> (2 * minRank + sorted.count(_ == v) - 1)
      }.toMap
    }
    val expected = cust.groupBy(_._1).map { case (seg, rows) =>
      val rx = ranks2(rows.map(_._2).toSeq)
      val ry = ranks2(rows.map(_._3).toSeq)
      val pts = rows.map(r => (BigInt(rx(r._2)), BigInt(ry(r._3))))
      val n = BigInt(pts.length)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      seg -> math.round((n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble)) * 1e6)
    }
    val got = SparkEntry.queries("x244_spearman_rank")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got.values.forall(v => math.abs(v) <= 1000000L))
  }

  test("x245 mann-whitney: rank-sum identity vs the pairwise definition") {
    // 2*U1 = #(promo > other)*2 + #(ties), counted literally over the
    // pooled pair grid at sf0.001 — the domain-grid identity must match
    val q = Tables(spark, sf001, "lineitem")
      .join(Tables(spark, sf001, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("l_returnflag").as("flag"),
        col("p_type").startsWith("PROMO").as("promo"),
        col("l_quantity").cast("long").as("qty"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    val expected = q.groupBy(_._1).map { case (flag, rows) =>
      val g1 = rows.filter(_._2).map(_._3)
      val g2 = rows.filterNot(_._2).map(_._3)
      val u2 = g1.iterator.map { x =>
        2L * g2.count(_ < x) + g2.count(_ == x)
      }.sum
      flag -> ((g1.length.toLong, g2.length.toLong, u2))
    }
    val got = SparkEntry.queries("x245_mannwhitney_u")(spark, sf001)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // rank-biserial bounded
    val rb = SparkEntry.queries("x245_mannwhitney_u")(spark, sf001)
      .collect().map(_.getAs[Long]("rb_micro"))
    assert(rb.forall(v => math.abs(v) <= 1000000L))
  }

  test("x246 kendall tau-b equals the driver-side pairwise concordance count") {
    val pts = Tables(spark, sf001, "lineitem")
      .select(col("l_quantity").cast("long"),
        (col("l_discount").cast("decimal(4,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var (cc, dd) = (BigInt(0), BigInt(0))
    var (tiesX, tiesY) = (BigInt(0), BigInt(0))
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val ((x1, y1), (x2, y2)) = (pts(i), pts(j))
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) cc += 1 else dd += 1
      }
      if (x1 == x2 && y1 != y2) tiesX += 1
      if (y1 == y2 && x1 != x2) tiesY += 1
    }
    val n = BigInt(pts.length)
    val n0 = n * (n - 1) / 2
    // n1/n2 count ALL same-x (same-y) pairs including both-tied cells
    val n1 = n0 - cc - dd - tiesY
    val n2 = n0 - cc - dd - tiesX
    val expTau = math.round((cc - dd).toDouble /
      (math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble)) * 1e6)
    val r = SparkEntry.queries("x246_kendall_tau")(spark, sf001).head()
    assert(r.getAs[Long]("concordant") == cc.toLong)
    assert(r.getAs[Long]("discordant") == dd.toLong)
    assert(r.getAs[Long]("tau_micro") == expTau)
  }

  test("x247 cramers v: chi2 mass equals x235's total, V within [0, 1e6]") {
    val r = SparkEntry.queries("x247_cramers_v")(spark, sf001).head()
    val chi2FromX235 = SparkEntry.queries("x235_chi2_independence")(spark, sf001)
      .select("chi2_total_micro").head().getLong(0)
    assert(r.getAs[Long]("chi2_micro") == chi2FromX235,
      "x247 must normalize exactly the chi2 mass x235 reports")
    val v = r.getAs[Long]("cramers_v_micro")
    assert(v >= 0L && v <= 1000000L, s"V out of range: $v")
    // dims match the actual domain cardinalities
    val d = Tables(spark, sf001, "documents")
    assert(r.getAs[Long]("n_langs") == d.select("lang").distinct().count())
    assert(r.getAs[Long]("n_sources") == d.select("source").distinct().count())
  }

  test("x248 kruskal-wallis equals a driver-side BigInt replication") {
    val rows = Tables(spark, sf001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pooled = rows.groupBy(_._2).map { case (q, vs) => q -> BigInt(vs.length) }
    val qtys = pooled.keys.toSeq.sorted
    val r2 = qtys.map { q =>
      val below = qtys.filter(_ < q).map(pooled).sum
      q -> (2 * below + pooled(q) + 1)
    }.toMap
    val nn = pooled.values.sum
    val groups = rows.groupBy(_._1).map { case (flag, vs) =>
      val nG = BigInt(vs.length)
      val r2s = vs.map(v => r2(v._2)).sum
      val term = (3 * r2s * r2s * 1000000) / (nn * (nn + 1) * nG)
      (flag, nG, r2s, term)
    }.toSeq.sortBy(_._1)
    val hMicro = groups.map(_._4).sum - (nn + 1) * 3000000
    val nn3n = nn * nn * nn - nn
    val tsum = pooled.values.map(t => t * t * t - t).sum
    val hTie = math.round(hMicro.toDouble *
      (nn3n.toDouble / (nn3n - tsum).toDouble))
    val got = SparkEntry.queries("x248_kruskal_wallis")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == groups.map(_._1))
    got.zip(groups).foreach { case ((_, nG, r2s, h, ht), (_, eN, eR, _)) =>
      assert(nG == eN.toLong && r2s == eR.toLong)
      assert(h == hMicro.toLong && ht == hTie)
    }
  }

  test("x250 KS equals a driver-side exact max-CDF-gap computation") {
    val vals = Tables(spark, sf001, "events")
      .select(col("event_type") === "purchase",
        expr("cast(round(value * 100, 0) as bigint)"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val cur = vals.filter(_._1).map(_._2)
    val ref = vals.filterNot(_._1).map(_._2)
    val grid = (cur ++ ref).distinct.sorted
    val (n1, n2) = (BigInt(cur.length), BigInt(ref.length))
    val gaps = grid.map { v =>
      val c1 = BigInt(cur.count(_ <= v))
      val c2 = BigInt(ref.count(_ <= v))
      v -> (c1 * n2 - c2 * n1).abs
    }
    val dmax = gaps.map(_._2).max
    val vAt = gaps.filter(_._2 == dmax).map(_._1).min
    val r = SparkEntry.queries("x250_ks_two_sample")(spark, sf001).head()
    assert(r.getAs[Long]("n_cur") == n1.toLong)
    assert(r.getAs[Long]("n_ref") == n2.toLong)
    assert(r.getAs[Long]("ks_micro") == ((dmax * 1000000) / (n1 * n2)).toLong)
    assert(r.getAs[Long]("v_at") == vAt)
  }

  test("x251 ROC curve integrates back to exactly x219's AUC (trapezoid identity)") {
    val roc = SparkEntry.queries("x251_roc_curve")(spark, sf001)
      .orderBy(col("threshold").desc)
      .collect().map(r => (r.getLong(1), r.getLong(2))) // (tp, fp) desc
    // doubled trapezoid area over the FP axis: S = sum dFP*(2*TPprev + dTP);
    // with U the tie-credited Mann-Whitney mass, S == 2U exactly, so the
    // micro-truncated AUC must reproduce x219 bit-for-bit
    var (tpPrev, fpPrev) = (BigInt(0), BigInt(0))
    var s2 = BigInt(0)
    roc.foreach { case (tp, fp) =>
      s2 += (BigInt(fp) - fpPrev) * (2 * tpPrev + (BigInt(tp) - tpPrev))
      tpPrev = BigInt(tp); fpPrev = BigInt(fp)
    }
    val (p, nn) = (tpPrev, fpPrev) // the last row covers everything
    val x219row = SparkEntry.queries("x219_auc_rank")(spark, sf001).head()
    assert(p.toLong == x219row.getAs[Long]("n_pos"))
    assert(nn.toLong == x219row.getAs[Long]("n_neg"))
    assert(((s2 * 1000000) / (2 * p * nn)).toLong
      == x219row.getAs[Long]("auc_micro"),
      "ROC trapezoid mass must equal the rank-form AUC")
    // curve sanity: monotone non-decreasing tp/fp along descending thresholds
    assert(roc.zip(roc.tail).forall { case ((t1, f1), (t2, f2)) =>
      t2 >= t1 && f2 >= f1 })
  }

  test("x252 Q-Q deciles equal driver-side lower-quantile inversion; monotone") {
    val vals = Tables(spark, sf001, "events")
      .select(col("event_type") === "purchase",
        expr("cast(round(value * 100, 0) as bigint)"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    def decile(sample: Seq[Long], d: Int): Long = {
      val sorted = sample.sorted
      // smallest v with 10*|{<=v}| >= d*N == element at ceil(d*N/10)-1
      sorted(((d.toLong * sorted.length + 9) / 10 - 1).toInt)
    }
    val cur = vals.filter(_._1).map(_._2).toSeq
    val ref = vals.filterNot(_._1).map(_._2).toSeq
    val got = SparkEntry.queries("x252_qq_decile_drift")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1L to 9L))
    got.foreach { case (d, vCur, vRef, gap) =>
      assert(vCur == decile(cur, d.toInt), s"v_cur at decile $d")
      assert(vRef == decile(ref, d.toInt), s"v_ref at decile $d")
      assert(gap == vCur - vRef)
    }
    // quantile functions are monotone in d
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
  }

  test("x253 operating point is the argmax of F1 over x251's curve") {
    val roc = SparkEntry.queries("x251_roc_curve")(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val p = roc.map(_._2).max // tp is cumulative; last threshold has all
    val best = roc.map { case (t, tp, fp) =>
      (t, (2000L * tp) / (2 * tp + fp + (p - tp)))
    }.sortBy { case (t, f1) => (-f1, t) }.head
    val r = SparkEntry.queries("x253_f1_operating_point")(spark, sf001).head()
    assert(r.getAs[Long]("threshold") == best._1)
    assert(r.getAs[Long]("f1_milli") == best._2)
    // confusion counts are consistent
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == p)
  }

  test("x257 capture-recapture equals driver-side Chapman on the same hash samples") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val ids = Tables(spark, sf001, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    val a = ids.filter(id => md5hex(s"$id:capA").substring(0, 2) <= "3f").toSet
    val b = ids.filter(id => md5hex(s"$id:capB").substring(0, 2) <= "3f").toSet
    val m = (a & b).size.toLong
    val nHat = (a.size + 1).toLong * (b.size + 1) / (m + 1) - 1
    val r = SparkEntry.queries("x257_capture_recapture")(spark, sf001).head()
    assert(r.getAs[Long]("n1") == a.size.toLong)
    assert(r.getAs[Long]("n2") == b.size.toLong)
    assert(r.getAs[Long]("m") == m)
    assert(r.getAs[Long]("n_hat") == nHat)
    assert(r.getAs[Long]("n_true") == ids.length.toLong)
    // the estimator is in the right regime on the fixture (25% captures)
    assert(math.abs(nHat - ids.length) <= ids.length / 2,
      s"Chapman estimate $nHat implausibly far from ${ids.length}")
  }

  test("x258 richness estimators equal driver-side frequency-of-frequencies") {
    val toks = Tables(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .collect().map(_.getString(0))
    val counts = toks.groupBy(identity).map { case (_, v) => v.size.toLong }
    val (n, v) = (toks.length.toLong, counts.size.toLong)
    val f1 = counts.count(_ == 1L).toLong
    val f2 = counts.count(_ == 2L).toLong
    val r = SparkEntry.queries("x258_vocab_richness")(spark, sf001).head()
    assert(r.getAs[Long]("n_tokens") == n && r.getAs[Long]("vocab") == v)
    assert(r.getAs[Long]("f1") == f1 && r.getAs[Long]("f2") == f2)
    assert(r.getAs[Long]("chao1") == v + f1 * (f1 - 1) / (2 * (f2 + 1)))
    assert(r.getAs[Long]("p0_micro") == 1000000L * f1 / n)
    // Chao1 is a lower bound on richness that never undercuts observed V
    assert(r.getAs[Long]("chao1") >= v)
  }

  test("x259 simpson diversity equals driver-side counts; inverse within [1, k]") {
    val d = Tables(spark, sf001, "documents")
    def simpson(cats: Seq[String]): (Long, Long, BigInt) = {
      val counts = cats.groupBy(identity).map(_._2.size.toLong)
      (cats.length.toLong, counts.size.toLong,
        counts.map(c => BigInt(c) * (c - 1)).sum)
    }
    val byDim = Map(
      "lang" -> d.select("lang").collect().map(_.getString(0)).toSeq,
      "source" -> d.select("source").collect().map(_.getString(0)).toSeq,
      "token" -> d.select(explode(split(col("text"), " ")))
        .collect().map(_.getString(0)).toSeq)
    val got = SparkEntry.queries("x259_diversity_profile")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == byDim.keySet)
    byDim.foreach { case (dim, cats) =>
      val (n, k, ss) = simpson(cats)
      val (gn, gk, gs, ge) = got(dim)
      assert(gn == n && gk == k)
      assert(gs == (BigInt(1000000) * ss / (BigInt(n) * (n - 1))).toLong)
      assert(ge == (BigInt(1000) * n * (n - 1) / ss).toLong)
      // effective categories is >= 1; the (n-1)-corrected inverse can
      // exceed k by the finite-sample factor (n-1)/(n/k - 1) at most,
      // i.e. it is bounded by k*(n-1)/(n-k) (equal-distribution maximum)
      assert(ge >= 1000L, s"$dim: eff=$ge")
      assert(BigInt(ge) <= BigInt(1000) * k * (n - 1) / (n - k) + 1,
        s"$dim: eff=$ge exceeds the equal-distribution bound (k=$k, n=$n)")
    }
  }

  test("x260 poisson bootstrap equals driver-side deterministic replication") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val thresholds = Seq("5e2d" -> 0L, "bc5e" -> 1L, "eb79" -> 2L,
      "fb2b" -> 3L, "ff10" -> 4L, "ffd9" -> 5L, "fffa" -> 6L)
    def weight(h: String): Long =
      thresholds.find { case (t, _) => h < t }.map(_._2).getOrElse(7L)
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val means = (1 to 32).flatMap { b =>
      var (swx, sw) = (BigInt(0), 0L)
      orders.foreach { case (k, cents) =>
        val w = weight(md5hex(s"$k:$b").substring(0, 4))
        swx += BigInt(w) * cents; sw += w
      }
      if (sw > 0) Some((swx / sw).toLong) else None
    }.sorted
    val r = SparkEntry.queries("x260_poisson_bootstrap")(spark, sf001).head()
    assert(r.getAs[Long]("n_orders") == orders.length.toLong)
    assert(r.getAs[Long]("mean_cents")
      == (orders.map(o => BigInt(o._2)).sum / orders.length).toLong)
    assert(r.getAs[Long]("ci_lo_cents") == means(1))
    assert(r.getAs[Long]("ci_hi_cents") == means(30))
    // the band straddles the exact mean on the fixture
    assert(r.getAs[Long]("ci_lo_cents") <= r.getAs[Long]("mean_cents"))
    assert(r.getAs[Long]("ci_hi_cents") >= r.getAs[Long]("mean_cents"))
  }

  test("x261 correlation ratio equals driver-side BigInt replication; eta2 in [0,1]") {
    val rows = Tables(spark, sf001, "orders")
      .join(Tables(spark, sf001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("c_nationkey").cast("string"),
        expr("cast(floor(o_totalprice) as bigint)"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = BigInt(rows.length)
    val s = rows.map(r => BigInt(r._3)).sum
    val sxx = rows.map(r => BigInt(r._3) * r._3).sum
    def factor(key: ((String, String, Long)) => String) = {
      val gs = rows.groupBy(key).values
      val k = gs.size.toLong
      val a = gs.map { g =>
        val sg = g.map(r => BigInt(r._3)).sum
        sg * sg / g.size
      }.sum
      val ssB = n * a - s * s
      val ssT = n * sxx - s * s
      (k, (BigInt(1000000) * ssB / ssT).toLong,
        (BigInt(1000) * (n - k) * ssB / ((k - 1) * (ssT - ssB))).toLong)
    }
    val expected = Map("segment" -> factor(_._1), "nation" -> factor(_._2))
    val got = SparkEntry.queries("x261_correlation_ratio")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (f, (k, eta, fm)) =>
      val (gk, ge, gf) = got(f)
      assert(gk == k && ge == eta && gf == fm, s"$f: got ${got(f)}")
      assert(ge >= 0L && ge <= 1000000L)
    }
  }

  test("x262 runs test equals a driver-side run count over the daily series") {
    val daily = Tables(spark, sf001, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val sorted = daily.map(_._2).sorted
    val median = sorted(((daily.length + 1) / 2 - 1).max(0))
    val signs = daily.map(_._2).filter(_ != median).map(_ > median)
    val runs = if (signs.isEmpty) 0L
      else 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    val n1 = signs.count(identity).toLong
    val n2 = signs.length - n1
    val r = SparkEntry.queries("x262_runs_test")(spark, sf001).head()
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("runs") == runs)
    assert(r.getAs[Long]("expected_runs_milli")
      == (if (n1 + n2 == 0) -1L else 1000L + 2000L * n1 * n2 / (n1 + n2)))
    // runs are bounded by the dichotomized day count
    assert(runs <= n1 + n2)
  }

  test("x263 stump is the argmin of exact quantized split impurity") {
    val pts = Tables(spark, sf001, "documents")
      .select(col("lang") === "en",
        size(split(col("text"), " ")).cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val n = BigInt(pts.length)
    val p = BigInt(pts.count(_._1))
    def giniSide(m: BigInt, pos: BigInt): BigInt =
      if (m == 0) BigInt(0)
      else (BigInt(1000000) * (m * m - pos * pos - (m - pos) * (m - pos))) /
        (m * n)
    val candidates = pts.map(_._2).distinct.sorted.reverse.flatMap { t =>
      val left = pts.filter(_._2 >= t)
      val (ml, posL) = (BigInt(left.length), BigInt(left.count(_._1)))
      val mr = n - ml
      if (mr > 0)
        Some((t, (giniSide(ml, posL) + giniSide(mr, p - posL)).toLong))
      else None
    }
    val best = candidates.sortBy { case (t, g) => (g, t) }.head
    val r = SparkEntry.queries("x263_decision_stump")(spark, sf001).head()
    assert(r.getAs[Long]("threshold") == best._1)
    assert(r.getAs[Long]("gini_split_micro") == best._2)
    // a split never increases impurity under the exact (unquantized)
    // metric; with per-term micro truncation the gain can dip below zero
    // by at most 2 quantization units
    assert(r.getAs[Long]("gain_micro") >= -2L)
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == n.toLong)
  }

  test("x226 boustrophedon packing: covers the corpus, imbalance <= max doc size") {
    // serpentine dealing of descending sizes bounds the token-mass spread
    // across shards by the largest single document — the greedy guarantee
    // the operator exists for (plain round-robin does not have it)
    val shards = SparkEntry.queries("x226_shard_packing")(spark, sf001)
      .collect()
    assert(shards.map(_.getAs[Long]("shard")).sorted.toSeq === (0L to 7L))
    val d = Tables(spark, sf001, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
    val (totalTok, maxTok) =
      (d.agg(sum("n_tok")).head().getLong(0), d.agg(max("n_tok")).head().getLong(0))
    assert(shards.map(_.getAs[Long]("tok_total")).sum === totalTok)
    val loads = shards.map(_.getAs[Long]("tok_total"))
    assert(loads.max - loads.min <= maxTok,
      s"spread ${loads.max - loads.min} exceeds max doc $maxTok")
  }
}
