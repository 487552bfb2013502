package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins the decision semantics of the x361–x368 wave (Shapley / CUPED /
  * Holm / Nelson–Aalen / shard-balance / Good–Turing / blocking-quality /
  * minhash-PR): each row's defining algebraic identity is recomputed
  * independently (driver-side BigInt arithmetic or a literal simulation),
  * so a value-hash oracle pass can never be a lucky constant and the
  * cross-row no-drift contracts (shared truth tiers, shared risk tables,
  * Holm ⊆ single-test flags) are suite-enforced.
  */
class ExperimentSemanticsSpec extends SparkSpec {

  test("x361: Shapley efficiency — credits sum to 24·(v(N) − v(∅)), all ≥ 0") {
    val rows = SparkEntry.queries("x361_shapley_attribution")(spark, sf001)
      .collect()
    assert(rows.length == 4)
    val nConv = rows.head.getAs[Long]("n_conv")
    val base = rows.head.getAs[Long]("baseline")
    val phis = rows.map(_.getAs[Long]("phi_x24"))
    assert(phis.forall(_ >= 0L), s"monotone v ⇒ non-negative φ: ${phis.toSeq}")
    assert(phis.sum == 24L * (nConv - base),
      s"efficiency: Σφ·24 = ${phis.sum}, 24·(v(N)−v(∅)) = ${24L * (nConv - base)}")
    // shares are floor-truncated micro fractions of the attributable mass
    if (nConv > base) {
      val shares = rows.map(_.getAs[Long]("share_micro"))
      assert(shares.sum <= 1000000L && shares.sum > 1000000L - 100L,
        s"share truncation bound: ${shares.toSeq}")
    }
  }

  test("x362: θ and adjusted means match an exact BigInt recomputation") {
    val out = SparkEntry.queries("x362_cuped_adjustment")(spark, sf001)
      .collect().map(r => r.getAs[Long]("arm") -> r).toMap
    // independent reimplementation: per-user (x, y) cents via Spark
    // extraction (timestamps), all moments in exact BigInt on the driver
    val e = Tables(spark, sf001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = e.map(_._2).min
    val mid = t0 + (e.map(_._2).max - t0) / 2
    def arm(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"a:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % 2
    }
    val per = e.groupBy(_._1).map { case (u, es) =>
      (arm(u), BigInt(es.filter(_._2 < mid).map(_._3).sum),
        BigInt(es.filter(_._2 >= mid).map(_._3).sum))
    }.toSeq
    val n = BigInt(per.size)
    val sx = per.map(_._2).sum; val sy = per.map(_._3).sum
    val sxx = per.map(p => p._2 * p._2).sum
    val sxy = per.map(p => p._2 * p._3).sum
    val vden = n * sxx - sx * sx
    val theta = (BigInt(1000000) * (n * sxy - sx * sy)) / vden
    for (a <- Seq(0L, 1L)) {
      val mine = per.filter(_._1 == a)
      val na = BigInt(mine.size); val sxa = mine.map(_._2).sum
      val sya = mine.map(_._3).sum
      val meanY = (BigInt(1000000) * sya) / na
      val adj = meanY - (theta * (sxa * n - sx * na)) / (na * n)
      val r = out(a)
      assert(r.getAs[Long]("theta_micro") == theta.toLong, s"theta arm $a")
      assert(r.getAs[Long]("mean_y_micro") == meanY.toLong, s"meanY arm $a")
      assert(r.getAs[Long]("mean_adj_micro") == adj.toLong, s"adj arm $a")
    }
  }

  // r13 semantics note: ranks whose Holm index m−k+1 exceeds the 10-rung
  // ladder ABSTAIN (crit NULL, pass 0) — unreachable at this fixture
  // (m=5), so the in-ladder assertions below are exhaustive here; at
  // m>10 abstention only removes rejections, which PRESERVES both pinned
  // implications (Holm ⇒ x357 flag, and BH ⊇ Holm below).
  test("x367: Holm ladder is exact, sequential, and implies the x357 flag") {
    val rows = SparkEntry.queries("x367_holm_srm_scan")(spark, sf001)
      .collect().sortBy(_.getAs[Long]("rank"))
    val crits = Seq(3841459L, 5023886L, 5731139L, 6238533L, 6634897L,
      6960401L, 7236689L, 7476773L, 7689093L, 7879439L)
    val m = rows.length
    var alive = true
    rows.foreach { r =>
      val k = r.getAs[Long]("rank").toInt
      assert(r.getAs[Long]("crit_micro") == crits(m - k), s"ladder at $r")
      alive = alive && r.getAs[Long]("chi2_micro") >= r.getAs[Long]("crit_micro")
      assert(r.getAs[Boolean]("holm_reject") == alive, s"sequential stop at $r")
    }
    // Holm rejection is never weaker than the naive per-test flag
    val naive = SparkEntry.queries("x357_srm_guard")(spark, sf001)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Boolean]("srm_flag")).toMap
    rows.filter(_.getAs[Boolean]("holm_reject")).foreach { r =>
      assert(naive(r.getAs[String]("event_type")),
        s"holm reject without single-test flag: $r")
    }
  }

  test("x368: Nelson–Aalen is the running sum over x218's exact risk table") {
    val na = SparkEntry.queries("x368_nelson_aalen")(spark, sf001)
      .collect().sortBy(_.getAs[Long]("t"))
    val km = SparkEntry.queries("x218_kaplan_meier")(spark, sf001)
      .collect().map(r => r.getAs[Long]("t") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("d"), r.getAs[Long]("c"))).toMap
    assert(na.length == km.size, "one shared risk table")
    var cum = 0L
    na.foreach { r =>
      val (n, d, c) = km(r.getAs[Long]("t"))
      assert((r.getAs[Long]("n_risk"), r.getAs[Long]("d"), r.getAs[Long]("c"))
        == ((n, d, c)), s"risk row drift at $r")
      val step = 1000000L * d / n
      assert(r.getAs[Long]("h_step_micro") == step)
      cum += step
      assert(r.getAs[Long]("h_cum_micro") == cum, s"running sum at $r")
    }
  }

  test("x363: shard TVD matches a driver-side recomputation over x36's shards") {
    val out = SparkEntry.queries("x363_shard_balance_audit")(spark, sf001)
      .collect().map(r => r.getAs[String]("shard") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tvd_ppm"),
          r.getAs[Boolean]("balanced"))).toMap
    // independent: the x36 registry row's own assignment + the source col
    val assigned = SparkEntry.queries("x36_training_shuffle")(spark, sf001)
      .select(col("doc_id"), substring(col("shard"), 1, 1).as("shard"))
      .join(Tables(spark, sf001, "documents").select("doc_id", "source"), "doc_id")
      .collect().map(r => (r.getAs[String]("shard"), r.getAs[String]("source")))
    val nTotal = BigInt(assigned.length)
    val srcTot = assigned.groupBy(_._2).map { case (s, v) => s -> BigInt(v.length) }
    assigned.groupBy(_._1).foreach { case (sh, v) =>
      val nShard = BigInt(v.length)
      val cells = v.groupBy(_._2).map { case (s, w) => s -> BigInt(w.length) }
      val num = srcTot.map { case (s, ns) =>
        (cells.getOrElse(s, BigInt(0)) * nTotal - ns * nShard).abs }.sum
      val tvd = (BigInt(1000000) * num) / (2 * nShard * nTotal)
      assert(out(sh)._1 == nShard.toLong && out(sh)._2 == tvd.toLong,
        s"shard $sh: ${out(sh)} vs ($nShard, $tvd)")
      assert(out(sh)._3 == (tvd.toLong <= 20000L))
    }
    assert(out.values.map(_._1).sum == nTotal.toLong, "shards partition the corpus")
  }

  test("x364: Good–Turing r* matches counts-of-counts recomputed exactly") {
    val out = SparkEntry.queries("x364_good_turing")(spark, sf001).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("r")) ->
        (r.getAs[Long]("n_r"), r.getAs[Long]("r_star_milli"))).toMap
    val counts = Tables(spark, sf001, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val nr = counts.groupBy(identity).map { case ((l, r), v) => (l, r) -> v.length.toLong }
    // the band is the 20 smallest OBSERVED r per language (rank, not
    // absolute — an absolute cutoff empties the table as the corpus grows)
    val kept = nr.keySet.groupBy(_._1).values
      .flatMap(ks => ks.toSeq.sortBy(_._2).take(20)).toSet
    kept.foreach { case (l, r) =>
      val n = nr((l, r))
      val nNext = nr.getOrElse((l, r + 1), 0L)
      val rStar = if (nNext > 0) 1000L * (r + 1) * nNext / n else 0L
      assert(out((l, r)) == ((n, rStar)), s"($l, $r): ${out((l, r))} vs ($n, $rStar)")
    }
    assert(out.keySet == kept, "cell domain")
  }

  test("x365: group-size shortcut equals a literal SNM window simulation") {
    val rows = SparkEntry.queries("x365_blocking_quality_eval")(spark, sf001)
      .collect().map(r => r.getAs[String]("strategy") -> r).toMap
    val norms = Tables(spark, sf001, "documents")
      .select(col("doc_id"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 24)
          .as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nTrue = norms.groupBy(_._2).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    // literal simulation of x146's blocking: sort each key8 block by
    // (norm, doc_id), generate window-2 pairs, count them and the
    // equal-norm pairs among them
    var nCand = 0L; var nCaught = 0L
    norms.groupBy(_._2.take(8)).values.foreach { block =>
      val sorted = block.toSeq.sortBy(p => (p._2, p._1))
      for (i <- sorted.indices; d <- 1 to 2 if i + d < sorted.size) {
        nCand += 1
        if (sorted(i)._2 == sorted(i + d)._2) nCaught += 1
      }
    }
    val snm = rows("key8_snm_w2")
    assert(snm.getAs[Long]("n_true") == nTrue)
    assert(snm.getAs[Long]("n_cand") == nCand, "SNM candidate count")
    assert(snm.getAs[Long]("n_caught") == nCaught, "SNM caught count")
    assert(nTrue > 0L, "fixture must exercise the completeness leg")
    // the coarse blocker is totally complete by prefix nesting
    assert(rows("prefix4_allpairs").getAs[Long]("n_caught") == nTrue)
    assert(rows("prefix4_allpairs").getAs[Long]("pc_milli") == 1000L)
  }

  test("x369: gains table — capture monotone to 1000, lift exact, no leakage") {
    val rows = SparkEntry.queries("x369_gains_table")(spark, sf001)
      .collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val captures = rows.map(_.getAs[Long]("capture_milli"))
    assert(captures.zip(captures.tail).forall { case (a, b) => a <= b },
      "cumulative capture is monotone")
    assert(captures.last == 1000L, "decile 10 captures everything")
    // independent recomputation from raw events (score excludes purchases)
    val per = Tables(spark, sf001, "events")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type")))
      .groupBy(_._1).map { case (u, es) =>
        (u, es.count(_._2 != "purchase").toLong,
          if (es.exists(_._2 == "purchase")) 1L else 0L)
      }.toSeq
    val n = per.size
    val sorted = per.sortBy(p => (-p._2, p._1))
    val deciles = sorted.zipWithIndex.map { case (p, i) =>
      // SQL-standard NTILE: first (n mod 10) buckets get ceil(n/10)
      val big = n % 10; val sz = n / 10
      val d = if (i < big * (sz + 1)) i / (sz + 1) else big + (i - big * (sz + 1)) / sz
      (d + 1L, p._3)
    }
    val totPos = per.map(_._3).sum
    var cum = 0L
    (1L to 10L).foreach { d =>
      cum += deciles.filter(_._1 == d).map(_._2).sum
      assert(rows(d.toInt - 1).getAs[Long]("cum_pos") == cum, s"cum_pos at $d")
      assert(rows(d.toInt - 1).getAs[Long]("capture_milli") == 1000L * cum / totPos)
    }
  }

  test("x370: token-weighted length quantiles match an exact recomputation") {
    val rows = SparkEntry.queries("x370_context_length_quantiles")(spark, sf001)
      .collect().map(r => r.getAs[Long]("p_milli") -> r).toMap
    val lens = Tables(spark, sf001, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(_.getLong(0)).sorted
    val tt = lens.sum
    for (p <- Seq(500L, 750L, 900L, 950L, 990L)) {
      var ct = 0L
      val lp = lens.find { l => ct += l; ct * 1000 >= p * tt }.get
      assert(rows(p).getAs[Long]("max_len") == lp, s"L_$p")
      val covered = lens.filter(_ <= lp).sum
      assert(rows(p).getAs[Long]("tokens_covered_milli") == 1000L * covered / tt)
      assert(rows(p).getAs[Long]("docs_covered_milli") ==
        1000L * lens.count(_ <= lp) / lens.length)
    }
  }

  test("x371: Neyman allocation matches round-after-sqrt recomputation") {
    val rows = SparkEntry.queries("x371_neyman_allocation")(spark, sf001)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val per = Tables(spark, sf001, "documents")
      .select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
      .groupBy(_._1).map { case (l, v) =>
        val n = BigInt(v.size); val sx = v.map(_._2).sum
        val sxx = v.map(x => x._2 * x._2).sum
        val sd = math.round(math.sqrt((n * sxx - sx * sx).toDouble)
          / n.toDouble * 1000)
        (l, n.toLong, sd)
      }
    val totW = per.map(p => p._2 * p._3).sum
    val totN = per.map(_._2).sum
    per.foreach { case (l, n, sd) =>
      val r = rows(l)
      assert(r.getAs[Long]("sd_milli") == sd, s"sd for $l")
      assert(r.getAs[Long]("neyman_alloc") == 10000L * n * sd / totW)
      assert(r.getAs[Long]("proportional_alloc") == 10000L * n / totN)
    }
    // the point of the row: Neyman diverges from proportional somewhere
    assert(per.exists { case (l, _, _) =>
      rows(l).getAs[Long]("neyman_alloc") !=
        rows(l).getAs[Long]("proportional_alloc") },
      "fixture must show a non-proportional allocation")
  }

  test("x372: mod resharding pays, prefix split moves zero") {
    val rows = SparkEntry.queries("x372_reshard_move_plan")(spark, sf001)
      .collect().map(r => r.getAs[String]("strategy") -> r).toMap
    // prefix refinement: structurally zero movers
    assert(rows("prefix_16_to_256").getAs[Long]("n_moved") == 0L)
    assert(rows("prefix_16_to_256").getAs[Long]("move_ppm") == 0L)
    // independent recount of the mod strategies from the same hash
    def h(d: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d:42".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    val ids = Tables(spark, sf001, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    val m17 = ids.count(d => h(d) % 16 != h(d) % 17).toLong
    val m32 = ids.count(d => h(d) % 16 != h(d) % 32).toLong
    assert(rows("mod_16_to_17").getAs[Long]("n_moved") == m17)
    assert(rows("mod_16_to_32").getAs[Long]("n_moved") == m32)
    // and the qualitative lesson holds on the fixture
    assert(rows("mod_16_to_17").getAs[Long]("move_ppm") > 850000L)
    assert(rows("mod_16_to_32").getAs[Long]("move_ppm") > 400000L)
  }

  test("x373: each model distributes exactly 10^6 per conversion; x269's window") {
    val rows = SparkEntry.queries("x373_attribution_sensitivity")(spark, sf001)
      .collect()
    // the touch table is x269's — same rows per type, suite-enforced
    val decay = SparkEntry.queries("x269_timedecay_attribution")(spark, sf001)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_touches")).toMap
    rows.foreach { r =>
      assert(decay(r.getAs[String]("event_type")) == r.getAs[Long]("n_touches"),
        s"touch-window drift vs x269 at $r")
    }
    val first = rows.map(_.getAs[Long]("first_micro")).sum
    val last = rows.map(_.getAs[Long]("last_micro")).sum
    val linear = rows.map(_.getAs[Long]("linear_micro")).sum
    assert(first == last, "first and last both place exactly one credit per conversion")
    assert(first % 1000000L == 0L)
    val nConv = first / 1000000L
    assert(nConv > 0)
    // linear truncates inside each conversion: within n_touches of full
    val nTouches = rows.map(_.getAs[Long]("n_touches")).sum
    assert(linear <= 1000000L * nConv && linear > 1000000L * nConv - nTouches,
      s"linear credit conservation: $linear vs ${1000000L * nConv}")
  }

  test("x374: pooled thresholds and winsorized means match a BigInt replay") {
    val out = SparkEntry.queries("x374_winsorized_ab")(spark, sf001)
      .collect().map(r => r.getAs[Long]("arm") -> r).toMap
    val per = Tables(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = per.sortBy(p => (p._2, p._1)).map(_._2)
    val n = sorted.length
    def thr(pMilli: Long): Long =
      sorted.zipWithIndex.collectFirst {
        case (s, i) if (i + 1).toLong * 1000 >= n * pMilli => s }.get
    val (lo, hi) = (thr(50), thr(950))
    def arm(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"a:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % 2
    }
    for (a <- Seq(0L, 1L)) {
      val mine = per.filter(p => arm(p._1) == a).map(_._2)
      val w = mine.map(s => math.max(math.min(s, hi), lo))
      val r = out(a)
      assert(r.getAs[Long]("lo_cents") == lo && r.getAs[Long]("hi_cents") == hi)
      assert(r.getAs[Long]("mean_micro") ==
        (BigInt(1000000) * BigInt(mine.sum) / mine.size).toLong)
      assert(r.getAs[Long]("mean_winsor_micro") ==
        (BigInt(1000000) * BigInt(w.sum) / w.size).toLong)
    }
  }

  test("x375: per-arm quantiles match a nearest-rank replay") {
    val rows = SparkEntry.queries("x375_quantile_treatment_effects")(spark, sf001)
      .collect().map(r => r.getAs[Long]("p_milli") -> r).toMap
    val per = Tables(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def arm(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"a:$u".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16) % 2
    }
    def q(a: Long, p: Long): Long = {
      val s = per.filter(x => arm(x._1) == a).sortBy(x => (x._2, x._1)).map(_._2)
      s.zipWithIndex.collectFirst {
        case (v, i) if (i + 1).toLong * 1000 >= s.length.toLong * p => v }.get
    }
    for (p <- Seq(250L, 500L, 750L, 900L)) {
      val r = rows(p)
      assert(r.getAs[Long]("q_a_cents") == q(0, p), s"arm A q$p")
      assert(r.getAs[Long]("q_b_cents") == q(1, p), s"arm B q$p")
      assert(r.getAs[Long]("qte_cents") == q(1, p) - q(0, p))
    }
    // quantiles are monotone in p within each arm
    val ps = Seq(250L, 500L, 750L, 900L).map(rows)
    assert(ps.map(_.getAs[Long]("q_a_cents")).sliding(2).forall(s => s.head <= s.last))
    assert(ps.map(_.getAs[Long]("q_b_cents")).sliding(2).forall(s => s.head <= s.last))
  }

  test("scale-shape pins: the new rows plan what their scaladocs claim") {
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sf001)
        .queryExecution.optimizedPlan.toString
    // x363 audits membership only — Catalyst must prune trainingShuffle's
    // unused pos window (verified manually this round; pinned so a Spark
    // upgrade regression is caught by the suite, not the bench)
    val p363 = plan("x363_shard_balance_audit")
    assert(!p363.contains("Window") && !p363.toLowerCase.contains("row_number"),
      "x363 must not compute the shuffle's rank window")
    // x361 computes v(S) as closed-form flag sums — no lattice join, no
    // generator over the fact side beyond the 4-row output stack
    val p361 = plan("x361_shapley_attribution")
    assert(!p361.toLowerCase.contains("cartesianproduct"),
      "x361 must not join a subset lattice")
    // x372 is a map-only scan + rollup: a single scan of documents,
    // no self-join (the strategy fan-out rides an explode)
    val p372 = plan("x372_reshard_move_plan")
    assert(!p372.contains("Join"), "x372 must not join")
    // x364's windows run on the count DOMAIN grid after the fact-sized
    // aggregate, never on the token stream: the window's child must
    // already be an Aggregate. (x370 has the same shape but its
    // localCheckpoint truncates the observable lineage to a LogicalRDD,
    // so the pin can't see its window.)
    val p364 = plan("x364_good_turing")
    val winIdx = p364.indexOf("Window")
    assert(winIdx >= 0, "x364 expects domain windows")
    assert(p364.indexOf("Aggregate", winIdx) >= 0,
      s"x364: window must sit above the domain aggregate, got:\n$p364")
  }

  test("x366: shares x348's truth tier; counting identities hold") {
    val rows = SparkEntry.queries("x366_minhash_pr_eval")(spark, sf001).collect()
    assert(rows.length == 3)
    val nTrue = rows.head.getAs[Long]("n_true")
    assert(rows.forall(_.getAs[Long]("n_true") == nTrue))
    val x348True = SparkEntry.queries("x348_simhash_pr_eval")(spark, sf001)
      .collect().head.getAs[Long]("n_true")
    assert(nTrue == x348True, "one truth tier across both PR evals")
    rows.foreach { r =>
      val (cand, tp) = (r.getAs[Long]("n_cand"), r.getAs[Long]("tp"))
      assert(tp <= cand && tp <= nTrue, s"tp bounds at $r")
      if (cand > 0)
        assert(r.getAs[Long]("precision_milli") == 1000L * tp / cand)
      assert(r.getAs[Long]("recall_milli") == 1000L * tp / nTrue)
      assert(r.getAs[Long]("n_bands") * r.getAs[Long]("rows_per_band") == 16L)
    }
  }

  test("x378 log-rank: risk sets shrink, terms replay in BigInt, χ² closes the fold") {
    val rows = SparkEntry.queries("x378_logrank_test")(spark, sf001)
      .orderBy("t").collect()
    assert(rows.nonEmpty)
    var prevRisk = Long.MaxValue
    var cumOe = BigInt(0); var cumVar = BigInt(0)
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val (da, db) = (r.getAs[Long]("d_a"), r.getAs[Long]("d_b"))
      val n = na + nb
      assert(n <= prevRisk, "the at-risk set can only shrink over t")
      prevRisk = n
      val eA = if (n > 0) BigInt(1000000) * (da + db) * na / n else BigInt(0)
      assert(BigInt(r.getAs[Long]("e_a_micro")) == eA)
      val oe = BigInt(1000000) * da - eA
      assert(BigInt(r.getAs[Long]("oe_micro")) == oe)
      val v = if (n > 1)
        (BigInt(da + db) * (BigInt(1000000) * na / n) * (BigInt(1000000) * nb / n)
          * (n - da - db)) / (BigInt(1000000) * (n - 1))
      else BigInt(0)
      assert(BigInt(r.getAs[Long]("var_micro")) == v, s"variance term at t=${r.getAs[Long]("t")}")
      cumOe += oe; cumVar += v
      assert(BigInt(r.getAs[Long]("cum_oe_micro")) == cumOe)
      assert(BigInt(r.getAs[Long]("cum_var_micro")) == cumVar)
      if (cumVar > 0)
        assert(BigInt(r.getAs[Long]("lr_chi2_micro")) == cumOe * cumOe / cumVar)
    }
  }

  test("x379 DiD: the estimate is exactly the double difference of cell means") {
    val r = SparkEntry.queries("x379_did_estimator")(spark, sf001).head()
    val did = (r.getAs[Long]("mean_b2_milli") - r.getAs[Long]("mean_b1_milli")) -
      (r.getAs[Long]("mean_a2_milli") - r.getAs[Long]("mean_a1_milli"))
    assert(r.getAs[Long]("did_milli") == did)
    Seq("n_a1", "n_a2", "n_b1", "n_b2").foreach(c =>
      assert(r.getAs[Long](c) > 0L, s"empty cell $c breaks the 2×2 design"))
  }

  test("x380 OBF: boundary ladder is c·K/k exact, looks are cumulative, final bound is the α=0.05 χ²") {
    val rows = SparkEntry.queries("x380_obrien_fleming_scan")(spark, sf001)
      .orderBy("look").collect()
    assert(rows.map(_.getAs[Long]("look")).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val k = r.getAs[Long]("look")
      assert(r.getAs[Long]("bound_micro") == 4096576L * 4L / k)
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val chi2 = if (na + nb > 0) 1000000L * (na - nb) * (na - nb) / (na + nb) else 0L
      assert(r.getAs[Long]("chi2_micro") == chi2)
      assert(r.getAs[Boolean]("crossed") == (na + nb > 0 && chi2 >= 4096576L * 4L / k))
    }
    // looks only accumulate users; the last look covers the whole timeline
    val ns = rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
    // OBF spends almost no alpha early: the first-look bound is 4x the last
    assert(rows.head.getAs[Long]("bound_micro") ==
      4L * rows.last.getAs[Long]("bound_micro"))
  }

  test("x381 McNemar: only discordant pairs carry the statistic") {
    val r = SparkEntry.queries("x381_mcnemar_paired")(spark, sf001).head()
    val (b, c) = (r.getAs[Long]("b"), r.getAs[Long]("c"))
    assert(b + c <= r.getAs[Long]("n_pairs"))
    if (b + c > 0) {
      assert(r.getAs[Long]("chi2_micro") == 1000000L * (b - c) * (b - c) / (b + c))
      val cc = math.max(math.abs(b - c) - 1L, 0L)
      assert(r.getAs[Long]("chi2_cc_micro") == 1000000L * cc * cc / (b + c))
      assert(r.getAs[Long]("chi2_cc_micro") <= r.getAs[Long]("chi2_micro"),
        "continuity correction can only shrink the statistic")
    } else {
      assert(r.isNullAt(r.fieldIndex("chi2_micro")),
        "no discordant pairs -> the statistic is undefined, not zero")
    }
  }

  test("x382 Wilson: bounds bracket p-hat inside [0, 1] and never collapse to a point") {
    val rows = SparkEntry.queries("x382_conversion_ci_wilson")(spark, sf001)
      .collect()
    assert(rows.map(_.getAs[Long]("arm")).toSet == Set(0L, 1L))
    rows.foreach { r =>
      val (n, x) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_conv"))
      val (lo, hi) = (r.getAs[Long]("wilson_lo_micro"), r.getAs[Long]("wilson_hi_micro"))
      assert(lo >= 0L && hi <= 1000000L && lo <= hi)
      val pMicro = 1000000.0 * x / n
      assert(lo <= pMicro + 1 && hi >= pMicro - 1, s"bounds must bracket p-hat: $r")
      // the Wald interval collapses to width 0 at p-hat in {0, 1}; Wilson
      // must not (the reason this row exists)
      if (n > 0) assert(hi - lo > 0L, s"degenerate interval at $r")
    }
  }

  test("x383 backfill plan: shares and cumulative volume reconcile with a recount") {
    val rows = SparkEntry.queries("x383_backfill_plan")(spark, sf001)
      .orderBy("day").collect()
    assert(rows.length == 7, "the quarantine window is exactly 7 days")
    val total = graft.Tables(spark, sf001, "events").count()
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("n_events")
      assert(r.getAs[Long]("cum_events") == cum)
      assert(r.getAs[Long]("events_share_milli") ==
        1000L * r.getAs[Long]("n_events") / total)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_hour_partitions") <= 24L)
    }
  }

  test("x394 winsor curve: thresholds replay nearest-rank and clipping less raises the mean") {
    val rows = SparkEntry.queries("x394_winsor_threshold_curve")(spark, sf001)
      .orderBy("p_milli").collect()
    assert(rows.map(_.getAs[Long]("p_milli")).toSeq == Seq(900L, 950L, 990L))
    val spends = graft.Tables(spark, sf001, "events")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr(
        "sum(cast(round(value * 100, 0) as long))").as("spend"))
      .collect().map(_.getAs[Long]("spend")).sorted
    val n = spends.length.toLong
    rows.foreach { r =>
      val p = r.getAs[Long]("p_milli")
      val idx = (((n * p + 999) / 1000) - 1).toInt.max(0)
      assert(r.getAs[Long]("hi_cents") == spends(idx),
        s"nearest-rank threshold at p=$p")
    }
    val his = rows.map(_.getAs[Long]("hi_cents"))
    assert(his.zip(his.tail).forall { case (a, b) => a <= b })
    Seq("mean_a_winsor_micro", "mean_b_winsor_micro").foreach { c =>
      val ms = rows.map(_.getAs[Long](c))
      assert(ms.zip(ms.tail).forall { case (a, b) => a <= b },
        s"$c must be nondecreasing as the clip loosens")
    }
  }

  test("x395 BH step-up: rejections are a rank prefix, criticals relax down-rank, BH >= Holm") {
    val rows = SparkEntry.queries("x395_bh_fdr_scan")(spark, sf001)
      .orderBy("rank").collect()
    val flags = rows.map(_.getAs[Boolean]("bh_reject"))
    // step-up semantics: everything at or above the largest passing rank
    assert(!flags.zip(flags.tail).exists { case (a, b) => !a && b },
      "BH rejections must form a rank prefix")
    val crits = rows.map(_.getAs[Long]("crit_micro"))
    assert(crits.zip(crits.tail).forall { case (a, b) => a >= b },
      "the BH critical can only relax as rank grows")
    assert(crits.forall(_ >= 3841459L),
      "ladder discretization is conservative: never below the single-test crit")
    // BH is uniformly more powerful than Holm: every Holm rejection is a
    // BH rejection (over the SAME substrate and ladder)
    val holm = SparkEntry.queries("x367_holm_srm_scan")(spark, sf001)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Boolean]("holm_reject")).toMap
    rows.foreach { r =>
      if (holm(r.getAs[String]("event_type")))
        assert(r.getAs[Boolean]("bh_reject"),
          s"Holm rejected ${r.getAs[String]("event_type")} but BH did not")
    }
  }

  test("scale-shape pins: the round-12 rows plan what their scaladocs claim") {
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sf001)
        .queryExecution.optimizedPlan.toString
    def physical(name: String): String =
      SparkEntry.queries(name)(spark, sf001)
        .queryExecution.executedPlan.toString
    // x331 (r11 verdict task 4): the 3-row breaks side is explicitly
    // broadcast — the join must never fall back to a shuffle strategy,
    // whatever the stats/core environment says (the driver-vs-judge
    // fingerprint flip this pin closes)
    val p331 = physical("x331_session_threshold_curve")
    assert(!p331.contains("SortMergeJoin") && !p331.contains("ShuffledHashJoin"),
      "x331's domain joins must stay broadcast")
    // x384: every window is served from ONE per-user aggregate — the
    // 3-way explode must not re-scan events per window
    val p384 = plan("x384_funnel_window_curve")
    assert(p384.split("Relation").length - 1 == 1,
      s"x384 must scan events exactly once:\n$p384")
    // x380: the 4-look domain and the 1-row bounds both broadcast; a
    // shuffle join on either would put the per-user rollup on the wire
    // twice
    val p380 = physical("x380_obrien_fleming_scan")
    assert(!p380.contains("SortMergeJoin") && !p380.contains("ShuffledHashJoin"),
      "x380's domain joins must stay broadcast")
    // x388: within-class pairing is an equi-join on cls under the 64-doc
    // cap — never a product
    val p388 = physical("x388_phash_threshold_curve")
    assert(!p388.contains("CartesianProduct"),
      "x388 pairs must come from the class equi-join")
    // x378: the log-rank terms are duration-DOMAIN windows above the
    // per-day aggregate, never windows over the user-grain stream
    val p378 = plan("x378_logrank_test")
    val winIdx = p378.indexOf("Window")
    assert(winIdx >= 0 && p378.indexOf("Aggregate", winIdx) >= 0,
      s"x378: windows must sit above the day-domain aggregate:\n$p378")
  }

  test("x389 watermark curve: drop + buffered + on-time partitions the stream at every delay") {
    val rows = SparkEntry.queries("x389_watermark_delay_curve")(spark, sf001)
      .orderBy("delay_days").collect()
    assert(rows.map(_.getAs[Long]("delay_days")).toSeq == Seq(0L, 1L, 2L, 3L))
    val onTime = graft.Tables(spark, sf001, "events")
      .where(org.apache.spark.sql.functions.expr("event_id % 3 = 0")).count()
    rows.foreach { r =>
      // whatever the delay, the stream partitions into dropped /
      // late-but-kept / on-time — the on-time cohort is delay-invariant
      assert(r.getAs[Long]("n_events") - r.getAs[Long]("n_dropped")
        - r.getAs[Long]("n_late_kept") == onTime, s"partition identity at $r")
    }
    val drops = rows.map(_.getAs[Long]("n_dropped"))
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b },
      "a longer delay can only drop fewer events")
    val kept = rows.map(_.getAs[Long]("n_late_kept"))
    assert(kept.zip(kept.tail).forall { case (a, b) => a <= b },
      "a longer delay can only buffer more late events")
    // lag domain is {0,1,2} days: delay 2 and 3 both drop nothing
    assert(drops.takeRight(2).forall(_ == 0L))
  }

  test("x390 SRM drilldown: per-day chi-squares replay and contributions stay within budget") {
    val rows = SparkEntry.queries("x390_srm_daily_drilldown")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    val sumChi2 = rows.map(_.getAs[Long]("chi2_micro")).sum
    var sumContrib = 0L
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val chi2 = if (na + nb > 0) 1000000L * (na - nb) * (na - nb) / (na + nb) else 0L
      assert(r.getAs[Long]("chi2_micro") == chi2)
      assert(r.getAs[Boolean]("nominal_flag") == (chi2 >= 3841459L))
      assert(r.getAs[Long]("contrib_milli") ==
        (if (sumChi2 > 0) 1000L * chi2 / sumChi2 else 0L))
      sumContrib += r.getAs[Long]("contrib_milli")
    }
    // floor-truncated shares can only undershoot the whole
    assert(sumContrib <= 1000L && sumContrib > 1000L - rows.length,
      s"contribution shares must sum to 1000 within truncation: $sumContrib")
  }

  test("x391 novelty curve: cell means replay from a driver-side recount at k = 0") {
    val rows = SparkEntry.queries("x391_novelty_effect_curve")(spark, sf001)
      .orderBy("k").collect()
    assert(rows.nonEmpty && rows.head.getAs[Long]("k") == 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("delta_milli") ==
        r.getAs[Long]("mean_b_milli") - r.getAs[Long]("mean_a_milli"))
    }
    // day-0 replay: every user contributes to their own k = 0 cell, so
    // the user bases at k = 0 are the full per-arm populations
    val e = graft.Tables(spark, sf001, "events")
      .selectExpr("user_id", Experiment.ArmExpr + " as arm").distinct().collect()
    val k0 = rows.head
    assert(k0.getAs[Long]("n_users_a") == e.count(_.getLong(1) == 0L).toLong)
    assert(k0.getAs[Long]("n_users_b") == e.count(_.getLong(1) == 1L).toLong)
  }

  test("x384 funnel window curve: conversion is monotone in the window over one viewer base") {
    val rows = SparkEntry.queries("x384_funnel_window_curve")(spark, sf001)
      .orderBy("w_days").collect()
    assert(rows.map(_.getAs[Long]("w_days")).toSeq == Seq(1L, 3L, 7L))
    val viewers = rows.map(_.getAs[Long]("n_viewers")).distinct
    assert(viewers.length == 1, "every window is charged against the same viewer base")
    val convs = rows.map(_.getAs[Long]("n_conv"))
    assert(convs.zip(convs.tail).forall { case (a, b) => a <= b },
      "a wider window can only add conversions")
    rows.foreach(r => assert(r.getAs[Long]("conv_milli") ==
      1000L * r.getAs[Long]("n_conv") / r.getAs[Long]("n_viewers")))
  }
}
