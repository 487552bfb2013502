package graft

import org.apache.spark.sql.DataFrame

/** Physical-strategy invariance: results must not depend on which plan
  * Catalyst picks. Queries are re-run with planner-chosen broadcast joins
  * and AQE disabled and must produce row-identical results — the gate that
  * separates "right answer because the planner happened to broadcast" from
  * "right answer, period". At 100 TB these knobs WILL flip (per-stage sizes
  * cross thresholds, AQE re-plans mid-query), so semantics anchored to a
  * physical choice are latent wrong answers.
  *
  * Two groups, honestly separated: autoBroadcastJoinThreshold=-1 only
  * affects PLANNER-chosen broadcasts, so queries built with explicit
  * broadcast() hints keep their join strategy under it — for those, only
  * the AQE-off half does real work, and they are listed separately rather
  * than padding the strategy-flip group.
  */
class PlanRobustnessSpec extends SparkSpec {

  // at least one join (where joins exist) is planner-chosen — disabling
  // auto-broadcast genuinely changes these plans (b07's lineitem ⋈ orders
  // and x46's dl join are unhinted even though their dims are); the
  // join-free window/agg queries ride along for the AQE-off half
  private val strategyFree = Seq(
    "q18_large_orders", "c16_composite_key_join", "x43_merge_upsert",
    "x44_scd2_history", "x49_funnel", "b05b_decorrelated_join",
    "b07_multijoin_revenue", "x46_bm25_rank",
    // round 4: x45's tf ⋈ df and x58's dl join are planner-chosen, and
    // both route their top-k through custom operators (GroupedTopK) whose
    // results must not depend on the physical join strategy around them
    "x45_tfidf_topterms", "x58_bm25_from_index",
    // round 6 stored serving paths: the vocab-segmentation joins (x61/x63)
    // and the band-probe join (x66) are planner-chosen; the pruned index
    // scans (x62/x68) ride along for the AQE-off half — a serving path
    // whose answer depended on a physical choice would corrupt quietly at
    // the exact moment a cell crosses a size threshold
    "x61_bpe_tokenize_scale", "x63_bpe_tokenize_stored",
    "x66_incremental_lsh_stored", "x62_ann_ivf_stored", "x68_ann_ivfpq",
    // round 7: the manifest-resolved probe rides the AQE-off half like
    // x62; the batch probes' candidate joins are broadcast()-hinted and
    // live in the hinted group below
    "x73_ann_ivf_manifest",
    // round 9: the concentration metrics' dim joins (x220 customer,
    // x221 supplier/nation), the prefix-filter posting joins (x225 df +
    // candidate + verify; x227 the same against stored postings), and
    // the DV anti-join (x229) are all planner-chosen — an integer-exact
    // statistic that shifted under a strategy flip would be a silent
    // wrong answer at exactly the scale where thresholds flip
    "x220_gini_concentration", "x221_hhi_concentration",
    "x225_allpairs_prefix_join", "x227_allpairs_incremental",
    "x229_deletion_vectors",
    // round-9 fifth arc: the assortativity degree joins (x242), the
    // Spearman orders ⋈ customer join (x244), the Mann-Whitney
    // lineitem ⋈ part join (x245), the Q-Q full-outer grid merge (x252)
    // and the landmark probe joins (x254) are all planner-chosen
    "x242_degree_assortativity", "x244_spearman_rank",
    "x245_mannwhitney_u", "x252_qq_decile_drift", "x254_landmark_distance")

  // EVERY join in these is broadcast()-hinted, so the threshold knob is a
  // no-op by construction; they verify independence from AQE re-planning
  private val hinted = Seq("x24_decontaminate", "x27_knn_join",
    "x64_semantic_dedup_incremental",
    // round 7 batch serving: probe-pair / candidate / query joins are all
    // broadcast()-hinted; a GroupedTopK or stacked-LUT result that shifted
    // under AQE re-planning would corrupt batch serving silently
    "x71_ann_ivf_batch", "x75_ann_ivfpq_batch", "x76_ann_batch_rerank",
    "x77_ann_ivfpqr_batch")

  // sorted stringified rows: content equality as a multiset. Some queries'
  // ORDER BY is not a total order (e.g. c16 — the synthetic lineitem has
  // duplicate (l_orderkey, l_linenumber) keys), so tie order may
  // legitimately differ between plans; the driver's oracle compare likewise
  // sorts before hashing. Doubles are rounded to 9 significant digits
  // before comparing: physically different plans (broadcast vs sort-merge,
  // AQE on/off) may legally accumulate double sums in a different row
  // order, differing in the last ulp — the driver's compare rounds for
  // exactly this reason, and an exact-ulp gate here would be flaky.
  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case d: Double =>
        String.format(java.util.Locale.ROOT, "%.8e", Double.box(d))
      case f: Float =>
        String.format(java.util.Locale.ROOT, "%.5e", Float.box(f))
      case v => String.valueOf(v)
    }.mkString("[", ",", "]")).toSeq.sorted

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  for (name <- strategyFree) {
    test(s"$name: identical results with broadcast joins and AQE disabled") {
      val baseline = rows(SparkEntry.queries(name)(spark, sf001))
      withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val hostile = rows(SparkEntry.queries(name)(spark, sf001))
        assert(hostile == baseline,
          s"$name diverged under no-broadcast/no-AQE planning: " +
            s"${hostile.size} vs ${baseline.size} rows")
      }
    }
  }

  for (name <- hinted) {
    test(s"$name: identical results with AQE disabled (joins hint-pinned)") {
      val baseline = rows(SparkEntry.queries(name)(spark, sf001))
      withConfs("spark.sql.adaptive.enabled" -> "false") {
        val hostile = rows(SparkEntry.queries(name)(spark, sf001))
        assert(hostile == baseline,
          s"$name diverged with AQE disabled: " +
            s"${hostile.size} vs ${baseline.size} rows")
      }
    }
  }
}
