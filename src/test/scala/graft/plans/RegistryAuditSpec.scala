package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Registry-wide cartesian gate: every one of the ~290 registry queries
  * is planned and audited; a nested-loop/cartesian join may appear ONLY
  * on the explicit whitelist below, each entry carrying its bound. A new
  * query that introduces an unlisted cartesian fails the suite — the
  * systemic version of the per-query plan-shape specs, and the teeth
  * behind the "no all-pairs product anywhere" claim.
  *
  * PlanAudit already ignores nested-loop joins against a PROVABLY tiny
  * side (global aggregate = 1 row, literal local tables, limits) — the
  * registry's pervasive `crossJoin(broadcast(bound))` idiom. What
  * remains, whitelisted here, are joins whose small side is bounded by
  * QUERY SEMANTICS the plan can't see statically:
  *   - ANN serving: a query batch (1–8 rows, or |Q|×shards routing) fans
  *     onto the corpus/centroids — bounded by the serving-batch
  *     contract, never corpus×corpus;
  *   - domain lattices: day-domain pair grids (x163/x214), sketch/
  *     audience overlap matrices (x171/x172), blocked string pairs
  *     (x05/x159) — all over aggregates bounded by a domain, with the
  *     bound stated in each operator's scaladoc.
  */
class RegistryAuditSpec extends SparkSpec {

  private val allowedCartesians: Map[String, String] = Map(
    "x05_ngram_jaccard" -> "blocked shingle-pair candidates (doc-pair domain)",
    "x06_cosine_topk" -> "1-row query vector fans onto the corpus scan",
    "x07_ann_lsh_topk" -> "1-row query vector onto bucketed candidates",
    "x07b_ann_ivf_topk" -> "1-row query vector onto pruned cells",
    "x09_embedding_near_dup" -> "projection-bucketed pair candidates",
    "x109_ann_lsh_multiprobe" -> "1-row query onto multiprobe buckets",
    "x127_knn_graph" -> "query replication to shards (|Q| x shard-count routing)",
    "x128_ann_hnsw_stored" -> "8-query batch x shard-count routing",
    "x132_ann_hnsw_append" -> "8-query batch x shard-count routing",
    "x159_jaro_winkler" -> "phonetic-blocked name pairs (block-bounded)",
    "x163_sliding_distinct" -> "day-domain x window-offset lattice",
    "x170_knn_label_eval" -> "holdout batch fans onto the corpus scan",
    "x171_audience_overlap" -> "type-pair lattice over per-type audiences",
    "x172_sketch_overlap" -> "type-pair lattice over 256-register sketches",
    "x204_matryoshka_recall" -> "1-row query vector x 4 prefix dims",
    "x214_theil_sen" -> "day-domain pair lattice (documented bound)",
    "x228_mann_kendall" -> "day-domain sign lattice (the x214 bound)",
    "x235_chi2_independence" -> "langs x sources contingency lattice (dimension domains)",
    "x246_kendall_tau" -> "qty x discount domain-grid pair lattice (<=550 cells)",
    "x247_cramers_v" -> "langs x sources contingency lattice (the x235 bound)",
    "x216_ann_hnsw_filtered" -> "1-query batch x shard-count routing",
    "x27_knn_join" -> "8-row batch fans onto the corpus scan",
    "x279_range_search_exact" -> "8-query batch fans onto the corpus scan",
    "x276_hubness_audit" -> "500-query eval sample fans onto the corpus scan",
    "x50_hard_negatives" -> "anchor batch fans onto candidate pool",
    "x95_ann_recall_eval" -> "eval query batch onto corpus + index",
    // round 12: the SQ8 eval trio shares x95's serving-batch contract
    // (8-query batch fans onto two corpus scans via sq8AndExactTop10)
    "x376_ann_recall_sq8_exact" -> "8-query batch fans onto the corpus scan",
    "x385_ndcg_sq8_exact" -> "8-query batch fans onto the corpus scan",
    "x386_mrr_sq8_exact" -> "8-query batch fans onto the corpus scan",
    // round 13: the rank-correlation monitor shares the same batches
    "x397_rank_tau_sq8_exact" -> "8-query batch fans onto the corpus scan",
    "x380_obrien_fleming_scan" -> "4-look domain broadcast onto the per-user rollup")

  test("no registry query introduces an unlisted cartesian join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val carts = PlanAudit.audit(fn(spark, sf001)).byRule("cartesian")
          if (carts.nonEmpty && !allowedCartesians.contains(name))
            Some(name -> carts.head.node)
          else None
        } catch {
          // a query that cannot even plan fails louder elsewhere (Verify)
          case _: Throwable => None
        }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, node) => s"$n: $node" }.mkString("\n"))
    // the whitelist must not go stale: every entry still plans a
    // nested-loop join (an entry that stops needing its exemption gets
    // removed, keeping the list honest)
    val stale = allowedCartesians.keys.filter { name =>
      SparkEntry.queries.get(name).exists { fn =>
        try PlanAudit.audit(fn(spark, sf001)).byRule("cartesian").isEmpty
        catch { case _: Throwable => false }
      }
    }
    assert(stale.isEmpty, s"stale whitelist entries: ${stale.mkString(", ")}")
  }
}
