package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the order co-purchase graph — the relational
  * fixture's natural graph (two parts are linked when some order contains
  * both), the same shape as the user-interaction / citation / link graphs
  * a production corpus curation stack mines for communities, influence
  * and recommendations.
  *
  * All four oracled queries are EXACT integer algorithms, so every result
  * hash-verifies bit-identically against DuckDB: triangle counting and
  * local clustering coefficients (the community-structure census),
  * fixed-iteration integer PageRank (influence), common-neighbor /
  * Jaccard link prediction (recommendation candidates), and the degree
  * survival profile (the power-law report a partitioning decision reads).
  *
  * Scale shapes, per operator, are documented on each method; the common
  * ground: the edge list is built ONCE per query from a single fact-table
  * scan (per-order part lists are order-sized — TPC-H orders hold ≤ 7
  * lines — so the pair explosion is bounded per row), every node-level
  * side table (degrees, ranks) is node-sized and broadcastable, and no
  * operator ever materializes an all-pairs product: triangle and wedge
  * joins are bounded by graph arboricity / Σ C(deg,2), the quantities the
  * published MapReduce triangle literature (Suri & Vassilvitskii 2011)
  * bounds for real sparse graphs.
  */
object Graph {

  private def lineitem(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")

  /** Undirected co-purchase edge list, canonical `pa < pb`, deduplicated.
    * ONE scan: per-order distinct part sets (order-sized arrays), pairs by
    * a bounded double explode, then one (pa, pb) distinct exchange. The
    * self-join formulation the oracle uses scans the fact table twice and
    * shuffles it twice; this form shuffles the fact rows once into
    * order-sized groups and the deduplicated pairs once.
    */
  private[queries] def copurchaseEdges(li: DataFrame): DataFrame =
    li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
      .select(explode(col("parts")).as("pa"), col("parts"))
      .select(col("pa"), explode(col("parts")).as("pb"))
      .where(col("pa") < col("pb"))
      .distinct()

  /** Node degrees of the undirected edge list — node-sized. */
  private[queries] def degrees(e: DataFrame): DataFrame =
    e.select(col("pa").as("node")).unionAll(e.select(col("pb").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** Unpersist a superseded localCheckpoint'd table. The iterative
    * operators below checkpoint once per superstep; without this, every
    * invocation would strand iters×(edge-table) blocks in executor
    * storage until the context cleaner happens to collect them — at
    * bench/Verify registry scale that is real memory pressure (the
    * ADVICE-r7 retention note, fixed at the source). Only SUPERSEDED
    * generations are dropped: the final checkpoint backs the returned
    * DataFrame and stays.
    */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Exact per-node triangle counts + local clustering coefficient
    * (thousandths). Degree-ordered orientation (Suri & Vassilvitskii
    * 2011): each undirected edge is directed from its lower (deg, id)
    * endpoint to its higher, so every triangle is enumerated exactly once
    * as src→mid→dst and — the scale point — the wedge join's fan-out per
    * node is bounded by its ORIENTED out-degree, which the (deg, id)
    * order caps near √m even at power-law hubs (a hub's edges all point
    * INTO it, so it never anchors a quadratic wedge explosion; the id
    * orientation the oracle uses enumerates the same triangle set but
    * lets a low-id hub fan out by its full degree). Joins carry 16-byte
    * id pairs only; the degree side table is node-sized and broadcast.
    *
    * Output is orientation-invariant — (part, deg, triangles, cc_milli)
    * — which is what lets the DuckDB oracle verify the degree-ordered
    * plan with its simpler id-ordered join, hash-exactly.
    */
  def triangleCensus(li: DataFrame): DataFrame = {
    val e = copurchaseEdges(li)
    val deg = degrees(e)
    // orient each edge from lower (deg, id) endpoint to higher
    val o = e
      .join(broadcast(deg.select(col("node").as("pa"), col("deg").as("dega"))), "pa")
      .join(broadcast(deg.select(col("node").as("pb"), col("deg").as("degb"))), "pb")
      .select(
        when(col("dega") < col("degb") ||
            (col("dega") === col("degb") && col("pa") < col("pb")),
          struct(col("pa").as("src"), col("pb").as("dst")))
          .otherwise(struct(col("pb").as("src"), col("pa").as("dst")))
          .as("d"))
      .select(col("d.src").as("src"), col("d.dst").as("dst"))
    val tri = o.as("e1")
      .join(o.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      .join(o.as("e3"), col("u") === col("e3.src") && col("w") === col("e3.dst"))
      .select("u", "v", "w")
    val perNode = tri.select(col("u").as("node"))
      .unionAll(tri.select(col("v").as("node")))
      .unionAll(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node").as("part"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("cc_milli",
        when(col("deg") > 1, expr("(2000 * triangles) div (deg * (deg - 1))"))
          .otherwise(lit(0L)))
      .orderBy("part")
  }

  private val triangleOracle =
    """WITH e AS (
         SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
         FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         WHERE a.l_partkey < b.l_partkey),
       deg AS (
         SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
         GROUP BY 1),
       tri AS (
         SELECT e1.pa AS u, e1.pb AS v, e2.pb AS w
         FROM e e1
         JOIN e e2 ON e1.pb = e2.pa
         JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
       tn AS (
         SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
         FROM (SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
               UNION ALL SELECT w FROM tri)
         GROUP BY 1)
       SELECT d.node AS part, d.deg,
         COALESCE(t.triangles, CAST(0 AS BIGINT)) AS triangles,
         CASE WHEN d.deg > 1
           THEN (2000 * COALESCE(t.triangles, 0)) // (d.deg * (d.deg - 1))
           ELSE CAST(0 AS BIGINT) END AS cc_milli
       FROM deg d LEFT JOIN tn t ON d.node = t.node
       ORDER BY part"""

  private val x123 = GQuery(
    "x123_triangle_census", "ext-graph triangle-count clustering-coefficient",
    (s, dir) => triangleCensus(lineitem(s, dir)),
    Some(triangleOracle))

  /** Fixed-iteration INTEGER PageRank (damping 0.85, ranks in micros).
    * All arithmetic is 64-bit integer — contribution = rank div outdeg,
    * update = 150000 + (850 · Σ contrib) div 1000 — so the result is a
    * pure function of the graph with no float summation order anywhere,
    * which is what lets an iterative influence ranking hash-verify
    * bit-identically against a different engine (the DuckDB oracle
    * unrolls the same eight iterations as chained CTEs). The co-purchase
    * graph is symmetric and edge-derived, so every node has outdeg ≥ 1 —
    * no dangling-mass term.
    *
    * Scale shape: the (src, dst, outdeg) edge table is built once and
    * localCheckpoint'd (eight iterations re-read it without recompute; at
    * cluster scale the same role is played by a persisted, pre-partitioned
    * edge table). Each iteration is ONE join of the edge table with the
    * node-sized rank table on src and ONE dst-keyed partial-aggregated
    * sum — the textbook Pregel superstep expressed relationally. Rank
    * tables are checkpointed per iteration to keep lineage flat; the ≤
    * iters cached node-sized tables are bounded by the node count, not
    * the corpus.
    */
  def pagerank(li: DataFrame, iters: Int): DataFrame =
    pagerankOnEdges(copurchaseEdges(li), iters)
      .select(col("node").as("part"), col("rank").as("rank_micros"))
      .orderBy(col("rank_micros").desc, col("part"))

  /** The integer-PageRank superstep loop over ANY undirected edge list
    * `(pa, pb)` — node type agnostic (x124 ranks part ids; x138 ranks
    * words). Returns (node, rank) unordered.
    */
  private[queries] def pagerankOnEdges(e: DataFrame, iters: Int): DataFrame = {
    val directed = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
    val deg = directed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // edge partition count sized to keep per-superstep task overhead
    // bounded at fixture scale; a cluster run sizes this to the edge
    // volume instead (the superstep SHAPE is partition-count-agnostic)
    val withDeg = directed.join(deg, "src").coalesce(8).localCheckpoint(true)
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
      .coalesce(1).localCheckpoint(true)
    for (_ <- 1 to iters) {
      // rank table is node-sized → broadcast, so a superstep never
      // re-shuffles the (much larger) edge table: narrow map over the
      // checkpointed edges + ONE dst-keyed partial-agg exchange. At
      // node counts past broadcast range the production form pre-buckets
      // edges by src and co-partitions ranks instead — same superstep,
      // shuffle bounded by the node table either way.
      // the graph is symmetric with deg >= 1, so EVERY node receives at
      // least one contribution — the aggregate itself enumerates the full
      // node set and no join-back with the previous rank table is needed
      // (a directed/dangling variant would need the oracle's LEFT JOIN)
      val next = withDeg.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(850 * c) div 1000")).as("rank"))
        .coalesce(1).localCheckpoint(true)
      dropCheckpoint(ranks)
      ranks = next
    }
    dropCheckpoint(withDeg)
    ranks
  }

  /** DuckDB oracle: the same eight integer supersteps, unrolled as
    * chained CTEs (recursive CTEs forbid aggregation in the recursive
    * term, so fixed-iteration unrolling is the portable form).
    */
  private def pagerankOracle(iters: Int): String = {
    val head =
      """WITH e AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey <> b.l_partkey),
         deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank FROM deg)"""
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
           SELECT d.src AS node,
             150000 + (850 * COALESCE(s.c, 0)) // 1000 AS rank
           FROM deg d LEFT JOIN (
             SELECT e.dst AS node2, CAST(SUM(r.rank // g.outdeg) AS BIGINT) AS c
             FROM e JOIN r${i - 1} r ON e.src = r.node
                    JOIN deg g ON g.src = e.src
             GROUP BY 1) s
           ON s.node2 = d.src)"""
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node AS part, CAST(rank AS BIGINT) AS rank_micros FROM r$iters " +
      "ORDER BY rank_micros DESC, part"
  }

  private val x124 = GQuery(
    "x124_copurchase_pagerank", "ext-graph pagerank integer-iterative",
    (s, dir) => pagerank(lineitem(s, dir), iters = 8),
    Some(pagerankOracle(8)))

  /** Personalized PageRank from a single deterministic seed (the max-
    * degree node, ties to the smaller id — "customers who bought THIS
    * part also orbit these"): the restart mass lands only on the seed,
    * so rank concentrates in the seed's neighborhood instead of spreading
    * by global degree — the recommendation/related-items variant of x124
    * (Jeh & Widom 2003). Same integer-micros discipline and the same
    * superstep economy: the seed id is an artifact-sized driver constant
    * (one 1-row collect, like a codebook), each superstep is one
    * broadcast-rank join + one dst-keyed partial agg over the
    * checkpointed edges, and ranks stay exact BIGINTs so eight unrolled
    * CTEs in DuckDB replay them bit-identically.
    */
  def personalizedPagerank(li: DataFrame, iters: Int): DataFrame = {
    val e = copurchaseEdges(li)
    val directed = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
    val deg = directed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val seed = deg.orderBy(col("outdeg").desc, col("src"))
      .limit(1).collect()(0).getLong(0)
    val withDeg = directed.join(deg, "src").coalesce(8).localCheckpoint(true)
    var ranks = deg.select(col("src").as("node"),
      when(col("src") === seed, lit(1000000L)).otherwise(lit(0L)).as("rank"))
      .coalesce(1).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val next = withDeg.join(broadcast(ranks), col("src") === col("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
        .select(col("dst").as("node"),
          (when(col("dst") === seed, lit(150000L)).otherwise(lit(0L)) +
            expr("(850 * c) div 1000")).as("rank"))
        .coalesce(1).localCheckpoint(true)
      dropCheckpoint(ranks)
      ranks = next
    }
    dropCheckpoint(withDeg)
    ranks.where(col("rank") > 0)
      .select(col("node").as("part"), col("rank").as("rank_micros"))
      .orderBy(col("rank_micros").desc, col("part"))
  }

  private def ppagerankOracle(iters: Int): String = {
    val head =
      """WITH e AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey <> b.l_partkey),
         deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         seed AS (SELECT src AS sid FROM deg ORDER BY outdeg DESC, src LIMIT 1),
         r0 AS (SELECT d.src AS node,
             CAST(CASE WHEN d.src = s.sid THEN 1000000 ELSE 0 END AS BIGINT) AS rank
           FROM deg d CROSS JOIN seed s)"""
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
           SELECT d.src AS node,
             CAST(CASE WHEN d.src = se.sid THEN 150000 ELSE 0 END AS BIGINT)
               + (850 * COALESCE(s.c, 0)) // 1000 AS rank
           FROM deg d CROSS JOIN seed se LEFT JOIN (
             SELECT e.dst AS node2, CAST(SUM(r.rank // g.outdeg) AS BIGINT) AS c
             FROM e JOIN r${i - 1} r ON e.src = r.node
                    JOIN deg g ON g.src = e.src
             GROUP BY 1) s
           ON s.node2 = d.src)"""
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node AS part, CAST(rank AS BIGINT) AS rank_micros FROM r$iters " +
      "WHERE rank > 0 ORDER BY rank_micros DESC, part"
  }

  private val x168 = GQuery(
    "x168_personalized_pagerank", "ext-graph personalized-pagerank",
    (s, dir) => personalizedPagerank(lineitem(s, dir), iters = 8),
    Some(ppagerankOracle(8)))

  /** Common-neighbor / Jaccard link prediction among the top-`candN`
    * highest-degree nodes: the top-100 NON-adjacent candidate pairs by
    * shared co-purchase neighbors — "customers who bought these also
    * bought" recommendations, exact and integer (jaccard in thousandths)
    * so the ranking hash-verifies.
    *
    * The candidate restriction is the scale decision, not a shortcut:
    * the UNRESTRICTED wedge table is Σ_v C(deg(v), 2) — ~63M rows on the
    * sf0.1 graph (avg degree ~80), quadratic in density — while a
    * recommender only ever ranks links among head entities. Restricting
    * BOTH wedge endpoints to a broadcast candidate set (top-candN by
    * (deg, id), deterministic) prunes the wedge join at the adjacency
    * scan, |candN/|V||² of the pairs, while the center v still ranges
    * over ALL nodes — common-neighbor counts are exact, not sampled.
    * Pair counts aggregate with map-side partials, existing edges leave
    * via one anti-join, top-100 is a TakeOrderedAndProject.
    */
  def linkPrediction(li: DataFrame, candN: Int, topN: Int): DataFrame = {
    val e = copurchaseEdges(li)
    val deg = degrees(e)
    val cand = deg.orderBy(col("deg").desc, col("node")).limit(candN)
      .select(col("node"))
    val directed = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
      // only adjacency rows ENDING in a candidate can form a ranked pair
      .join(broadcast(cand.withColumnRenamed("node", "dst")), Seq("dst"), "left_semi")
    val wedges = directed.as("d1")
      .join(directed.as("d2"), col("d1.src") === col("d2.src"))
      .where(col("d1.dst") < col("d2.dst"))
      .select(col("d1.dst").as("ua"), col("d2.dst").as("ub"))
    val common = wedges.groupBy("ua", "ub").agg(count(lit(1)).as("n_common"))
      .join(e.select(col("pa").as("ua"), col("pb").as("ub")),
        Seq("ua", "ub"), "left_anti")
    common
      .join(broadcast(deg.select(col("node").as("ua"), col("deg").as("dega"))), "ua")
      .join(broadcast(deg.select(col("node").as("ub"), col("deg").as("degb"))), "ub")
      .select(col("ua"), col("ub"), col("n_common"),
        expr("(1000 * n_common) div (dega + degb - n_common)").as("jaccard_milli"))
      .orderBy(col("n_common").desc, col("ua"), col("ub"))
      .limit(topN)
  }

  private val linkOracle =
    """WITH e AS MATERIALIZED (
         SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
         FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         WHERE a.l_partkey < b.l_partkey),
       deg AS MATERIALIZED (
         SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
         GROUP BY 1),
       cand AS MATERIALIZED (
         SELECT node FROM deg ORDER BY deg DESC, node LIMIT 500),
       adj AS MATERIALIZED (
         SELECT src, dst FROM (
           SELECT pa AS src, pb AS dst FROM e
           UNION ALL SELECT pb AS src, pa AS dst FROM e)
         WHERE dst IN (SELECT node FROM cand)),
       wedge AS (
         SELECT d1.dst AS ua, d2.dst AS ub
         FROM adj d1 JOIN adj d2 ON d1.src = d2.src
         WHERE d1.dst < d2.dst),
       common AS (
         SELECT ua, ub, CAST(COUNT(*) AS BIGINT) AS n_common
         FROM wedge GROUP BY 1, 2),
       nonadj AS (
         SELECT c.* FROM common c
         WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = c.ua AND e.pb = c.ub))
       SELECT n.ua, n.ub, n.n_common,
         (1000 * n.n_common) // (da.deg + db.deg - n.n_common) AS jaccard_milli
       FROM nonadj n
       JOIN deg da ON da.node = n.ua
       JOIN deg db ON db.node = n.ub
       ORDER BY n.n_common DESC, n.ua, n.ub
       LIMIT 100"""

  private val x126 = GQuery(
    "x126_link_prediction", "ext-graph link-prediction common-neighbors",
    (s, dir) => linkPrediction(lineitem(s, dir), candN = 500, topN = 100),
    Some(linkOracle))

  /** Degree survival profile — the power-law census a partitioning /
    * salting decision reads before picking a strategy (x106 names the
    * heavy keys; this names the whole distribution): per distinct degree,
    * the node count and the survival share of nodes with degree ≥ d in
    * thousandths. The histogram is degree-domain-sized (≤ max-degree
    * rows), so the single-partition cumulative window at the end runs
    * over a tiny aggregate, never over data — the same shape x106/x119
    * pin.
    */
  def degreeProfile(li: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("deg").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    degrees(copurchaseEdges(li))
      .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
      .withColumn("ge_nodes", sum(col("n_nodes")).over(w))
      .withColumn("total", sum(col("n_nodes")).over(wAll))
      .select(col("deg"), col("n_nodes"), col("ge_nodes"),
        expr("(1000 * ge_nodes) div total").as("survival_milli"))
      .orderBy("deg")
  }

  private val degreeOracle =
    """WITH e AS (
         SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
         FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         WHERE a.l_partkey < b.l_partkey),
       deg AS (
         SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
         GROUP BY 1),
       h AS (SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1)
       SELECT deg, n_nodes,
         CAST(SUM(n_nodes) OVER (ORDER BY deg DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ge_nodes,
         (1000 * CAST(SUM(n_nodes) OVER (ORDER BY deg DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
           // CAST(SUM(n_nodes) OVER () AS BIGINT) AS survival_milli
       FROM h ORDER BY deg"""

  private val x129 = GQuery(
    "x129_degree_profile", "ext-graph degree-distribution survival",
    (s, dir) => degreeProfile(lineitem(s, dir)),
    Some(degreeOracle))

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), made fully deterministic: labels start as node ids; each of
    * `iters` SYNCHRONOUS rounds every node adopts the most frequent label
    * among its neighbors, ties to the SMALLEST label. Deterministic
    * synchronous rounds + integer tie-breaks are what make an otherwise
    * notoriously order-sensitive heuristic hash-verifiable bit-identically
    * cross-engine (the DuckDB oracle unrolls the same rounds as chained
    * CTEs; the usual asynchronous/randomized variant could never be
    * oracled).
    *
    * Scale shape: per round, ONE join of the checkpointed symmetric
    * adjacency with the node-sized label table and one (node, label)
    * partial-aggregated count, argmax via a per-node window over the
    * label-count rows (per-node fan-in = its degree). Same Pregel
    * superstep shape as [[pagerank]].
    */
  def labelPropagation(li: DataFrame, iters: Int): DataFrame = {
    val e = copurchaseEdges(li)
    val adj = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
      .coalesce(8).localCheckpoint(true)
    var labels = adj.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .coalesce(1).localCheckpoint(true)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cnt").desc, col("label"))
    for (_ <- 1 to iters) {
      // labels are node-sized → broadcast (the x124 superstep economy)
      val next = adj.join(broadcast(labels), col("dst") === col("node"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("src").as("node"), col("label"))
        .coalesce(1).localCheckpoint(true)
      dropCheckpoint(labels)
      labels = next
    }
    dropCheckpoint(adj)
    labels.select(col("node").as("part"), col("label").as("community"))
      .orderBy("part")
  }

  private def labelPropOracle(iters: Int): String = {
    val head =
      """WITH ed AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey <> b.l_partkey),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed)"""
    val steps = (1 to iters).map { i =>
      s"""l$i AS (
           SELECT node, label FROM (
             SELECT a.src AS node, l.label, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY a.src
                 ORDER BY COUNT(*) DESC, l.label) AS rn
             FROM ed a JOIN l${i - 1} l ON a.dst = l.node
             GROUP BY a.src, l.label)
           WHERE rn = 1)"""
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node AS part, label AS community FROM l$iters ORDER BY part"
  }

  private val x130 = GQuery(
    "x130_label_propagation", "ext-graph community-detection label-propagation",
    (s, dir) => labelPropagation(lineitem(s, dir), iters = 4),
    Some(labelPropOracle(4)))

  /** k-core extraction by synchronous peeling: `rounds` rounds of "drop
    * every node with degree < k, with all its edges", then report the
    * surviving nodes with their in-core degree — the density filter that
    * isolates a graph's cohesive kernel (spam-farm detection, community
    * seeding). Synchronous fixed-round peeling is deterministic whether
    * or not it has converged, so the result hash-verifies; GraphSpec
    * separately proves the fixture converges within the budget (one more
    * round is a fixed point), which is the textbook O(max-core) bound in
    * practice — degenerate chains that need more rounds only ever UNDER-
    * peel, never produce wrong members of the true core.
    *
    * Scale shape: per round, one node-sized degree aggregate and two
    * semi-joins of the edge list against the (broadcast-sized) survivor
    * set; the edge table shrinks monotonically and is checkpointed per
    * round.
    */
  def kCore(li: DataFrame, k: Int, rounds: Int): DataFrame = {
    var edges = copurchaseEdges(li).coalesce(8).localCheckpoint(true)
    var prevCount = edges.count()
    var round = 0
    var stable = false
    // peel up to `rounds` times, but STOP at the fixed point: once a peel
    // removes nothing, every further round is the identity, so the early
    // exit returns exactly what the full unrolled-(rounds) oracle computes
    // — a pure cost cut, not an approximation (the fixture reaches the
    // fixed point in 1-2 peels; the budget only caps degenerate chains)
    while (round < rounds && !stable) {
      val keep = degrees(edges).where(col("deg") >= k).select("node")
      val next = edges
        .join(broadcast(keep.withColumnRenamed("node", "pa")), Seq("pa"), "left_semi")
        .join(broadcast(keep.withColumnRenamed("node", "pb")), Seq("pb"), "left_semi")
        .select("pa", "pb")
        .coalesce(8).localCheckpoint(true)
      val nextCount = next.count()
      stable = nextCount == prevCount
      prevCount = nextCount
      dropCheckpoint(edges)
      edges = next
      round += 1
    }
    degrees(edges).where(col("deg") >= k)
      .select(col("node").as("part"), col("deg").as("core_deg"))
      .orderBy("part")
  }

  private def kCoreOracle(k: Int, rounds: Int): String = {
    val head =
      """WITH e0 AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey)"""
    val steps = (1 to rounds).map { i =>
      s"""k$i AS MATERIALIZED (
           SELECT node FROM (
             SELECT node, COUNT(*) AS deg
             FROM (SELECT pa AS node FROM e${i - 1}
                   UNION ALL SELECT pb FROM e${i - 1})
             GROUP BY 1)
           WHERE deg >= $k),
         e$i AS MATERIALIZED (
           SELECT e.pa, e.pb FROM e${i - 1} e
           WHERE e.pa IN (SELECT node FROM k$i)
             AND e.pb IN (SELECT node FROM k$i))"""
    }
    (head +: steps).mkString(",\n") +
      s"""
         SELECT node AS part, deg AS core_deg FROM (
           SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM (SELECT pa AS node FROM e$rounds
                 UNION ALL SELECT pb FROM e$rounds)
           GROUP BY 1)
         WHERE deg >= $k ORDER BY part"""
  }

  private val x131 = GQuery(
    "x131_kcore", "ext-graph kcore density-peeling",
    (s, dir) => kCore(lineitem(s, dir), k = 3, rounds = 8),
    Some(kCoreOracle(3, 8)))

  /** Market-basket association rules (Agrawal & Srikant 1994's level-2
    * output): DIRECTED rules a→b over order baskets with support,
    * confidence and lift — all exact integer ratios (micros/millis) so
    * the mined ruleset hash-verifies. Support counts come from the same
    * bounded per-order pair explosion as [[copurchaseEdges]] (kept as
    * counts instead of collapsed to distinct); the min-support filter is
    * applied BEFORE any join — the Apriori pruning insight — so only
    * frequent pairs reach the rule arithmetic. Item counts and the basket
    * total are item-domain-sized and broadcast.
    */
  def associationRules(li: DataFrame, minSup: Int, topN: Int): DataFrame = {
    val baskets = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    val pairCounts = baskets
      .select(explode(col("parts")).as("a"), col("parts"))
      .select(col("a"), explode(col("parts")).as("b"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSup)
    val itemCounts = baskets.select(explode(col("parts")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_item"))
    val total = baskets.agg(count(lit(1)).as("n_baskets"))
    pairCounts
      .join(broadcast(itemCounts.select(col("item").as("a"), col("n_item").as("n_a"))), "a")
      .join(broadcast(itemCounts.select(col("item").as("b"), col("n_item").as("n_b"))), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"),
        expr("(1000000 * n_ab) div n_baskets").as("supp_micro"),
        expr("(1000 * n_ab) div n_a").as("conf_milli"),
        expr("(1000 * n_ab * n_baskets) div (n_a * n_b)").as("lift_milli"))
      .orderBy(col("lift_milli").desc, col("a"), col("b"))
      .limit(topN)
  }

  private val rulesOracle =
    """WITH b AS MATERIALIZED (
         SELECT l_orderkey, list_distinct(list(l_partkey)) AS parts
         FROM lineitem GROUP BY 1),
       pc AS MATERIALIZED (
         SELECT a.l_partkey AS a, bb.l_partkey AS b,
           CAST(COUNT(DISTINCT a.l_orderkey) AS BIGINT) AS n_ab
         FROM lineitem a JOIN lineitem bb ON a.l_orderkey = bb.l_orderkey
         WHERE a.l_partkey <> bb.l_partkey
         GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
       ic AS MATERIALIZED (
         SELECT l_partkey AS item,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_item
         FROM lineitem GROUP BY 1),
       t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets FROM b)
       SELECT p.a, p.b, p.n_ab,
         (1000000 * p.n_ab) // t.n_baskets AS supp_micro,
         (1000 * p.n_ab) // ia.n_item AS conf_milli,
         (1000 * p.n_ab * t.n_baskets) // (ia.n_item * ib.n_item) AS lift_milli
       FROM pc p
       JOIN ic ia ON ia.item = p.a
       JOIN ic ib ON ib.item = p.b
       CROSS JOIN t
       ORDER BY lift_milli DESC, p.a, p.b
       LIMIT 100"""

  private val x133 = GQuery(
    "x133_association_rules", "ext-graph association-rules market-basket",
    (s, dir) => associationRules(lineitem(s, dir), minSup = 2, topN = 100),
    Some(rulesOracle))

  /** Bounded multi-source BFS: hop distance from the SEED node (smallest
    * part id — deterministic) to every node within `hops` hops — the
    * blast-radius / reachability query (dependency impact, contamination
    * spread). Frontier expansion as iterated relational min-distance:
    * dist_k = min(dist_{k-1}, 1 + dist of any in-neighbor) — each round
    * is one edge⋈frontier join + a min-aggregate, the Pregel SSSP
    * superstep. The frontier table is ≤ node-sized and broadcast; rounds
    * are checkpointed and superseded generations dropped (the x124
    * hygiene). Unreached nodes are absent (no sentinel row), matching
    * the oracle's semantics exactly.
    */
  def hopDistance(li: DataFrame, hops: Int): DataFrame = {
    val e = copurchaseEdges(li)
    val directed = e.select(col("pa").as("src"), col("pb").as("dst"))
      .unionAll(e.select(col("pb").as("src"), col("pa").as("dst")))
      .coalesce(8).localCheckpoint(true)
    var frontier = e.agg(min(col("pa")).as("node"))
      .select(col("node"), lit(0L).as("dist"))
      .coalesce(1).localCheckpoint(true)
    for (_ <- 1 to hops) {
      val next = frontier
        .unionAll(directed.join(broadcast(frontier), col("src") === col("node"))
          .select(col("dst").as("node"), (col("dist") + 1L).as("dist")))
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .coalesce(1).localCheckpoint(true)
      dropCheckpoint(frontier)
      frontier = next
    }
    dropCheckpoint(directed)
    frontier.select(col("node").as("part"), col("dist"))
      .orderBy("part")
  }

  private def hopOracle(hops: Int): String = {
    val head =
      """WITH e0 AS MATERIALIZED (
           SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey),
         e AS MATERIALIZED (
           SELECT pa AS src, pb AS dst FROM e0
           UNION ALL SELECT pb AS src, pa AS dst FROM e0),
         f0 AS (SELECT MIN(pa) AS node, CAST(0 AS BIGINT) AS dist FROM e0)"""
    val steps = (1 to hops).map { i =>
      s"""f$i AS MATERIALIZED (
           SELECT node, MIN(dist) AS dist FROM (
             SELECT node, dist FROM f${i - 1}
             UNION ALL
             SELECT e.dst AS node, f.dist + 1 AS dist
             FROM e JOIN f${i - 1} f ON e.src = f.node)
           GROUP BY node)"""
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node AS part, CAST(dist AS BIGINT) AS dist FROM f$hops ORDER BY part"
  }

  private val x139 = GQuery(
    "x139_hop_distance", "ext-graph bfs reachability",
    (s, dir) => hopDistance(lineitem(s, dir), hops = 4),
    Some(hopOracle(4)))

  val queries: Seq[GQuery] = Seq(x123, x124, x126, x129, x130, x131, x133, x139, x168)
}
