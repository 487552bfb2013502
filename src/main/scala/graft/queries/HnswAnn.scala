package graft.queries

import graft.{GQuery, StoredArtifacts, Tables}
import graft.operators.CentroidIndex.Hnsw
import graft.plans.GroupedTopKOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded full-vector HNSW — the GRAPH ANN serving tier (Malkov &
  * Yashunin 2016), next to the IVF/PQ/SQ8 quantization tiers: the layout
  * Lucene/Elasticsearch ship as segment-HNSW, and the production default
  * wherever recall at low latency beats compression.
  *
  * Layout: vectors are hashed into `shards` segments; each segment builds
  * ONE deterministic in-memory HNSW over its own vectors (the build
  * reuses [[graft.operators.CentroidIndex.Hnsw]] — id-hashed levels, id
  * tie-breaks — so two builds of the same corpus are structurally
  * identical) and serializes as parquet rows `(shard, local_id, vec_id,
  * embedding, neighbors, entry, top_level)` partitioned by shard. The
  * shard is the unit that must fit one task's memory — exactly Lucene's
  * segment contract — so corpus growth adds shards, never node size.
  *
  * Probe: queries are replicated to every shard (a |Q|·S-row shuffle of
  * id+vector only) and cogrouped with the graph rows by shard; each task
  * restores its segment's graph once and runs every query of the group
  * through it, emitting per-shard top-k; a bounded-heap grouped top-k
  * ([[graft.plans.GroupedTopK]]) merges shards per query. NOTHING is
  * collected to the driver — unlike the LUT-based PQ batch probes (which
  * are driver-batch by the FAISS-coordinator argument and `require`
  * ceilinged), this path distributes the query side, so the SAME code
  * serves an 8-query batch and a 50k-query self-join: the x127 kNN-graph
  * build below probes the index with the whole corpus.
  *
  * Returned scores are EXACT cosines (the graph bounds which candidates
  * get scored, not how) — HnswAnnSpec pins bit-identity of every returned
  * score against a driver brute-force recomputation, plus recall ≥ 0.9 vs
  * exact top-k, restore≡built search identity, and determinism.
  */
object HnswAnn {

  /** One stored graph node; neighbors(l) = layer-l adjacency. */
  final case class HnswNode(shard: Int, local_id: Int, vec_id: Long,
      embedding: Array[Double], neighbors: Array[Array[Int]],
      entry: Int, top_level: Int)

  /** One segment-and-shard-routed query (`seg` = segment directory name;
    * the base build is segment `"graph"`).
    */
  final case class SegQuery(seg: String, shard: Int, q_id: Long,
      qvec: Array[Double])

  /** A stored node tagged with its segment — the probe-side row shape. */
  final case class SegNode(seg: String, shard: Int, local_id: Int,
      vec_id: Long, embedding: Array[Double], neighbors: Array[Array[Int]],
      entry: Int, top_level: Int)

  /** [[SegNode]] plus the per-node filter verdict for the filtered probe. */
  final case class SegNodeF(seg: String, shard: Int, local_id: Int,
      vec_id: Long, embedding: Array[Double], neighbors: Array[Array[Int]],
      entry: Int, top_level: Int, ok: Boolean)

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** Build the sharded index: hash-shard, per-shard deterministic HNSW,
    * one parquet write partitioned by shard. The per-shard build sorts by
    * vec_id so local ids — and therefore the graph — are independent of
    * upstream partitioning.
    */
  def writeHnswIndex(e: DataFrame, outDir: String, shards: Int): Unit =
    writeSegment(e, s"$outDir/graph", shards)

  /** Append a DELTA segment — the incremental ingest path (the x65/LSM
    * move, graph-tier edition): a new batch builds its OWN per-shard
    * graphs under `seg_<name>` and the base segment is never reopened —
    * per-batch cost is O(batch·log batch), not O(corpus). [[probeHnsw]]
    * discovers and unions every committed segment, so new vectors serve
    * immediately; overwrite mode keeps re-delivery of a batch
    * idempotent. Periodic compaction = rebuild base from the union and
    * drop the deltas (exactly the IVF tier's
    * [[Similarity.compactIvfIndex]] role).
    */
  def appendHnswSegment(batch: DataFrame, indexDir: String, segment: String,
      shards: Int): Unit =
    writeSegment(batch, s"$indexDir/seg_$segment", shards)

  private def writeSegment(e: DataFrame, dir: String, shards: Int): Unit = {
    val s = e.sparkSession
    import s.implicits._
    e.select(pmod(col("vec_id"), lit(shards.toLong)).cast("int").as("shard"),
        col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .as[(Int, Long, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        val sorted = rows.toArray.sortBy(_._2)
        val g = Hnsw.build(sorted.map(_._3))
        val nbrs = g.exportNeighbors
        sorted.iterator.zipWithIndex.map { case ((_, vid, vec), i) =>
          HnswNode(shard, i, vid, vec, nbrs(i), g.entryPoint, g.topLevel)
        }
      }
      .toDF()
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
  }

  /** Compact all committed segments into a fresh base build — the
    * maintenance step that bounds delta accumulation (each delta adds one
    * graph per shard to every probe; compaction returns the index to
    * ONE graph per shard, rebuilt over the union). Write-then-swap
    * ordering: the next base is fully built under a temp name before the
    * old base and the deltas are removed, so no crash point loses data —
    * the same recovery contract as [[Similarity.compactIvfIndex]], with
    * the same single-writer caveat (a manifest pointer is the concurrent-
    * reader answer, as in [[AnnManifest]]).
    */
  def compactHnswIndex(s: SparkSession, indexDir: String, shards: Int): Unit = {
    val segs = segmentsOf(indexDir)
    require(segs.nonEmpty, s"nothing to compact under $indexDir")
    val union = segs.map(seg =>
        s.read.parquet(s"$indexDir/$seg").select(col("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
      .localCheckpoint(true) // sever lineage from the dirs about to go
    writeSegment(union, s"$indexDir/graph_next", shards)
    StoredArtifacts.deleteTree(s"$indexDir/graph")
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$indexDir/graph_next"),
      java.nio.file.Paths.get(s"$indexDir/graph"))
    segs.filter(_.startsWith("seg_"))
      .foreach(seg => StoredArtifacts.deleteTree(s"$indexDir/$seg"))
  }

  /** Segment directory names under `indexDir`, sorted for determinism:
    * the base `graph` plus any committed `seg_*` delta (a half-written
    * segment without the committer `_SUCCESS` marker stays invisible —
    * the StoredArtifacts.ready discipline).
    */
  private def segmentsOf(indexDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(indexDir))
      .iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => (n == "graph" || n.startsWith("seg_")) &&
        StoredArtifacts.ready(s"$indexDir/$n"))
      .toSeq.sorted
  }

  /** Distributed probe: top-`k` (q_id, vec_id, sim) per query in
    * `queries` (columns `q_id`, `qvec: array<double>`), searched with
    * candidate-list width `ef` per shard. See the object scaladoc for the
    * cogroup shape; the final merge is the bounded-heap grouped top-k
    * (≤ k rows per query per partition cross the merge exchange).
    */
  def probeHnsw(s: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, ef: Int): DataFrame = {
    import s.implicits._
    val segs = segmentsOf(indexDir)
    require(segs.nonEmpty, s"no committed segments under $indexDir")
    // base + delta segments union into one node stream; the cogroup key
    // is (segment, shard) so every per-segment graph is restored whole
    val graph = segs.map { seg =>
      s.read.parquet(s"$indexDir/$seg")
        .select(lit(seg).as("seg"), col("shard"), col("local_id"),
          col("vec_id"), col("embedding"), col("neighbors"), col("entry"),
          col("top_level"))
    }.reduce(_ unionAll _)
      .as[SegNode]
    // shard lists from the partition column only: payload-free scans
    val shardIds = segs.map { seg =>
      s.read.parquet(s"$indexDir/$seg")
        .select(lit(seg).as("seg"), col("shard")).distinct()
    }.reduce(_ unionAll _)
    val routed = queries.crossJoin(shardIds)
      .select(col("seg"), col("shard"), col("q_id"), col("qvec"))
      .as[SegQuery]
    val perShard = graph.groupByKey(n => (n.seg, n.shard))
      .cogroup(routed.groupByKey(q => (q.seg, q.shard))) { (_, nodeRows, qs) =>
        val ns = nodeRows.toArray
        if (ns.isEmpty) Iterator.empty
        else {
          java.util.Arrays.sort(ns, Ordering.by((n: SegNode) => n.local_id))
          val g = Hnsw.restore(ns.map(_.embedding), ns.map(_.neighbors),
            ns.head.entry, ns.head.top_level)
          qs.flatMap { q =>
            var qn = 0.0
            var i = 0
            while (i < q.qvec.length) { qn += q.qvec(i) * q.qvec(i); i += 1 }
            g.searchTop(q.qvec, math.sqrt(qn), k, ef)
              .iterator.map { case (lid, sim) => (q.q_id, ns(lid).vec_id, sim) }
          }
        }
      }
      .toDF("q_id", "vec_id", "sim")
    GroupedTopKOps.ensureInstalled(s)
    GroupedTopKOps.groupedTopK(perShard, Seq(col("q_id")),
      Seq(col("sim").desc, col("vec_id")), k)
      .orderBy(col("q_id"), col("sim").desc, col("vec_id"))
  }

  /** FILTERED distributed probe — the graph-tier row of the filtered-
    * serving matrix (x91 is the IVF row): top-`k` among an ALLOWED id
    * set only. The filter is applied the FAISS-IDSelector way — the
    * traversal routes through every node (graph connectivity must not
    * depend on the predicate) and only allowed nodes are collected —
    * with the candidate width auto-widened to max(ef, 4k) so a
    * moderately selective filter still fills k (the Lucene pre-filtered
    * ef-expansion contract; a pathologically selective filter degrades
    * recall, which FilteredAnnSpec's recall gate makes measurable
    * rather than silent).
    *
    * The allowed set arrives as a DataFrame of ids and joins the node
    * stream co-partitioned — never collected to the driver, so a
    * corpus-sized filter (the common case: "everything not yet
    * deduplicated") is legal. At serving scale a standing attribute
    * predicate is instead precomputed into the stored rows at ingest;
    * this API is the ad-hoc-set form.
    */
  def probeHnswFiltered(s: SparkSession, indexDir: String, queries: DataFrame,
      allowed: DataFrame, k: Int, ef: Int): DataFrame = {
    import s.implicits._
    val segs = segmentsOf(indexDir)
    require(segs.nonEmpty, s"no committed segments under $indexDir")
    val allow = allowed.select(
      col(allowed.columns(0)).cast("long").as("vec_id"),
      lit(true).as("ok0"))
    val graph = segs.map { seg =>
      s.read.parquet(s"$indexDir/$seg")
        .select(lit(seg).as("seg"), col("shard"), col("local_id"),
          col("vec_id"), col("embedding"), col("neighbors"), col("entry"),
          col("top_level"))
    }.reduce(_ unionAll _)
      .join(allow, Seq("vec_id"), "left")
      .select(col("seg"), col("shard"), col("local_id"), col("vec_id"),
        col("embedding"), col("neighbors"), col("entry"), col("top_level"),
        coalesce(col("ok0"), lit(false)).as("ok"))
      .as[SegNodeF]
    val shardIds = segs.map { seg =>
      s.read.parquet(s"$indexDir/$seg")
        .select(lit(seg).as("seg"), col("shard")).distinct()
    }.reduce(_ unionAll _)
    val routed = queries.crossJoin(shardIds)
      .select(col("seg"), col("shard"), col("q_id"), col("qvec"))
      .as[SegQuery]
    val width = math.max(ef, 4 * k)
    val perShard = graph.groupByKey(n => (n.seg, n.shard))
      .cogroup(routed.groupByKey(q => (q.seg, q.shard))) { (_, nodeRows, qs) =>
        val ns = nodeRows.toArray
        if (ns.isEmpty) Iterator.empty
        else {
          java.util.Arrays.sort(ns, Ordering.by((n: SegNodeF) => n.local_id))
          val g = Hnsw.restore(ns.map(_.embedding), ns.map(_.neighbors),
            ns.head.entry, ns.head.top_level)
          qs.flatMap { q =>
            var qn = 0.0
            var i = 0
            while (i < q.qvec.length) { qn += q.qvec(i) * q.qvec(i); i += 1 }
            g.searchTop(q.qvec, math.sqrt(qn), width, width)
              .iterator.filter { case (lid, _) => ns(lid).ok }
              .take(k)
              .map { case (lid, sim) => (q.q_id, ns(lid).vec_id, sim) }
          }
        }
      }
      .toDF("q_id", "vec_id", "sim")
    GroupedTopKOps.ensureInstalled(s)
    GroupedTopKOps.groupedTopK(perShard, Seq(col("q_id")),
      Seq(col("sim").desc, col("vec_id")), k)
      .orderBy(col("q_id"), col("sim").desc, col("vec_id"))
  }

  /** SQL serving surface for the graph tier — the [[Similarity.sqlRegisterBatch]]
    * discipline: probe the stored graph index for every row of an existing
    * temp view/table of `(q_id, qvec)` and register the result as
    * `<prefix>_hits` (q_id, vec_id, sim). Unlike the LUT-batch IVF
    * registration, the query table is NOT collected at registration —
    * the cogroup probe is fully lazy and distributed, so a registered
    * view over an arbitrarily large query table is legal.
    */
  def sqlRegister(s: SparkSession, indexDir: String, prefix: String,
      queriesTable: String, k: Int, ef: Int): Unit =
    probeHnsw(s, indexDir, s.table(queriesTable), k, ef)
      .createOrReplaceTempView(s"${prefix}_hits")

  private def storeFor(s: SparkSession, dir: String): String = {
    val store = StoredArtifacts.dir(dir, "hnsw_index_v1")
    if (!StoredArtifacts.ready(s"$store/graph"))
      writeHnswIndex(emb(s, dir), store, shards = 4)
    store
  }

  // Batch serving through the stored graph tier: top-10 for an 8-query
  // batch. Build on first touch, then probe-only — the x62 discipline.
  private val x128 = GQuery(
    "x128_ann_hnsw_stored", "ext-similarity-ann graph-index hnsw serving",
    (s, dir) => {
      val store = storeFor(s, dir)
      val queries = emb(s, dir).where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qvec"))
      probeHnsw(s, store, queries, k = 10, ef = 64)
        .where(col("q_id") =!= col("vec_id"))
    },
    None) // approximate candidate set: rows-only check + HnswAnnSpec gates

  // kNN-graph build: every corpus vector self-probed through the SAME
  // stored graph index — the all-nodes neighbor-list artifact that feeds
  // graph clustering, SemDeDup-style pruning and diversity sampling. The
  // distributed probe is what makes this expressible at all: |Q| = |corpus|
  // would break any driver-batch ceiling. k+1 then self-filter, rank by
  // (-sim, nbr_id) per source.
  private val x127 = GQuery(
    "x127_knn_graph", "ext-similarity-ann knn-graph self-join",
    (s, dir) => {
      val store = storeFor(s, dir)
      val queries = emb(s, dir)
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qvec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
      probeHnsw(s, store, queries, k = 6, ef = 64)
        .where(col("q_id") =!= col("vec_id"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 5)
        .select(col("q_id").as("src_id"), col("vec_id").as("nbr_id"),
          col("rank"), col("sim"))
        .orderBy("src_id", "rank")
    },
    None) // approximate (graph-bounded candidates): HnswAnnSpec recall gate

  // Incremental ingest through the graph tier: the corpus arrives as TWO
  // batches — a base build over the even ids and an appended delta segment
  // over the odd ids — and the probe serves the union. Build/append on
  // first touch, then probe-only; the delta never reopens the base.
  private val x132 = GQuery(
    "x132_ann_hnsw_append", "ext-similarity-ann graph-index incremental-append",
    (s, dir) => {
      val store = StoredArtifacts.dir(dir, "hnsw_inc_v1")
      val e = emb(s, dir)
      if (!StoredArtifacts.ready(s"$store/graph"))
        writeHnswIndex(e.where(pmod(col("vec_id"), lit(2L)) === 0), store,
          shards = 2)
      if (!StoredArtifacts.ready(s"$store/seg_odd"))
        appendHnswSegment(e.where(pmod(col("vec_id"), lit(2L)) === 1), store,
          "odd", shards = 2)
      val queries = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qvec"))
      probeHnsw(s, store, queries, k = 10, ef = 64)
        .where(col("q_id") =!= col("vec_id"))
    },
    None) // approximate candidate set: rows-only check + HnswAnnSpec gates

  // Filtered serving through the graph tier — the x91 predicate shape
  // (even labels, query excluded) through the stored HNSW: build on
  // first touch, probe with the allowed set joined co-partitioned.
  // FilteredAnnSpec gates purity, recall vs the exact filtered scan,
  // and determinism; rows-only here (approximate candidate set).
  private val x216 = GQuery(
    "x216_ann_hnsw_filtered",
    "ext-similarity-ann graph-index filtered-serving",
    (s, dir) => {
      val store = storeFor(s, dir)
      val e = emb(s, dir)
      val queries = e.where(col("vec_id") === 0)
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qvec"))
      val allowed = e.where(pmod(col("label"), lit(2)) === 0 &&
        col("vec_id") =!= 0).select(col("vec_id"))
      probeHnswFiltered(s, store, queries, allowed, k = 10, ef = 64)
    },
    None) // approximate + filtered: gated by FilteredAnnSpec

  // ------------------------------------------------------------------- x277
  // Exact filtered-scan twin of x216 (the r9 VERDICT oracle-conversion
  // item): the SAME predicate shape — query vec 0, allowed = even label,
  // query excluded — served by the exact brute-force scan in
  // milli-quantized integer squared-L2 with the (d2, vec_id) tie-break
  // (the x170/x271 discipline), so the top-10 hash-verifies cross-engine.
  // This is the ground truth FilteredAnnSpec measures x216's recall
  // against, promoted to its own oracled registry row: the graph tier
  // answers fast, this row answers EXACTLY, and the pair documents the
  // trade. Query-vector guard as x271: an absent vec 0 yields an empty
  // result in both engines.
  //
  // Scale shape: 1-row query aggregate broadcast over one narrow corpus
  // scan (filter pushed to the scan), TakeOrdered top-10 — no shuffle of
  // anything corpus-sized; the production form swaps the scan for x216's
  // stored-graph probe, which is the point of owning both rows.
  private val x277 = GQuery(
    "x277_ann_filtered_exact",
    "ext-similarity-ann filtered-serving exact-twin",
    (s, dir) => {
      val base = emb(s, dir).select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> round(cast(x as double) * 1000))")
          .as("mi"))
      val qv = base.where(col("vec_id") === 0L)
        .agg(first(col("mi"), ignoreNulls = true).as("qv"))
        .where(col("qv").isNotNull)
      base.where(pmod(col("label"), lit(2)) === 0 && col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"),
          graft.functions.VectorOps.sqDist(col("mi"), col("qv"))
            .cast("long").as("d2"))
        .orderBy(col("d2"), col("vec_id")).limit(10)
    },
    Some("""WITH e AS (
              SELECT vec_id, label, list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS DOUBLE)) AS mi
              FROM embeddings),
            qv AS (SELECT mi AS qv FROM e WHERE vec_id = 0)
            SELECT vec_id,
              CAST(list_dot_product(mi, mi) + list_dot_product(qv, qv)
                - 2 * list_dot_product(mi, qv) AS BIGINT) AS d2
            FROM e, qv
            WHERE label % 2 = 0 AND vec_id <> 0
            ORDER BY d2, vec_id LIMIT 10"""))

  val queries: Seq[GQuery] = Seq(x127, x128, x132, x216, x277)
}
