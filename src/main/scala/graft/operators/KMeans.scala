package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd iterations over an embedding column — the index-build
  * primitive behind IVF-style ANN (x07b consumes per-cell centroids; this
  * operator is how a production ingest refines them from a seed).
  *
  * Scale shape, per iteration:
  *   1. ASSIGN — the k×dim centroid matrix is collected to the driver
  *      (k·dim doubles — tiny by the k-means contract; Spark MLlib's
  *      implementation makes the same move) and inlined as a literal
  *      array-of-structs, so assignment is a NARROW per-row argmin: no
  *      join, no shuffle, vectors never move.
  *   2. UPDATE — new centroid j = element-wise mean of its members via
  *      posexplode + partial-aggregated avg: the only shuffle in the loop
  *      carries (cluster, dim_pos, partial sum/count) — k·dim·partitions
  *      rows, independent of corpus size.
  *
  * Distances are squared-euclidean in double precision, accumulated
  * left-to-right (deterministic given a deterministic input layout for the
  * assign step; the update's avg is partial-aggregated, so centroid values
  * can differ in final ulps across partitionings — the objective gate in
  * KMeansSpec therefore allows an epsilon on EQUALITY, while the
  * non-increase property is exact at every realistic step size).
  */
object KMeans {

  /** Narrow assignment pass: (id, vec, cluster, dist) from the argmin
    * against centroid literals — no join, no shuffle; THE way to attach a
    * cluster column to a vector table (joining back a precomputed (id,
    * cluster) table would exchange the full vector corpus by id).
    *
    * The argmin runs in ONE [[graft.functions.VectorExpressions.CellArgminLit]]
    * kernel node (flat k×dim literal, strict-< lowest-index tie-break) —
    * bit-identical to the original k-node `array_min(array(struct(sq_dist,
    * j)...))` composition (KMeansSpec pins it), but with plan size and
    * analysis cost CONSTANT in k. At a production coarse quantizer
    * (k ~ 10⁵) the composed form built a k-wide expression tree per
    * assignment — the build-side twin of the probe-side literal joint
    * `CentroidIndex` closed.
    *
    * @param vecs      (id, vec) — vec is array<float> or array<double>
    * @param centroids ordered seq of centroid vectors (cluster id = index)
    */
  def assign(vecs: DataFrame, centroids: Seq[Array[Double]]): DataFrame = {
    val idCol = vecs.columns(0)
    val vecCol = vecs.columns(1)
    val k = centroids.length
    require(k >= 1, "need at least one centroid")
    val dim = centroids.head.length
    val flat = new Array[Double](k * dim)
    centroids.zipWithIndex.foreach { case (c, j) =>
      require(c.length == dim, s"centroid $j dim ${c.length} != $dim")
      System.arraycopy(c, 0, flat, j * dim, dim)
    }
    vecs
      .withColumn("best",
        graft.functions.VectorOps.cellArgmin(col(vecCol), k, flat.toSeq))
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("best.cluster").as("cluster"), col("best.dist").as("dist"))
  }

  /** One Lloyd step over [[assign]]'s output: returns (assignments as
    * (id, cluster), newCentroids, objective = Σ min-distances).
    */
  def step(vecs: DataFrame, centroids: Seq[Array[Double]])
      : (DataFrame, Seq[Array[Double]], Double) = {
    val assigned = assign(vecs, centroids)
    val objective = assigned.agg(sum(col("dist"))).head().getDouble(0)
    val updated = assigned
      .select(col("cluster"), posexplode(col("vec").cast("array<double>")))
      .groupBy(col("cluster"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cluster"), expr("transform(pm, x -> x.m)").as("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .toMap
    // a cluster that lost all members keeps its previous centroid (the
    // standard empty-cluster policy short of reseeding)
    val next = centroids.indices.map(j => updated.getOrElse(j, centroids(j)))
    (assigned.select(col("id"), col("cluster")), next, objective)
  }

  /** `iters` Lloyd steps from `seed`; returns the final assignment, final
    * centroids, and the per-step objective trace (length `iters`).
    */
  def refine(vecs: DataFrame, seed: Seq[Array[Double]], iters: Int)
      : (DataFrame, Seq[Array[Double]], Seq[Double]) = {
    require(iters >= 1, s"iters must be >= 1 (got $iters); " +
      "for a seed-only assignment call assign(vecs, seed) directly")
    var cs = seed
    var out: DataFrame = null
    val trace = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      val (a, next, obj) = step(vecs, cs)
      out = a
      cs = next
      trace += obj
    }
    (out, cs, trace.result())
  }

  /** Seed centroids from an existing coarse grouping (e.g. x07b's per-label
    * means): element-wise mean per group, ordered by group key.
    */
  def seedFromGroups(vecs: DataFrame, groupCol: String, vecCol: String): Seq[Array[Double]] =
    vecs.select(col(groupCol), posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col(groupCol), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col(groupCol), expr("transform(pm, x -> x.m)").as("centroid"))
      .orderBy(groupCol)
      .collect()
      .map(_.getSeq[Double](1).toArray)
      .toSeq
}
