package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) — no
  * UDF serialization, stays inside WholeStageCodegen.
  *
  * All arithmetic is widened to double and folded left-to-right in array
  * order, so results are bit-deterministic regardless of partitioning.
  */
object VectorOps {
  /** Σ a_i · b_i in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm in double precision. */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Squared euclidean distance in double precision. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Sign bits of `nPlanes` deterministic pseudo-random hyperplanes — the
    * random-hyperplane LSH bucket key (Charikar 2002). Plane p's component j
    * is derived from xxhash64(p, j), scaled to [-1, 1]; the bucket id packs
    * the sign bits of the projections into a long.
    *
    * Runs as pure column expressions so the bucketing shuffles only the
    * packed long, never the vectors-squared cross product — the 100 TB path
    * for approximate nearest neighbor.
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Int = 0): Column = {
    require(nPlanes > 0 && nPlanes <= 32, s"nPlanes must be in [1,32], got $nPlanes")
    val bits = (0 until nPlanes).map { p =>
      // projection of vec on plane (seed, p): Σ_j vec[j] * u(seed, p, j), u in [-1, 1]
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, j) => {
          val u = xxhash64(lit(seed), lit(p), j).cast("double") / lit(Long.MaxValue.toDouble)
          x.cast("double") * u
        }),
        lit(0.0),
        (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Multi-table LSH bucket array: `nTables` independent hyperplane codes.
    * Candidates = vectors sharing a bucket in ANY table (union improves
    * recall; each table stays a cheap equi-join key).
    */
  def lshBuckets(vec: Column, nPlanes: Int, nTables: Int): Column =
    array((0 until nTables).map(t => hyperplaneBucket(vec, nPlanes, t)): _*)
}
