package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the classic
  * covariance-eigendecomposition pipeline, shaped for cluster scale:
  *
  *  1. ONE distributed pass accumulates (Σ x xᵀ, Σ x, n) with
  *     `treeAggregate` (depth 2): each task folds its rows into a local
  *     O(d²) buffer, partials combine pairwise up a tree, and the driver
  *     receives exactly one d×d buffer per tree leaf — never a row. For
  *     d = 64 a partial is 33 KB; the pattern holds to d ≈ 2000 (32 MB
  *     partials), beyond which randomized sketching (Halko et al. 2011) is
  *     the right tool, not a bigger driver.
  *  2. The d×d covariance eigendecomposes ON THE DRIVER with cyclic Jacobi
  *     rotations — O(d³) on a 64×64 matrix is microseconds; no distributed
  *     eigensolver is warranted below d ~ 10⁴ (same judgment FAISS/sklearn
  *     make: reduce distributed, solve local).
  *  3. Projection ships back as a plan-literal matrix through the existing
  *     native [[graft.functions.MatVecLit]] kernel: proj = V(x−μ) computed
  *     as Vx − Vμ, with Vμ folded driver-side so the per-row cost is one
  *     fused mat-vec, codegen-adjacent, no shuffle, no UDF.
  *
  * Everything is deterministic given a fixed partitioning (float partial
  * sums re-associate across DIFFERENT partitionings — inherent to every
  * distributed reduction; PcaSpec pins bit-identical refits under the same
  * layout, and the registry surface rounds to milli-units).
  */
object Pca {

  /** Fitted model: `components(i)` is the i-th principal axis (unit norm,
    * sign-canonicalized so its largest-magnitude entry is positive),
    * `eigenvalues(i)` the variance it explains; `trace` = total variance
    * (Σ of ALL d eigenvalues, kept for explained-variance ratios).
    */
  final case class Model(
      dim: Int,
      mean: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]],
      trace: Double) {
    def r: Int = components.length
    def explainedRatio(i: Int): Double = eigenvalues(i) / trace
  }

  /** One-pass covariance + driver eigensolve; keeps the top `r` axes. */
  def fit(df: DataFrame, vecCol: String, r: Int): Model = {
    val rows = df.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    val d = rows.first().length
    require(r > 0 && r <= d, s"r=$r out of range for dim $d")

    // (Σ x xᵀ upper triangle packed, Σ x, n)
    val zero = (new Array[Double](d * (d + 1) / 2), new Array[Double](d), 0L)
    val (sxxU, sx, n) = rows.treeAggregate(zero)(
      seqOp = { case ((sxx, sx, n), x) =>
        var k = 0
        var i = 0
        while (i < d) {
          val xi = x(i)
          var j = i
          while (j < d) { sxx(k) += xi * x(j); k += 1; j += 1 }
          sx(i) += xi
          i += 1
        }
        (sxx, sx, n + 1)
      },
      combOp = { case ((a1, b1, n1), (a2, b2, n2)) =>
        var i = 0
        while (i < a1.length) { a1(i) += a2(i); i += 1 }
        i = 0
        while (i < d) { b1(i) += b2(i); i += 1 }
        (a1, b1, n1 + n2)
      },
      depth = 2)
    require(n > 1, s"need >1 vectors, got $n")

    val mu = sx.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      val c = sxxU(k) / n - mu(i) * mu(j)
      cov(i)(j) = c
      cov(j)(i) = c
      k += 1
    }

    val (eig, vecs) = jacobiEigSym(cov)
    val order = eig.indices.sortBy(i => -eig(i))
    val trace = eig.sum
    val comps = order.take(r).map { idx =>
      val v = Array.tabulate(d)(row => vecs(row)(idx)) // column idx of V
      // canonical sign: largest-|entry| positive — removes the ±v ambiguity
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    Model(d, mu, order.take(r).map(eig).toArray, comps, trace)
  }

  /** proj = V(x−μ) as a single plan-literal mat-vec: Vx via the native
    * kernel minus the driver-folded constant Vμ.
    */
  def projectCol(vec: Column, m: Model): Column = {
    val vmu = m.components.map(row =>
      row.iterator.zip(m.mean.iterator).map { case (a, b) => a * b }.sum)
    zip_with(
      VectorOps.matVecLit(vec.cast("array<double>"), m.r, m.components.flatten.toSeq),
      typedlit(vmu.toSeq),
      (a, b) => a - b)
  }

  /** Reconstruction x̂ = μ + Vᵀ(V(x−μ)) error ‖x−x̂‖² averaged over `df` —
    * the fit-quality scalar the spec gates on. Driver-light: the error is
    * computed distributed and only the mean returns.
    */
  def meanReconstructionError(df: DataFrame, vecCol: String, m: Model): Double = {
    // ‖x−x̂‖² = ‖x−μ‖² − ‖V(x−μ)‖²  (V orthonormal), so no d×d literal is
    // needed — two kernel calls per row.
    val centered2 = VectorOps.sqDist(col(vecCol).cast("array<double>"),
      typedlit(m.mean.toSeq))
    val proj = projectCol(col(vecCol), m)
    val projNorm2 = aggregate(zip_with(proj, proj, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    df.select(avg(centered2 - projNorm2).as("err")).head().getDouble(0)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (in-place on a
    * copy). Returns (eigenvalues, V) with eigenvector i in COLUMN i of V.
    * Deterministic: fixed sweep order, fixed tolerance.
    */
  def jacobiEigSym(
      m: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    val scale = {
      var s = 0.0
      for (i <- 0 until d) s += a(i)(i) * a(i)(i)
      math.max(s, 1e-300)
    }

    var sweep = 0
    while (sweep < maxSweeps && offNorm() > tol * scale) {
      for (p <- 0 until d - 1; q <- p + 1 until d if a(p)(q) != 0.0) {
        val apq = a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        // A <- JᵀAJ, touching rows/cols p and q
        var kk = 0
        while (kk < d) {
          val akp = a(kk)(p); val akq = a(kk)(q)
          a(kk)(p) = c * akp - s * akq
          a(kk)(q) = s * akp + c * akq
          kk += 1
        }
        kk = 0
        while (kk < d) {
          val apk = a(p)(kk); val aqk = a(q)(kk)
          a(p)(kk) = c * apk - s * aqk
          a(q)(kk) = s * apk + c * aqk
          kk += 1
        }
        // V <- VJ
        kk = 0
        while (kk < d) {
          val vkp = v(kk)(p); val vkq = v(kk)(q)
          v(kk)(p) = c * vkp - s * vkq
          v(kk)(q) = s * vkp + c * vkq
          kk += 1
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
