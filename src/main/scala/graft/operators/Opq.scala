package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization (Ge et al., CVPR 2013; also Norouzi &
  * Fleet's ck-means) — the quality step between plain PQ and usable
  * recall on real embedding distributions: learn an orthogonal rotation
  * `R` so that PQ's independent-subspace assumption holds in the rotated
  * space, by alternating
  *
  *   1. fix R, train the per-subspace codebooks on `R·x` (the existing
  *      distributed [[ProductQuantizer.train]] — nothing new runs);
  *   2. fix the codes, solve the orthogonal-Procrustes problem
  *      `min_R Σ ‖R·x − ŷ‖²` where `ŷ` is the PQ reconstruction of the
  *      rotated vector: `R = V·Uᵀ` from the SVD `U·Σ·Vᵀ` of the
  *      correlation matrix `M = Σ x·ŷᵀ` (dim×dim, driver-solved via
  *      breeze — a model-sized dense solve, never distributed).
  *
  * Scale shape, per iteration: the codebook training is [[ProductQuantizer]]'s
  * existing per-subspace Lloyd loop (narrow slices, k·dsub-row exchanges),
  * and the Procrustes statistics ride ONE job — a `treeAggregate` whose
  * per-partition accumulator is the (m·k·dim + m·k + 1)-double sufficient
  * statistic `(S, n, Σ‖x‖²)`, where `S_{s,c} = Σ x` over rows whose
  * subspace-s code is c. `M` then assembles on the driver as
  * `M[:, s·dsub+j] = Σ_c S_{s,c} · cent_{s,c}[j]` — the full n·dim² outer-
  * product sum is never materialized anywhere (the same model-sized-
  * exchange discipline as [[QualityClassifier]]'s gradient job; the RDD
  * aggregate is the mapPartitions-last-resort case, used because a
  * primitive-array accumulator has no Catalyst aggregate form short of
  * exploding n·m·dim rows). The quantization MSE falls out of the same
  * statistic (`Σ‖x‖² − 2·tr(R·M) + Σ_c n_c‖cent_c‖²`), so the objective
  * trace costs no extra pass.
  *
  * Initialization is R = I: iteration 0's codebooks ARE plain PQ, and
  * every subsequent step minimizes the shared objective in one block —
  * the trace is monotone non-increasing by construction, which is what
  * makes OpqSpec's strict-win-over-raw-PQ gate an honest property of the
  * algorithm rather than a tuned threshold.
  *
  * Serving changes NOTHING downstream: rotate the query driver-side
  * ([[rotate]]) and every existing ADC kernel, probe, and batch path runs
  * unmodified over the rotated index (cosine is rotation-invariant, so
  * scores remain comparable to exact cosine on the originals).
  */
object Opq {

  /** Learned rotation: `flat` is the row-major dim×dim orthogonal R. */
  final case class Model(dim: Int, flat: Array[Double]) {
    /** Driver-side rotate — the per-query move at serve time. */
    def rotate(x: Array[Double]): Array[Double] = {
      require(x.length == dim, s"vector dim ${x.length} != model dim $dim")
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0
        var j = 0
        val base = i * dim
        while (j < dim) { s += flat(base + j) * x(j); j += 1 }
        out(i) = s
        i += 1
      }
      out
    }

    /** Column-side rotate — the per-row move at build time. */
    def rotateCol(vec: Column): Column = VectorOps.matVecLit(vec, dim, flat.toSeq)
  }

  private def identity(dim: Int): Array[Double] = {
    val r = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) { r(i * dim + i) = 1.0; i += 1 }
    r
  }

  /** One-job sufficient statistic for the Procrustes step and the MSE:
    * (S = per-(sub, code) x-sums over ORIGINAL vectors, n = per-(sub,
    * code) counts, Σ‖x‖²). Rows whose vector is malformed (null codes)
    * are skipped — the kernels surface them as null rather than crash.
    */
  private def stats(rotated: DataFrame, cb: ProductQuantizer.Codebooks,
      dim: Int): (Array[Double], Array[Long], Double) = {
    val m = cb.m; val k = cb.k
    val rows = rotated.select(col("x"), col("codes"))
    val zero = (new Array[Double](m * k * dim), new Array[Long](m * k), 0.0)
    rows.rdd.treeAggregate(zero)(
      seqOp = { case ((s, n, x2), row) =>
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val x = row.getSeq[Double](0)
          val codes = row.getSeq[Int](1)
          var xs = 0.0
          var d = 0
          while (d < dim) { xs += x(d) * x(d); d += 1 }
          var sub = 0
          while (sub < m) {
            val c = codes(sub)
            val base = (sub * k + c) * dim
            d = 0
            while (d < dim) { s(base + d) += x(d); d += 1 }
            n(sub * k + c) += 1
            sub += 1
          }
          (s, n, x2 + xs)
        } else (s, n, x2)
      },
      combOp = { case ((s1, n1, x1), (s2, n2, x2)) =>
        var i = 0
        while (i < s1.length) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < n1.length) { n1(i) += n2(i); i += 1 }
        (s1, n1, x1 + x2)
      })
  }

  /** `M = Σ x·ŷᵀ` assembled from the sufficient statistic: column block
    * s·dsub..s·dsub+dsub of M gets `Σ_c S_{s,c} ⊗ cent_{s,c}`.
    */
  private def assembleM(s: Array[Double], cb: ProductQuantizer.Codebooks,
      dim: Int): breeze.linalg.DenseMatrix[Double] = {
    val mat = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    for (sub <- 0 until cb.m; c <- 0 until cb.k) {
      val cent = cb.centroid(sub, c)
      val base = (sub * cb.k + c) * dim
      var d = 0
      while (d < dim) {
        val sd = s(base + d)
        if (sd != 0.0) {
          var j = 0
          while (j < cb.dsub) {
            mat(d, sub * cb.dsub + j) += sd * cent(j)
            j += 1
          }
        }
        d += 1
      }
    }
    mat
  }

  /** Quantization MSE from the same statistic:
    * `(Σ‖R·x‖² − 2·tr(R·M) + Σ n_c·‖cent_c‖²) / N` with ‖R·x‖ = ‖x‖.
    */
  private def mseOf(rot: Array[Double], mMat: breeze.linalg.DenseMatrix[Double],
      n: Array[Long], x2: Double, cb: ProductQuantizer.Codebooks,
      dim: Int): Double = {
    var trRM = 0.0
    for (i <- 0 until dim; j <- 0 until dim)
      trRM += rot(i * dim + j) * mMat(j, i)
    var recon = 0.0
    for (sub <- 0 until cb.m; c <- 0 until cb.k) {
      val cent = cb.centroid(sub, c)
      var n2 = 0.0
      var j = 0
      while (j < cb.dsub) { n2 += cent(j) * cent(j); j += 1 }
      recon += n(sub * cb.k + c) * n2
    }
    val total = n.slice(0, cb.k).sum.toDouble.max(1.0) // counts per sub are equal
    (x2 - 2.0 * trRM + recon) / total
  }

  /** Per-iteration training diagnostics — the convergence record an
    * operator reads to size `opqIters` (the ANALYZE-style introspection
    * the serving layer's other trainers expose): the quantization MSE
    * under the iteration's rotation and the Frobenius norm of the
    * rotation update that PRODUCED this iteration's frame (0 for
    * iteration 0 — R starts at I). Written beside the index as the
    * `opq_trace` artifact by [[graft.queries.Similarity.writeIvfOpqIndex]].
    */
  final case class IterStat(iter: Int, mse: Double, rotDelta: Double)

  /** Alternate codebook training and Procrustes rotation updates.
    *
    * @return (model, final codebooks trained in the final rotation,
    *         per-iteration diagnostics — entry 0's MSE is plain PQ's
    *         since R starts at I)
    */
  def train(vecs: DataFrame, m: Int, k: Int, pqIters: Int, opqIters: Int)
      : (Model, ProductQuantizer.Codebooks, Seq[IterStat]) = {
    require(opqIters >= 1, s"opqIters must be >= 1, got $opqIters")
    val idCol = vecs.columns(0)
    val vecCol = vecs.columns(1)
    val dim = vecs.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be a multiple of m=$m")
    var rot = identity(dim)
    var cb: ProductQuantizer.Codebooks = null
    val trace = Seq.newBuilder[IterStat]
    var lastDelta = 0.0
    for (it <- 0 until opqIters) {
      val model = Model(dim, rot)
      val rotatedIn = vecs.select(col(idCol),
        model.rotateCol(col(vecCol)).as("x"))
      cb = ProductQuantizer.train(rotatedIn, m, k, pqIters)
      // ONE job: encode rides the same pass as the statistics. x is the
      // ORIGINAL vector — Procrustes couples the fixed reconstructions ŷ
      // (rotated space) to the originals through M = Σ x·ŷᵀ, and the new
      // R maps originals onto those reconstructions
      val encoded = vecs.select(
        col(vecCol).cast("array<double>").as("x"),
        VectorOps.pqEncode(model.rotateCol(col(vecCol)), cb.m, cb.dsub,
          cb.flat.toSeq, packed = false).as("codes"))
      val (sStat, nStat, x2) = stats(encoded, cb, dim)
      val mMat = assembleM(sStat, cb, dim)
      trace += IterStat(it, mseOf(rot, mMat, nStat, x2, cb, dim), lastDelta)
      if (it < opqIters - 1) {
        // R = V·Uᵀ from M = U·Σ·Vᵀ maximizes tr(R·M) over orthogonal R
        val dec = breeze.linalg.svd(mMat)
        val rNew: breeze.linalg.DenseMatrix[Double] = dec.Vt.t * dec.U.t
        val next = new Array[Double](dim * dim)
        var df = 0.0
        for (i <- 0 until dim; j <- 0 until dim) {
          next(i * dim + j) = rNew(i, j)
          val diff = rNew(i, j) - rot(i * dim + j)
          df += diff * diff
        }
        lastDelta = math.sqrt(df)
        rot = next
      }
    }
    (Model(dim, rot), cb, trace.result())
  }

  /** Persist the training diagnostics as a queryable 3-column table. */
  def writeTrace(spark: SparkSession, trace: Seq[IterStat], path: String): Unit = {
    import spark.implicits._
    trace.map(t => (t.iter, t.mse, t.rotDelta))
      .toDF("iter", "mse", "rot_delta")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Persist / load the one-row rotation table. */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    Seq((model.dim, model.flat.toSeq)).toDF("dim", "flat")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readModel(spark: SparkSession, path: String): Model = {
    val r = spark.read.parquet(path).head()
    Model(r.getAs[Int]("dim"),
      r.getSeq[Double](r.fieldIndex("flat")).toArray)
  }

  /** Quantization MSE of (rotation, codebooks) on a vector table — the
    * OpqSpec gate's eval, computed from the same one-job statistic as
    * training (no decode kernel, no second pass).
    */
  def mse(vecs: DataFrame, model: Model, cb: ProductQuantizer.Codebooks): Double = {
    val vecCol = vecs.columns(1)
    val encoded = vecs.select(
      col(vecCol).cast("array<double>").as("x"),
      VectorOps.pqEncode(model.rotateCol(col(vecCol)), cb.m, cb.dsub,
        cb.flat.toSeq, packed = false).as("codes"))
    val (sStat, nStat, x2) = stats(encoded, cb, model.dim)
    val mMat = assembleM(sStat, cb, model.dim)
    mseOf(model.flat, mMat, nStat, x2, cb, model.dim)
  }
}
