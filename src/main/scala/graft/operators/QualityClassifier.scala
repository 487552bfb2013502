package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the fastText-style linear classifier
  * every modern pretraining pipeline runs between heuristic filters and
  * training (CCNet's LM filter, DCLM/FineWeb-Edu's quality classifiers):
  * hashed bag-of-tokens features, logistic regression, a per-document
  * quality score.
  *
  * Distributed training shape (full-batch gradient descent):
  *   - FEATURIZE once: tokens hash into `dim` buckets
  *     (xxhash64 mod dim — the feature-hashing trick, Weinberger 2009),
  *     per-doc counts tf-normalize, and each document becomes a SPARSE
  *     (indices, values) pair — corpus text is read exactly once and
  *     never again during training.
  *   - Per iteration: the weight vector (dim doubles — model-sized, the
  *     k-means-centroid discipline) is inlined as a literal into the
  *     native [[graft.functions.SparseDotLit]] kernel, so the forward
  *     pass is a narrow per-row loop; the gradient Σ (p − y)·x comes
  *     back through one explode + groupBy(bucket) aggregation whose
  *     post-partial-agg exchange is ≤ dim rows, and the dim-double
  *     gradient is collected to the driver for the update. Two jobs per
  *     iteration over the cached feature table, independent of corpus
  *     width — the same scan-bound loop at 500 docs or 100 TB.
  *
  * Floating-point note: partial aggregation makes the gradient sums
  * order-dependent in final ulps, so training is deterministic in
  * STRUCTURE but not bit-reproducible across partitionings — the same
  * contract as [[KMeans.refine]]; gates pin separation quality, not bits.
  */
object QualityClassifier {

  /** Trained model: dense weights over the hashed feature space + bias,
    * with the per-iteration training losses for convergence gates.
    */
  final case class Model(weights: Array[Double], bias: Double, dim: Int,
      losses: Seq[Double])

  /** Hash a (id, text, label) table into sparse features:
    * (id, label, indices array<int>, values array<double>). Indices are
    * sorted per row (deterministic layout). Two value scales:
    *   - `binary = true` (default): presence indicators (1.0 per distinct
    *     bucket) — each active feature contributes at unit scale, so
    *     full-batch GD converges in tens of iterations regardless of
    *     document length (tf values on long documents are O(1/ntok) and
    *     would need hundreds);
    *   - `binary = false`: tf (count / doc token total) for
    *     length-invariant weighting when the caller runs an
    *     appropriately scaled optimizer.
    * Bucket collisions are the feature-hashing trade: a marker token
    * sharing a bucket with a ubiquitous token is masked, which callers
    * control through `dim` (collision odds for any given token ≈
    * occupied/dim).
    */
  def featurize(d: DataFrame, dim: Int, binary: Boolean = true): DataFrame = {
    require(dim >= 2, s"feature dim must be >= 2: $dim")
    val id = d.columns(0)
    val counts = d
      .select(col(id), col("label"),
        explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col(id), col("label"),
        pmod(xxhash64(col("tok")), lit(dim.toLong)).cast("int").as("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))
      .withColumn("ntok", sum(col("cnt")).over(Window.partitionBy(col(id))))
    val v = if (binary) lit(1.0) else col("cnt") / col("ntok")
    counts
      .groupBy(col(id), col("label"))
      .agg(array_sort(collect_list(struct(col("bucket"), v.as("v")))).as("bv"))
      .select(col(id), col("label"),
        transform(col("bv"), x => x.getField("bucket")).as("indices"),
        transform(col("bv"), x => x.getField("v")).as("values"))
  }

  /** Margin + probability columns for `feats` under (weights, bias). */
  private def forward(feats: DataFrame, w: Array[Double], b: Double): DataFrame =
    feats
      .withColumn("margin",
        graft.functions.VectorOps.sparseDotLit(
          col("indices"), col("values"), w.toSeq) + lit(b))
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("margin"))))

  /** Full-batch logistic regression with L2 regularization. `feats` is
    * [[featurize]]'s output (or any (id, label, indices, values) table).
    */
  def train(feats: DataFrame, dim: Int, iters: Int, lr: Double,
      l2: Double = 0.0): Model = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val cached = feats.select(col("label").cast("double").as("label"),
      col("indices"), col("values")).cache()
    val n = cached.count().toDouble
    require(n > 0, "cannot train on an empty feature table")
    val w = Array.fill(dim)(0.0)
    var b = 0.0
    val losses = Seq.newBuilder[Double]
    try {
      for (_ <- 0 until iters) {
        // ONE job per iteration: weight gradients, the bias gradient, and
        // the loss ride the same explode + bucket aggregation — sentinel
        // buckets -1 (bias: d/db = err) and -2 (log loss, clamped for
        // numerical safety) extend each row's sparse pair list, so the
        // forward pass scans the cached features exactly once and the
        // post-partial-agg exchange is ≤ dim + 2 rows
        val f = forward(cached, w, b)
          .withColumn("err", col("p") - col("label"))
          .withColumn("ll",
            -(col("label") * log(greatest(col("p"), lit(1e-12))) +
              (lit(1.0) - col("label")) *
                log(greatest(lit(1.0) - col("p"), lit(1e-12)))))
          .withColumn("bkts", concat(col("indices"), array(lit(-1), lit(-2))))
          .withColumn("cvs", concat(
            transform(col("values"), v => v * col("err")),
            array(col("err"), col("ll"))))
        val sums = f
          .select(explode(arrays_zip(col("bkts"), col("cvs"))).as("z"))
          .groupBy(col("z.bkts").as("bucket"))
          .agg(sum(col("z.cvs")).as("g"))
          .collect()
        val grad = new Array[Double](dim)
        var gb = 0.0
        sums.foreach { r =>
          r.getInt(0) match {
            case -1 => gb = r.getDouble(1)
            case -2 => losses += r.getDouble(1) / n
            case j  => grad(j) = r.getDouble(1)
          }
        }
        var j = 0
        while (j < dim) {
          w(j) -= lr * (grad(j) / n + l2 * w(j))
          j += 1
        }
        b -= lr * gb / n
      }
    } finally cached.unpersist()
    Model(w, b, dim, losses.result())
  }

  /** Score a feature table under a model: (id, label, score, pred). */
  def score(feats: DataFrame, model: Model): DataFrame = {
    val id = feats.columns(0)
    forward(feats, model.weights, model.bias)
      .select(col(id), col("label"), col("p").as("score"),
        (col("p") >= 0.5).cast("int").as("pred"))
  }
}
