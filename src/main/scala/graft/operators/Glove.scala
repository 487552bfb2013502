package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed embedding trainer — hashed GloVe (Pennington et al. 2014)
  * over the engine's own co-occurrence machinery: the repo consumed
  * fixture embeddings everywhere (x06/x07b/PQ/IVF) but could not PRODUCE
  * one; this operator closes that gap with vectors trained from the
  * `documents` corpus itself.
  *
  * Two design choices carry the 100-TB story:
  *
  *   - HASHED vocabulary (the x80 featurizer's move): words map to
  *     `xxhash64 mod buckets`, so the model is `buckets × dim` — a fixed
  *     MODEL-sized array independent of corpus vocabulary. Collisions
  *     blend rare words into shared vectors (the standard hashing-trick
  *     trade, Weinberger et al. 2009); frequent words dominate their
  *     buckets. No vocab dictionary is ever built, stored, or broadcast.
  *   - SUFFICIENT-STATISTICS training: the corpus is exploded ONCE into a
  *     hashed co-occurrence cell table (≤ buckets² rows, usually far
  *     sparser — x99's pair-count shape), checkpointed, and every
  *     training iteration is ONE job over the CELLS: a `treeAggregate`
  *     whose per-partition accumulator is the full-batch gradient
  *     (2·buckets·dim + 2·buckets + 1 doubles — model-sized, the
  *     [[Opq]]/[[QualityClassifier]] exchange discipline). Text is never
  *     touched again after the single explode; iteration cost depends on
  *     the CELL count, not the corpus.
  *
  * Optimization is full-batch AdaGrad on the GloVe objective
  * `Σ f(x)·(wᵢ·c_j + bᵢ + b_j − ln x)²`, `f(x) = min(1, (x/xmax)^0.75)`,
  * with the AdaGrad state held driver-side next to the parameters.
  * Full-batch (not GloVe's sampled SGD) because the hashed cell table IS
  * the dataset — deterministic pass structure, monotone-trending loss,
  * and one job per iteration instead of a shuffle of parameter shards.
  * Init is deterministic (SplitMix64 of the parameter index), so training
  * is reproducible up to partial-aggregation ulps; GloveSpec gates the
  * SEMANTIC properties (loss descent, collocation geometry) rather than
  * bit-equality, the KMeans precedent.
  */
object Glove {

  /** Trained model: `w(b·dim + d)` — the word vector table (input +
    * context vectors summed, GloVe's published serving form).
    */
  final case class Model(buckets: Int, dim: Int, w: Array[Double]) {
    def vec(b: Int): Array[Double] =
      java.util.Arrays.copyOfRange(w, b * dim, (b + 1) * dim)

    def cosine(a: Int, b: Int): Double = {
      val va = vec(a); val vb = vec(b)
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        d += va(i) * vb(i); na += va(i) * va(i); nb += vb(i) * vb(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
  }

  /** Hash a word column to its bucket — THE shared definition: training,
    * serving, and the spec must bucket identically or vectors detach from
    * their words (the x69 encoder-sharing discipline).
    */
  def bucketCol(word: Column, buckets: Int): Column =
    pmod(xxhash64(word), lit(buckets.toLong)).cast("int")

  /** Driver twin of [[bucketCol]] (same xxhash64 seed-42, same pmod) —
    * GloveSpec pins the agreement; serving code that holds a word
    * driver-side (the x112 collocation scorer) buckets through this.
    */
  def bucketOf(word: String, buckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(word),
      org.apache.spark.sql.types.StringType, 42L)
    (((h % buckets) + buckets) % buckets).toInt
  }

  /** Symmetric hashed co-occurrence cells from (id, text): window-1 word
    * bigrams (x99's pair table), both directions, bucketed and counted.
    * ≤ buckets² rows; the ONE pass that touches text.
    */
  def cooccurCells(d: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val bg = d.select(explode(expr(
        s"zip_with(slice(split($textCol, ' '), 1, greatest(size(split($textCol, ' ')) - 1, 0)), " +
          s"slice(split($textCol, ' '), 2, greatest(size(split($textCol, ' ')) - 1, 0)), " +
          "(a, b) -> struct(a as w1, b as w2))")).as("b"))
      .select(bucketCol(col("b.w1"), buckets).as("u"),
        bucketCol(col("b.w2"), buckets).as("v"))
    bg.unionAll(bg.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).cast("double").as("x"))
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic small init in (−0.5/dim, 0.5/dim) from the parameter
    * index — reproducible without RNG state.
    */
  private def init(n: Int, dim: Int, salt: Long): Array[Double] =
    Array.tabulate(n) { i =>
      val u = ((mix64(i.toLong ^ salt) >>> 11).toDouble / (1L << 53).toDouble)
      (u - 0.5) / dim
    }

  /** Train on a cell table (u, v, x). Returns (model, per-iteration loss
    * trace). One `treeAggregate` job per iteration; cells should be
    * checkpointed by the caller if lineage is long.
    */
  def train(cells: DataFrame, buckets: Int, dim: Int, iters: Int,
      lr: Double = 0.05, xmax: Double = 100.0): (Model, Seq[Double]) = {
    require(iters >= 1, s"iters >= 1, got $iters")
    val sc = cells.sparkSession.sparkContext
    val n = buckets * dim
    val w = init(n, dim, 0x57L)      // input vectors
    val c = init(n, dim, 0xC7L)      // context vectors
    val bw = new Array[Double](buckets)
    val bc = new Array[Double](buckets)
    // AdaGrad accumulators (driver state, model-sized)
    val gw = Array.fill(n)(1e-8); val gc = Array.fill(n)(1e-8)
    val gbw = Array.fill(buckets)(1e-8); val gbc = Array.fill(buckets)(1e-8)
    val rows = cells.select(
      col(cells.columns(0)).cast("int"),
      col(cells.columns(1)).cast("int"),
      col(cells.columns(2)).cast("double"))
    val trace = Seq.newBuilder[Double]
    for (_ <- 0 until iters) {
      val bcast = sc.broadcast((w.clone(), c.clone(), bw.clone(), bc.clone()))
      // ONE job: full-batch gradients + loss in a model-sized accumulator
      val zero = (new Array[Double](n), new Array[Double](n),
        new Array[Double](buckets), new Array[Double](buckets), 0.0)
      val (dw, dc, dbw, dbc, loss) = rows.rdd.treeAggregate(zero)(
        seqOp = { case ((aw, ac, abw, abc, l), row) =>
          val (pw, pc, pbw, pbc) = bcast.value
          val u = row.getInt(0); val v = row.getInt(1); val x = row.getDouble(2)
          var dot = 0.0
          var i = 0
          while (i < dim) { dot += pw(u * dim + i) * pc(v * dim + i); i += 1 }
          val f = math.min(1.0, math.pow(x / xmax, 0.75))
          val err = dot + pbw(u) + pbc(v) - math.log(x)
          val g = f * err
          i = 0
          while (i < dim) {
            aw(u * dim + i) += g * pc(v * dim + i)
            ac(v * dim + i) += g * pw(u * dim + i)
            i += 1
          }
          abw(u) += g
          abc(v) += g
          (aw, ac, abw, abc, l + 0.5 * f * err * err)
        },
        combOp = { case ((a1, c1, b1, d1, l1), (a2, c2, b2, d2, l2)) =>
          var i = 0
          while (i < n) { a1(i) += a2(i); c1(i) += c2(i); i += 1 }
          i = 0
          while (i < buckets) { b1(i) += b2(i); d1(i) += d2(i); i += 1 }
          (a1, c1, b1, d1, l1 + l2)
        })
      bcast.destroy()
      // driver-side AdaGrad apply (model-sized loop)
      var i = 0
      while (i < n) {
        gw(i) += dw(i) * dw(i); w(i) -= lr * dw(i) / math.sqrt(gw(i))
        gc(i) += dc(i) * dc(i); c(i) -= lr * dc(i) / math.sqrt(gc(i))
        i += 1
      }
      i = 0
      while (i < buckets) {
        gbw(i) += dbw(i) * dbw(i); bw(i) -= lr * dbw(i) / math.sqrt(gbw(i))
        gbc(i) += dbc(i) * dbc(i); bc(i) -= lr * dbc(i) / math.sqrt(gbc(i))
        i += 1
      }
      trace += loss
    }
    // serve w + c (the GloVe paper's X_final = W + W̃)
    val served = new Array[Double](n)
    var i = 0
    while (i < n) { served(i) = w(i) + c(i); i += 1 }
    (Model(buckets, dim, served), trace.result())
  }

  /** Persist / load the model as a (bucket, vec) table — broadcast-join
    * shaped for serving (the model is bucket-count-sized, not
    * vocab-sized).
    */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    (0 until model.buckets).map(b => (b, model.vec(b).toSeq))
      .toDF("bucket", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val dim = rows.head._2.length
    val w = new Array[Double](rows.length * dim)
    rows.foreach { case (b, v) => System.arraycopy(v, 0, w, b * dim, dim) }
    Model(rows.length, dim, w)
  }

  /** Document embeddings from a trained model: mean of the token-bucket
    * vectors, via explode → broadcast model join → per-dim rollup (the
    * model table is bucket-sized — always broadcastable by construction).
    * Returns (id, embedding) — exactly the shape x06/x07b/IVF consume.
    */
  def docEmbeddings(d: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val modelDf = (0 until model.buckets).map(b => (b, model.vec(b).toSeq))
      .toDF("bucket", "bvec")
    d.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("word"))
      .select(col("id"), bucketCol(col("word"), model.buckets).as("bucket"))
      .join(broadcast(modelDf), Seq("bucket"))
      .select(col("id"), posexplode(col("bvec")))
      .groupBy(col("id"), col("pos")).agg(avg(col("col")).as("m"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("id"), expr("transform(pm, x -> x.m)").as("embedding"))
  }
}
