package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) — the compression format behind
  * billion-scale ANN serving: each dim-vector is split into `m` subspaces of
  * `dsub = dim / m` dims, each subspace k-means-quantized independently, and
  * a vector is stored as `m` small centroid indexes instead of `dim` floats
  * (8 ints vs 64 floats on the fixture — and `m` BYTES once packed, a
  * 32× reduction). Query scoring is asymmetric distance (ADC): per query,
  * a driver-side `m × k` lookup table of subspace dot products turns each
  * row's score into `m` table lookups — no float vector is ever read at
  * scan time, which is what makes a 100 TB index RAM-resident.
  *
  * Training composes the existing [[KMeans]] operator per subspace (driver
  * loop over `m` subspaces, each a distributed Lloyd refinement on the
  * sliced vectors — the slice is a narrow projection, vectors never
  * shuffle). Seeds are the `k` lowest-id vectors' slices: deterministic,
  * repartition-stable, and the standard "sample k points" PQ
  * initialization.
  */
object ProductQuantizer {

  /** Trained codebooks: `flat` is [sub][centroid][dim]-flattened,
    * `m · k · dsub` doubles — driver-sized by the PQ contract (8·16·8 = 1k
    * doubles on the fixture), the KMeans k×dim move.
    */
  final case class Codebooks(m: Int, dsub: Int, k: Int, flat: Array[Double]) {
    def centroid(sub: Int, c: Int): Array[Double] = {
      val base = (sub * k + c) * dsub
      java.util.Arrays.copyOfRange(flat, base, base + dsub)
    }
  }

  /** Train per-subspace codebooks on (id, vec). `dim` must divide by `m`. */
  def train(vecs: DataFrame, m: Int, k: Int, iters: Int): Codebooks = {
    val idCol = vecs.columns(0)
    val vecCol = vecs.columns(1)
    val dim = vecs.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be a multiple of m=$m")
    val dsub = dim / m
    // deterministic seeds: the k lowest-id vectors, sliced per subspace
    val seedRows = vecs.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(seedRows.length == k, s"need >= $k vectors to seed, got ${seedRows.length}")
    val flat = new Array[Double](m * k * dsub)
    for (sub <- 0 until m) {
      val sliced = vecs.select(col(idCol),
        expr(s"slice($vecCol, ${sub * dsub + 1}, $dsub)").as("v"))
      val seed = seedRows.map(r => r.slice(sub * dsub, (sub + 1) * dsub)).toSeq
      val cs =
        if (iters == 0) seed
        else KMeans.refine(sliced, seed, iters)._2
      for (c <- 0 until k; d <- 0 until dsub)
        flat((sub * k + c) * dsub + d) = cs(c)(d)
    }
    Codebooks(m, dsub, k, flat)
  }

  /** (id, codes) — one narrow pass through the PqEncode kernel. `packed`
    * stores codes as BINARY (`m` bytes/vector — the real 32× format;
    * requires k ≤ 256) instead of `array<int>`; both score identically
    * through [[adcScore]].
    */
  def encode(vecs: DataFrame, cb: Codebooks, packed: Boolean = false): DataFrame = {
    val idCol = vecs.columns(0)
    val vecCol = vecs.columns(1)
    vecs.select(col(idCol),
      VectorOps.pqEncode(col(vecCol), cb.m, cb.dsub, cb.flat.toSeq, packed).as("codes"))
  }

  /** ADC cosine of a literal query against a codes column: the two
    * `m × k` LUTs (subspace dot products and centroid norms) are computed
    * HERE, once per query, and ride into the single kernel node.
    */
  def adcScore(codes: org.apache.spark.sql.Column, cb: Codebooks,
      q: Array[Double]): org.apache.spark.sql.Column = {
    require(q.length == cb.m * cb.dsub,
      s"query dim ${q.length} != index dim ${cb.m * cb.dsub}")
    val lutDot = new Array[Double](cb.m * cb.k)
    val lutNorm = new Array[Double](cb.m * cb.k)
    for (sub <- 0 until cb.m; c <- 0 until cb.k) {
      var dot = 0.0
      var n2 = 0.0
      for (d <- 0 until cb.dsub) {
        val cd = cb.flat((sub * cb.k + c) * cb.dsub + d)
        dot += q(sub * cb.dsub + d) * cd
        n2 += cd * cd
      }
      lutDot(sub * cb.k + c) = dot
      lutNorm(sub * cb.k + c) = n2
    }
    val qnorm = math.sqrt(q.map(x => x * x).sum)
    VectorOps.pqAdcScore(codes, cb.k, lutDot.toSeq, lutNorm.toSeq, qnorm)
  }

  /** Persist the one-row codebook table. */
  def writeCodebooks(spark: SparkSession, cb: Codebooks, path: String): Unit = {
    import spark.implicits._
    Seq((cb.m, cb.dsub, cb.k, cb.flat.toSeq))
      .toDF("m", "dsub", "k", "flat")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Persist / load the PQ index: a one-row codebook table plus the codes
    * table (codes-last write, so `_SUCCESS` on `codes` implies a complete
    * index).
    */
  def writeIndex(spark: SparkSession, cb: Codebooks, codes: DataFrame,
      outDir: String): Unit = {
    writeCodebooks(spark, cb, s"$outDir/codebooks")
    codes.write.mode("overwrite").parquet(s"$outDir/codes")
  }

  def readCodebooks(spark: SparkSession, dir: String): Codebooks = {
    val r = spark.read.parquet(s"$dir/codebooks").head()
    Codebooks(r.getAs[Int]("m"), r.getAs[Int]("dsub"), r.getAs[Int]("k"),
      r.getSeq[Double](r.fieldIndex("flat")).toArray)
  }
}
