package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the other standard ANN compression format
  * next to PQ: each dimension linearly quantized to one unsigned byte
  * inside its trained [min, max] range. 4× smaller than float32 with
  * near-lossless recall on normalized embeddings (FAISS's
  * `ScalarQuantizer(QT_8bit)`), and unlike PQ it needs no codebook
  * training — one min/max aggregation over the corpus IS the model.
  *
  * Scale shape: training is a single posexplode + per-dim min/max whose
  * post-partial-agg exchange is `dim` rows; encoding is a narrow per-row
  * kernel with the (min, Δ) tables inlined as literals; serving scans
  * ONLY the byte codes (dim bytes/row) through one
  * [[graft.functions.Sq8AdcScore]] kernel node that scores each row's
  * reconstruction against the float query exactly — the float corpus is
  * never read at query time.
  */
object ScalarQuantizer {

  /** Per-dim quantization model: `mins(d)` and `deltas(d) = max_d − min_d`
    * — 2·dim doubles, driver-sized by construction.
    */
  final case class Sq8Model(mins: Array[Double], deltas: Array[Double]) {
    def dim: Int = mins.length
    def reconstruct(codes: Array[Byte]): Array[Double] = {
      val out = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        out(d) = mins(d) + (codes(d) & 0xff).toDouble * deltas(d) / 255.0
        d += 1
      }
      out
    }
  }

  /** Train per-dim ranges on (id, vec): one explode + groupBy(dim) whose
    * exchange is `dim` rows after partial aggregation.
    */
  def train(vecs: DataFrame): Sq8Model = {
    val vecCol = vecs.columns(1)
    val ranges = vecs
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("lo"), max("x").as("hi"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mins = ranges.map(_._2)
    val deltas = ranges.map(t => t._3 - t._2)
    Sq8Model(mins, deltas)
  }

  /** Encode (id, vec) → (id, codes binary) under the model literals. */
  def encode(vecs: DataFrame, model: Sq8Model): DataFrame = {
    val idCol = vecs.columns(0)
    val vecCol = vecs.columns(1)
    vecs.select(col(idCol),
      graft.functions.VectorOps.sq8Encode(col(vecCol),
        model.mins.toSeq, model.deltas.toSeq).as("codes"))
  }

  /** Persist model + codes (codes LAST, so `_SUCCESS` on `codes` implies
    * the whole index landed — the LSH-index write discipline).
    */
  def writeIndex(s: org.apache.spark.sql.SparkSession, model: Sq8Model,
      codes: DataFrame, outDir: String): Unit = {
    import s.implicits._
    model.mins.indices.map(d => (d, model.mins(d), model.deltas(d)))
      .toDF("d", "mn", "dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/model")
    codes.write.mode("overwrite").parquet(s"$outDir/codes")
  }

  /** Restore the 2·dim-double model from its parquet artifact. */
  def readModel(s: org.apache.spark.sql.SparkSession, outDir: String): Sq8Model = {
    val rows = s.read.parquet(s"$outDir/model").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    Sq8Model(rows.map(_._2), rows.map(_._3))
  }

  /** Driver-folded ADC constants for one query: (aDot, nLin, nQuad,
    * dotBase, n2Base, qnorm). The single-query kernel consumes them
    * whole; the batch probe stacks `aDot`/`dotBase`/`qnorm` per query and
    * keeps the query-independent norm tables once — both paths fold with
    * THIS loop, so their scores are bit-identical by construction.
    */
  def adcTables(model: Sq8Model, qvec: Array[Double])
      : (Array[Double], Array[Double], Array[Double], Double, Double, Double) = {
    require(qvec.length == model.dim,
      s"query dim ${qvec.length} != model dim ${model.dim}")
    val dim = model.dim
    val aDot = new Array[Double](dim)
    val nLin = new Array[Double](dim)
    val nQuad = new Array[Double](dim)
    var dotBase = 0.0
    var n2Base = 0.0
    var qn = 0.0
    var d = 0
    while (d < dim) {
      val step = model.deltas(d) / 255.0
      aDot(d) = qvec(d) * step
      nLin(d) = 2.0 * model.mins(d) * step
      nQuad(d) = step * step
      dotBase += qvec(d) * model.mins(d)
      n2Base += model.mins(d) * model.mins(d)
      qn += qvec(d) * qvec(d)
      d += 1
    }
    (aDot, nLin, nQuad, dotBase, n2Base, math.sqrt(qn))
  }

  /** ADC scoring constants for a query, folded once on the driver. */
  def adcScore(codes: org.apache.spark.sql.Column, model: Sq8Model,
      qvec: Array[Double]): org.apache.spark.sql.Column = {
    val (aDot, nLin, nQuad, dotBase, n2Base, qnorm) = adcTables(model, qvec)
    graft.functions.VectorOps.sq8AdcScore(codes,
      aDot.toSeq, nLin.toSeq, nQuad.toSeq, dotBase, n2Base, qnorm)
  }
}
