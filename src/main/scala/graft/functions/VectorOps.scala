package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.element_at
import org.apache.spark.sql.graftglue.ColumnGlue

/** Column API for vector math over `array<float>` / `array<double>` embedding
  * columns, backed by the native Catalyst kernels in
  * [[graft.functions.VectorExpressions VectorExpressions]].
  *
  * Earlier revisions built these from `zip_with`/`aggregate` higher-order
  * functions; Spark evaluates those interpreted (one closure dispatch per
  * element per row), which made similarity scans dominate the benchmark. The
  * native kernels run the identical double-precision, left-to-right
  * arithmetic as one tight loop per row, so results are bit-identical and
  * the DuckDB oracles are unchanged.
  */
object VectorOps {
  /** Cosine similarity in double precision, one fused pass. */
  def cosine(a: Column, b: Column): Column =
    ColumnGlue.column(CosineSim(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Cosine with the (constant, e.g. broadcast-query) right-side norm
    * precomputed via [[l2norm]] — hoists √(Σ b_i²) out of the per-row work.
    */
  def cosinePreNorm(a: Column, b: Column, bNorm: Column): Column =
    ColumnGlue.column(CosineSimPreNorm(
      ColumnGlue.expression(a), ColumnGlue.expression(b), ColumnGlue.expression(bNorm)))

  /** L2 norm in double precision. */
  def l2norm(a: Column): Column =
    ColumnGlue.column(L2Norm(ColumnGlue.expression(a)))

  /** Squared euclidean distance in double precision. */
  def sqDist(a: Column, b: Column): Column =
    ColumnGlue.column(SqDist(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Matrix-vector product with a literal row-major matrix — see [[MatVecLit]]. */
  def matVecLit(vec: Column, rows: Int, flat: Seq[Double]): Column =
    ColumnGlue.column(MatVecLit(ColumnGlue.expression(vec), rows, flat))

  /** Sparse dot with a literal dense weight vector — see [[SparseDotLit]]. */
  def sparseDotLit(indices: Column, values: Column, weights: Seq[Double]): Column =
    ColumnGlue.column(SparseDotLit(
      ColumnGlue.expression(indices), ColumnGlue.expression(values), weights))

  /** Nearest-centroid struct(cluster, dist) against a literal flat
    * centroid table in one node — see [[CellArgminLit]].
    */
  def cellArgmin(vec: Column, k: Int, flat: Seq[Double]): Column =
    ColumnGlue.column(CellArgminLit(ColumnGlue.expression(vec), k, flat))

  /** SQ8 linear quantization to dim bytes — see [[Sq8Encode]]. */
  def sq8Encode(vec: Column, mins: Seq[Double], deltas: Seq[Double]): Column =
    ColumnGlue.column(Sq8Encode(ColumnGlue.expression(vec), mins, deltas))

  /** SQ8 asymmetric cosine over byte codes — see [[Sq8AdcScore]]. */
  def sq8AdcScore(codes: Column, aDot: Seq[Double], nLin: Seq[Double],
      nQuad: Seq[Double], dotBase: Double, n2Base: Double, qnorm: Double): Column =
    ColumnGlue.column(Sq8AdcScore(ColumnGlue.expression(codes),
      aDot, nLin, nQuad, dotBase, n2Base, qnorm))

  /** Multi-query SQ8 cosine over (codes, query index) (see [[Sq8AdcScoreMulti]]). */
  def sq8AdcScoreMulti(codes: Column, qIdx: Column, aDot: Seq[Double],
      nLin: Seq[Double], nQuad: Seq[Double], dotBase: Seq[Double],
      n2Base: Double, qnorms: Seq[Double]): Column =
    ColumnGlue.column(Sq8AdcScoreMulti(
      ColumnGlue.expression(codes), ColumnGlue.expression(qIdx),
      aDot, nLin, nQuad, dotBase, n2Base, qnorms))

  /** Single random-hyperplane LSH bucket (sign bits of `nPlanes` projections
    * packed into a long) — see [[HyperplaneBuckets]]. Deterministic and
    * scale-invariant: positive scaling never flips a projection's sign.
    */
  def hyperplaneBucket(vec: Column, nPlanes: Int, seed: Int = 0): Column =
    element_at(ColumnGlue.column(
      HyperplaneBuckets(ColumnGlue.expression(vec), nPlanes, 1, seed)), 1)

  /** Multi-table LSH bucket array: `nTables` independent hyperplane codes
    * computed in one pass over the vector. Candidates = vectors sharing a
    * bucket in ANY table (union improves recall; each table stays a cheap
    * equi-join key).
    */
  def lshBuckets(vec: Column, nPlanes: Int, nTables: Int): Column =
    ColumnGlue.column(HyperplaneBuckets(ColumnGlue.expression(vec), nPlanes, nTables, 0))

  /** PQ encode: vector → `m` codebook indexes — `array<int>`, or BINARY
    * (`m` unsigned bytes, the 32× storage format; requires k ≤ 256) when
    * `packed` (see [[PqEncode]]).
    */
  def pqEncode(vec: Column, m: Int, dsub: Int, flatCodebook: Seq[Double],
      packed: Boolean = false): Column =
    ColumnGlue.column(PqEncode(ColumnGlue.expression(vec), m, dsub, flatCodebook, packed))

  /** PQ asymmetric-distance cosine over codes (see [[PqAdcScore]]). */
  def pqAdcScore(codes: Column, k: Int, lutDot: Seq[Double], lutNorm: Seq[Double],
      qnorm: Double): Column =
    ColumnGlue.column(PqAdcScore(ColumnGlue.expression(codes), k, lutDot, lutNorm, qnorm))

  /** Multi-query ADC cosine over (codes, query index) (see [[PqAdcScoreMulti]]). */
  def pqAdcScoreMulti(codes: Column, qIdx: Column, k: Int, lutDot: Seq[Double],
      lutNorm: Seq[Double], qnorms: Seq[Double]): Column =
    ColumnGlue.column(PqAdcScoreMulti(
      ColumnGlue.expression(codes), ColumnGlue.expression(qIdx), k, lutDot, lutNorm, qnorms))

  /** Multi-query residual ADC cosine over (codes, cell, query index)
    * (see [[PqAdcResidualScoreMulti]]).
    */
  def pqAdcResidualScoreMulti(codes: Column, cell: Column, qIdx: Column, k: Int,
      probedCells: Seq[Int], lutDot: Seq[Double], lutResidNorm: Seq[Double],
      lutCross: Seq[Double], qDotCell: Seq[Double], cellNorm2: Seq[Double],
      qnorms: Seq[Double]): Column =
    ColumnGlue.column(PqAdcResidualScoreMulti(
      ColumnGlue.expression(codes), ColumnGlue.expression(cell),
      ColumnGlue.expression(qIdx), k, probedCells, lutDot, lutResidNorm,
      lutCross, qDotCell, cellNorm2, qnorms))

  /** Residual-PQ ADC cosine over (codes, cell) (see [[PqAdcResidualScore]]). */
  def pqAdcResidualScore(codes: Column, cell: Column, k: Int, probedCells: Seq[Int],
      lutDot: Seq[Double], lutResidNorm: Seq[Double], lutCross: Seq[Double],
      qDotCell: Seq[Double], cellNorm2: Seq[Double], qnorm: Double): Column =
    ColumnGlue.column(PqAdcResidualScore(
      ColumnGlue.expression(codes), ColumnGlue.expression(cell), k, probedCells,
      lutDot, lutResidNorm, lutCross, qDotCell, cellNorm2, qnorm))
}
