package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** HyperLogLog distinct-count as a native imperative aggregate — the
  * engine's first TypedImperativeAggregate: O(1) state (256 byte
  * registers) regardless of cardinality, a bytewise-max merge that is
  * COMMUTATIVE AND ASSOCIATIVE, so the result is bit-identical under any
  * partitioning, merge order, or AQE re-plan — stronger determinism than
  * any float partial-sum aggregate in Spark itself.
  *
  * The sketch definition is EXACTLY x152's relational construction
  * (`Events.hllDistinct`): register = first md5 hex byte (m = 256),
  * rho = 1 + leading-zero bits of the next 32 md5 bits (capped 33),
  * estimate = alpha·m²/Σ2^(−reg) with Flajolet's low-range linear-counting
  * correction. Every estimator term is an exact dyadic rational and the
  * correction's ln is finitely checked (see x152's scaladoc), so
  * HllAggSpec can pin THIS aggregate ≡ the relational pipeline ≡ the
  * DuckDB oracle, estimate for estimate — a hash-verified approximate
  * aggregate, end to end.
  *
  * Where x152 carries (day × 256) rows through ordinary group-by
  * machinery (pedagogical, oracle-checkable), this form is the production
  * shape: updates are in-place byte writes inside ObjectHashAggregate,
  * partials ship 256 bytes per group, and the same sketch drops into any
  * grouping without materializing registers as rows.
  */
@ExpressionDescription(
  usage = "_FUNC_(expr) - HyperLogLog-estimated count of distinct non-null values of expr (m = 256 md5-derived registers).")
case class HllDistinctAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  private val M = 256

  // Both surfaces wrap the argument in CAST(.. AS STRING) — the exact
  // md5(CAST(x AS STRING)) input x152 hashes — so the sketch definition
  // has a single canonical byte stream per value.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_distinct: argument must be a string (callers cast), got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) {
      val d = MessageDigest.getInstance("MD5")
        .digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      val reg = d(0) & 0xff
      val suffix = ((d(1) & 0xff) << 24) | ((d(2) & 0xff) << 16) |
        ((d(3) & 0xff) << 8) | (d(4) & 0xff)
      val rho =
        if (suffix == 0) 33 else Integer.numberOfLeadingZeros(suffix) + 1
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // identical arithmetic to x152's oracle-verified estimator: exact
    // dyadic terms summed in fixed register order, alpha folded the same
    // way, Flajolet low-range correction on the same branch condition
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    var z = 0.0
    var present = 0
    var i = 0
    while (i < M) {
      val r = buf(i)
      if (r > 0) { z += 1.0 / (1L << r).toDouble; present += 1 }
      i += 1
    }
    val vzero = M - present
    val raw = alpha * M * M / (z + vzero)
    if (raw <= 2.5 * M && vzero > 0) Math.round(M.toDouble * Math.log(M.toDouble / vzero))
    else Math.round(raw)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinctAgg =
    copy(child = newChild)
}

object HllAggregate {

  /** Column-API surface: `df.agg(HllAggregate.hllDistinct(col("user_id")))`.
    * Non-string inputs take the same implicit cast-to-string path the SQL
    * form (and x152's md5(CAST(.. AS STRING))) uses.
    */
  def hllDistinct(c: Column): Column =
    ColumnGlue.column(
      HllDistinctAgg(ColumnGlue.expression(c.cast("string"))).toAggregateExpression())
}
