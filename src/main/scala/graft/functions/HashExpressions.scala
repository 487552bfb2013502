package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native Catalyst expressions for the text-fingerprinting operators the
  * built-in function library can't express in one pass.
  *
  * Both run inside the row pipeline (no extra shuffle, no Scala-UDF
  * serialization overhead); `CodegenFallback` keeps them inside the
  * WholeStageCodegen span of the surrounding plan with a single virtual call.
  * Semantics derive from the public SimHash (Charikar 2002) and Karp-Rabin
  * rolling-hash constructions; token hashing reuses Spark's own xxhash64 so
  * results are deterministic across JVMs and cluster nodes.
  */

/** 64-bit SimHash over an array<string> of tokens.
  *
  * bit b of the output = sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1).
  * Near-duplicate documents land within a small Hamming distance.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Karp-Rabin polynomial rolling hash over an array<string> of tokens:
  * h = Σ token_hash_i · B^(n-1-i)  (mod 2^64), B = 1000003.
  *
  * Order-sensitive (unlike SimHash), so it fingerprints the document as a
  * sequence — the document-identity primitive for shift-tolerant dedup.
  */
case class TokenRollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_rolling_hash"

  private val B = 1000003L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var h = 0L
    var i = 0
    while (i < arr.numElements()) {
      val t = if (arr.isNullAt(i)) 0L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      h = h * B + t // wraps mod 2^64 — deterministic on the JVM
      i += 1
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): TokenRollingHash =
    copy(child = newChild)
}

object HashFunctions {
  /** Column API for [[SimHash64]]. */
  def simhash64(tokens: Column): Column =
    ColumnGlue.column(SimHash64(ColumnGlue.expression(tokens)))

  /** Column API for [[TokenRollingHash]]. */
  def tokenRollingHash(tokens: Column): Column =
    ColumnGlue.column(TokenRollingHash(ColumnGlue.expression(tokens)))
}
