package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, NullType, StringType}

/** SQL-surface registration for the engine's native Catalyst kernels: after
  * `SqlFunctions.register(spark)`, every kernel is callable from `spark.sql`
  * under the same name the Column API uses — one Catalyst expression behind
  * both front-ends, so results are identical by construction.
  *
  * The builder table is the single source of truth; [[names]] exposes it so
  * the SQL-misuse gate (SqlSurfaceSpec) can PROVE it covers every registered
  * kernel rather than trusting a hand-maintained parallel list.
  *
  * EVERY misuse fails analysis with an AnalysisException naming the kernel
  * and argument — wrong types and out-of-range values via each kernel's
  * checkInputDataTypes, and (since round 5) non-literal / wrong-count
  * parameters too: builders run at function-resolution time, before
  * analysis completes, so instead of throwing raw IllegalArgumentException
  * there, a failed parameter extraction returns [[InvalidKernelCall]] — a
  * placeholder whose checkInputDataTypes always fails, deferring the error
  * to the analyzer where it surfaces under the same contract.
  */
object SqlFunctions {

  /** Control-flow exception for parameter-extraction failures inside a
    * builder; [[register]] converts it to an [[InvalidKernelCall]] so the
    * failure surfaces as an AnalysisException during analysis, never as an
    * IllegalArgumentException at expression-build time.
    */
  private final case class KernelMisuse(fn: String, msg: String)
      extends RuntimeException(s"$fn: $msg")

  /** Analysis-failing placeholder for a malformed kernel call (non-literal
    * scalar parameter, wrong argument count). Never survives analysis.
    */
  private[functions] case class InvalidKernelCall(
      fn: String, msg: String, args: Seq[Expression])
      extends Expression with CodegenFallback {
    override def children: Seq[Expression] = args
    override def dataType: DataType = NullType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      TypeCheckResult.TypeCheckFailure(s"$fn: $msg")
    override def eval(input: InternalRow): Any =
      throw new IllegalStateException(s"$fn: unreachable — fails analysis")
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): InvalidKernelCall =
      copy(args = newChildren)
  }

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw KernelMisuse(fn, s"$arg must be an integer literal, got $other")
  }

  private def stringLit(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) if v != null =>
      v.toString
    case other => throw KernelMisuse(fn, s"$arg must be a string literal, got $other")
  }

  /** A CONSTANT array<string> parameter. The accepted contract is wider
    * than [[intLit]]/[[stringLit]]'s strict-literal rule, deliberately:
    * ANY resolved foldable array<string> expression is evaluated at
    * resolution time — `array('a', 'b')`, but also constant-folding
    * shapes like `split('a b', ' ')` — because there is no literal
    * syntax for arrays in SQL; "constant at analysis time" is the real
    * requirement (the kernel embeds the table in the plan). The SQL
    * empty array `array()` resolves to array<null> and is accepted as
    * the empty table. Null ELEMENTS pass through; the kernel's
    * checkInputDataTypes rejects them with the argument-naming message.
    */
  private def stringArrayLit(e: Expression, fn: String, arg: String): Seq[String] =
    e match {
      case a if a.resolved && a.foldable &&
          a.dataType.isInstanceOf[ArrayType] &&
          a.dataType.asInstanceOf[ArrayType].elementType == StringType =>
        val ad = a.eval().asInstanceOf[ArrayData]
        if (ad == null) throw KernelMisuse(fn, s"$arg must be a non-null array<string> literal")
        Seq.tabulate(ad.numElements()) { i =>
          if (ad.isNullAt(i)) null else ad.getUTF8String(i).toString
        }
      case a if a.resolved && a.foldable &&
          a.dataType.isInstanceOf[ArrayType] &&
          a.dataType.asInstanceOf[ArrayType].elementType == NullType =>
        // `array()` with no elements types as array<null>: an empty merge
        // table, legal. A NON-empty array<null> is all-null elements —
        // reject here with the naming message (the string-typed kernel
        // would otherwise never see it).
        val ad = a.eval().asInstanceOf[ArrayData]
        if (ad == null || ad.numElements() > 0)
          throw KernelMisuse(fn, s"$arg must be an array<string> literal with non-null elements")
        Seq.empty
      case other =>
        throw KernelMisuse(fn, s"$arg must be an array<string> literal, got $other")
    }

  private def arity(fn: String, args: Seq[Expression], ns: Int*): Unit =
    if (!ns.contains(args.length))
      throw KernelMisuse(fn, s"expects ${ns.mkString(" or ")} arguments, got ${args.length}")

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> { args =>
      arity("cosine_sim", args, 2); CosineSim(args(0), args(1))
    },
    "cosine_sim_prenorm" -> { args =>
      arity("cosine_sim_prenorm", args, 3)
      CosineSimPreNorm(args(0), args(1), args(2))
    },
    "l2_norm" -> { args =>
      arity("l2_norm", args, 1); L2Norm(args(0))
    },
    "sq_dist" -> { args =>
      arity("sq_dist", args, 2); SqDist(args(0), args(1))
    },
    "simhash64" -> { args =>
      arity("simhash64", args, 1, 2)
      val n = if (args.length == 2) intLit(args(1), "simhash64", "ngram") else 1
      SimHash64(args(0), n)
    },
    "token_rolling_hash" -> { args =>
      arity("token_rolling_hash", args, 1); TokenRollingHash(args(0))
    },
    "token_hash_set" -> { args =>
      arity("token_hash_set", args, 1); TokenHashSet(args(0))
    },
    "jaccard_longs" -> { args =>
      arity("jaccard_longs", args, 2); JaccardLongs(args(0), args(1))
    },
    "sig_agreement" -> { args =>
      arity("sig_agreement", args, 2); SigAgreement(args(0), args(1))
    },
    "minhash_sig" -> { args =>
      arity("minhash_sig", args, 2, 3)
      val k = intLit(args(1), "minhash_sig", "k")
      val n = if (args.length == 3) intLit(args(2), "minhash_sig", "ngram") else 1
      MinHashSig(args(0), k, n)
    },
    "shingle_hashes" -> { args =>
      arity("shingle_hashes", args, 2)
      ShingleHashes(args(0), intLit(args(1), "shingle_hashes", "ngram"))
    },
    "top_token_count" -> { args =>
      arity("top_token_count", args, 1); TopTokenCount(args(0))
    },
    "bpe_merge_step" -> { args =>
      arity("bpe_merge_step", args, 3)
      BpeMergeStep(args(0), stringLit(args(1), "bpe_merge_step", "left"),
        stringLit(args(2), "bpe_merge_step", "right"))
    },
    "bpe_apply_all" -> { args =>
      arity("bpe_apply_all", args, 3)
      BpeApplyAll(args(0), stringArrayLit(args(1), "bpe_apply_all", "lefts"),
        stringArrayLit(args(2), "bpe_apply_all", "rights"))
    },
    "hyperplane_buckets" -> { args =>
      arity("hyperplane_buckets", args, 3, 4)
      val planes = intLit(args(1), "hyperplane_buckets", "nPlanes")
      val tables = intLit(args(2), "hyperplane_buckets", "nTables")
      val seed = if (args.length == 4) intLit(args(3), "hyperplane_buckets", "seed") else 0
      HyperplaneBuckets(args(0), planes, tables, seed)
    },
    "nfc_normalize" -> { args =>
      arity("nfc_normalize", args, 1); NfcNormalize(args(0))
    },
    "hll_distinct" -> { args =>
      arity("hll_distinct", args, 1)
      HllDistinctAgg(org.apache.spark.sql.catalyst.expressions.Cast(
        args(0), StringType)).toAggregateExpression()
    },
    "jaro_winkler" -> { args =>
      arity("jaro_winkler", args, 2); JaroWinkler(args(0), args(1))
    })

  /** Every SQL-registered kernel name (the misuse gate iterates this). */
  def names: Seq[String] = builders.map(_._1)

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      val deferred: Seq[Expression] => Expression = args =>
        try builder(args)
        catch { case KernelMisuse(fn, msg) => InvalidKernelCall(fn, msg, args) }
      ColumnGlue.registerTempFunction(spark, name, deferred)
    }
}
