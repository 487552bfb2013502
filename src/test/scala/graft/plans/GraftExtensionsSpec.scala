package graft.plans

import graft.{SparkSpec, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** The optimizer-rule seam: [[HoistCosineNorm]] must rewrite a
  * constant-side `cosine_sim` into the prenorm kernel with the norm folded
  * at optimization time, without changing a single result bit.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("HoistCosineNorm folds the constant query norm at optimization time") {
    val e = Tables(spark, sf001, "embeddings")
    val qvec = e.where(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

    def query() = e.select(col("vec_id"),
      VectorOps.cosine(col("embedding"), typedlit(qvec)).as("sim"))
      .orderBy("vec_id").limit(50)

    val baseline = query().collect().map(_.getDouble(1)).toSeq
    assert(!query().queryExecution.optimizedPlan.toString.contains("cosine_sim_prenorm"),
      "rule must not be active before installation")

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HoistCosineNorm
    try {
      val opt = query()
      val plan = opt.queryExecution.optimizedPlan.toString
      assert(plan.contains("cosine_sim_prenorm"),
        s"constant-side cosine must be rewritten:\n$plan")
      assert(!plan.contains("cosine_sim("),
        s"the naive kernel must be gone:\n$plan")
      val rewritten = opt.collect().map(_.getDouble(1)).toSeq
      assert(rewritten == baseline, "identical arithmetic => bit-identical results")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == HoistCosineNorm)
  }

  test("the rule is symmetric: a constant LEFT side hoists too") {
    val e = Tables(spark, sf001, "embeddings")
    val qvec = e.where(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HoistCosineNorm
    try {
      val flipped = e.select(col("vec_id"),
        VectorOps.cosine(typedlit(qvec), col("embedding")).as("sim"))
        .orderBy("vec_id").limit(20)
      assert(flipped.queryExecution.optimizedPlan.toString.contains("cosine_sim_prenorm"),
        "constant-left cosine must hoist like constant-right")
      // cosine symmetry + IEEE commutativity: same values either way
      val straight = e.select(col("vec_id"),
        VectorOps.cosine(col("embedding"), typedlit(qvec)).as("sim"))
        .orderBy("vec_id").limit(20)
      assert(flipped.collect().map(_.getDouble(1)).toSeq ==
        straight.collect().map(_.getDouble(1)).toSeq)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == HoistCosineNorm)
  }

  test("non-constant sides are left untouched") {
    val e = Tables(spark, sf001, "embeddings")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HoistCosineNorm
    try {
      val both = e.as("a").join(e.as("b"), col("a.vec_id") === col("b.vec_id"))
        .select(VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("sim"))
      val plan = both.queryExecution.optimizedPlan.toString
      assert(plan.contains("cosine_sim(") && !plan.contains("cosine_sim_prenorm"),
        s"two variable sides must stay on the symmetric kernel:\n$plan")
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == HoistCosineNorm)
  }
}
