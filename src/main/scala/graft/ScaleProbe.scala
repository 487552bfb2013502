package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10× scale probe (the r10 "exercise the 100×-shape claims"
  * task): synthesizes a seed-deterministic sf1-equivalent fixture from
  * sf0.1 — ten disjoint copies of documents / lineitem / orders with
  * shifted keys and copy-unique token suffixes (so near-dup shingle sets
  * stay DISJOINT across copies: the data grows 10×, not the pairwise
  * duplication structure, which would be a property of the synthetic
  * copies rather than of the operators) — and times the five most
  * expensive operator families at 1× and 10×, median-of-3 per point.
  * A family whose ratio lands near 10× scales linearly in rows; anything
  * clearly superlinear is a scale finding. Results → SCALE.md.
  *
  * Usage: sbt "runMain graft.ScaleProbe" (single JVM, idle box — the
  * bench discipline). The 10× fixture is throwaway (/tmp), never written
  * under /root/testdata.
  */
object ScaleProbe {

  private val Families = Seq(
    "x130_label_propagation", // co-partitioned superstep family
    "x236_allpairs_clusters", // prefix-filter exact near-dup + components
    "x145_containment_join", // shingle-keyed containment join
    "x260_poisson_bootstrap", // deterministic resampling fan-out
    "x80_quality_classifier", // hashed-feature training loop
    // round 12 (r11 verdict task 5): the dedup-eval family took over the
    // top of the bench (3.5-6.4 s at sf0.1) and had only a composition
    // argument — probe the two heaviest directly
    "x340_lsh_tuning_curve", // banded S-curve vs lossless truth tier
    "x366_minhash_pr_eval", // capped bucket pairs + distinct-pair scoring
    // round 14 (r13 verdict task 2b): the candidate-budget curve's τ=0.7
    // arm GROWS the candidate set as the threshold drops — confirm the
    // rarest-first prefix discipline keeps it near-linear at 10×
    "x402_prefix_budget_curve",
    // the Gini pair: per-document sort window (x399, the user-grain form)
    // vs histogram rank-walk (x403, the 100 TB form) — the probe is the
    // measured version of the rewrite's whole argument
    "x399_doc_length_gini",
    "x403_length_gini_hist")

  private def copies(df: DataFrame, n: Int, remap: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until n).map(i => remap(df, i)).reduce(_.unionAll(_))

  def build10x(spark: SparkSession, base: String, out: String): Unit = {
    val n = 10
    val docs = spark.read.parquet(s"$base/documents.parquet")
    // copy-unique token suffix keeps shingle sets disjoint across copies
    copies(docs, n, (d, i) =>
      if (i == 0) d
      else d.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"_c$i"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars")))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    copies(li, n, (d, i) =>
      d.select((col("l_orderkey") + lit(i * 10000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(i * 10000000L)).as("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate")))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
    val ord = spark.read.parquet(s"$base/orders.parquet")
    copies(ord, n, (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L)))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")
  }

  private def median3(f: => Unit): Double = {
    val reps = Seq.fill(3) {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    reps.sorted.apply(1)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional: probe only the named families (re-probing all seven when
    // one new family lands wastes an idle half hour)
    val picked = if (args.length > 1) Families.filter(args.tail.contains)
      else Families
    val out = s"${sys.props("java.io.tmpdir")}/graft_scale10x"
    val spark = GraftSession.local("graft-scale-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    build10x(spark, base, out)
    val results = picked.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, base).count() // JIT/codegen warm + first-touch artifacts
      val t1 = median3(fn(spark, base).count())
      fn(spark, out).count() // first-touch artifact build at 10×
      val t10 = median3(fn(spark, out).count())
      val ratio = if (t1 > 0) math.round(t10 / t1 * 10) / 10.0 else -1.0
      println(f"""{"family":"$name","sec_1x":$t1%.2f,"sec_10x":$t10%.2f,"ratio":$ratio}""")
      (name, t1, t10, ratio)
    }
    println("SCALE_PROBE_DONE " + results.map { case (n, _, _, r) =>
      s"$n=$r" }.mkString(" "))
    spark.stop()
  }
}
