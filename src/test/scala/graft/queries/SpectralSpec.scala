package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Semantic gate for x148: the ±1 random projection actually has the
  * Johnson-Lindenstrauss property on the fixture — norms and pairwise
  * distances survive the 64→8 compression in expectation (E‖y‖² = r·‖x‖²
  * for ±1 sign matrices, Achlioptas 2003). Exact-value parity is the
  * DuckDB oracle's job; this spec checks the MEANING.
  */
class SpectralSpec extends SparkSpec {

  private val R = 8

  private lazy val proj = SparkEntry.queries("x148_random_projection")(spark, sf001)
    .localCheckpoint(true)

  private lazy val withNorm = {
    val mi = expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")
    Tables(spark, sf001, "embeddings")
      .select(col("vec_id"),
        expr("aggregate(transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint)), " +
          "0L, (acc, v) -> acc + v * v)").as("norm2"))
      .join(proj, "vec_id")
      .withColumn("pnorm2",
        (0 until R).map(j => col(s"y$j") * col(s"y$j")).reduce(_ + _))
  }

  test("norm preservation: mean ‖y‖²/(r·‖x‖²) ≈ 1") {
    val ratio = withNorm
      .select(avg(col("pnorm2").cast("double") /
        (lit(R) * col("norm2").cast("double"))).as("r"))
      .head().getDouble(0)
    assert(ratio > 0.7 && ratio < 1.3, s"mean norm ratio $ratio")
  }

  test("pairwise distance preservation on a fixed pair sample") {
    val a = withNorm.where(col("vec_id") < 20)
      .select(col("vec_id").as("ida") +:
        (0 until R).map(j => col(s"y$j").as(s"a$j")): _*)
    val b = withNorm.where(col("vec_id") >= 20 && col("vec_id") < 40)
      .select(col("vec_id").as("idb") +:
        (0 until R).map(j => col(s"y$j").as(s"b$j")): _*)
    // original squared distance needs the raw vectors again
    val mi = expr(
      "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))")
    val raw = Tables(spark, sf001, "embeddings").select(col("vec_id"), mi.as("mi"))
    val pairs = a.crossJoin(b)
      .join(raw.select(col("vec_id").as("ida"), col("mi").as("ma")), "ida")
      .join(raw.select(col("vec_id").as("idb"), col("mi").as("mb")), "idb")
      .withColumn("d2", expr(
        "aggregate(zip_with(ma, mb, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"))
      .withColumn("p2",
        (0 until R).map(j => (col(s"a$j") - col(s"b$j")) * (col(s"a$j") - col(s"b$j")))
          .reduce(_ + _))
      .select(col("d2").cast("double"), col("p2").cast("double"))
      .collect()
    assert(pairs.length == 400)
    val ratios = pairs.map(r => r.getDouble(1) / (R * r.getDouble(0)))
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"mean pair-distance ratio $mean")
    // individual pairs stay within a loose JL band — no collapse, no blowup
    val inBand = ratios.count(r => r > 0.2 && r < 3.0)
    assert(inBand >= (ratios.length * 0.95).toInt,
      s"only $inBand/${ratios.length} pairs inside the distortion band")
  }
}
