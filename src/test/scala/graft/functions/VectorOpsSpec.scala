package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f)),
    (4L, Array(1.0f, 1.0f, 0.0f))).toDF("id", "v")

  test("cosine: identical direction = 1, orthogonal = 0") {
    val out = vecs.as("a").join(vecs.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        VectorOps.cosine(col("a.v"), col("b.v")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out((1L, 3L)) - 1.0) < 1e-12) // parallel
    assert(math.abs(out((1L, 2L))) < 1e-12)       // orthogonal
    assert(math.abs(out((1L, 4L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("sqDist matches hand computation") {
    val d = vecs.where(col("id") === 1).as("a")
      .join(vecs.where(col("id") === 4).as("b"))
      .select(VectorOps.sqDist(col("a.v"), col("b.v"))).head().getDouble(0)
    assert(math.abs(d - 1.0) < 1e-12)
  }

  test("hyperplaneBucket: deterministic, scale-invariant, table-independent") {
    val df = vecs.select(col("id"),
      VectorOps.hyperplaneBucket(col("v"), nPlanes = 6, seed = 0).as("b0"),
      VectorOps.hyperplaneBucket(expr("transform(v, x -> x * 5.0f)"), 6, 0).as("b0s"),
      VectorOps.hyperplaneBucket(col("v"), 6, 1).as("b1"))
    val rows = df.collect()
    // positive scaling never changes sign bits => same bucket
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
    // buckets bounded by nPlanes bits
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    // different seeds should not be universally identical across all vecs
    val same = rows.count(r => r.getLong(1) == r.getLong(3))
    assert(same < rows.length || rows.length == 1)
  }
}
