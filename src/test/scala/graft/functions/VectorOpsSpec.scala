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

  test("a null array ELEMENT propagates to a null result (HOF-formulation parity)") {
    val withNulls = Seq(
      (1L, Seq[Option[Float]](Some(1.0f), None, Some(2.0f))),
      (2L, Seq[Option[Float]](Some(1.0f), Some(0.0f), Some(2.0f))))
      .toDF("id", "v") // element type is nullable => containsNull = true
    val rows = withNulls
      .select(col("id"),
        VectorOps.cosine(col("v"), col("v")).as("c"),
        VectorOps.sqDist(col("v"), col("v")).as("d"),
        VectorOps.l2norm(col("v")).as("n"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2) && rows(0).isNullAt(3),
      s"null element must yield null, got ${rows(0)}")
    assert(!rows(1).isNullAt(1) && !rows(1).isNullAt(2) && !rows(1).isNullAt(3))
  }

  test("jaccardLongs of two empty sets is null even with non-nullable inputs") {
    // nullable=true must be declared (0/0 case): with the default
    // child-derived nullability the generated projection would skip the
    // null check and NPE / fabricate 0.0
    val row = Seq(("", "")).toDF("a", "b")
      .select(HashFunctions.jaccardLongs(
        HashFunctions.tokenHashSet(expr("cast(array() as array<string>)")),
        HashFunctions.tokenHashSet(expr("cast(array() as array<string>)"))).as("j"))
      .head()
    assert(row.isNullAt(0), s"0/0 Jaccard must be null, got $row")
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
