package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Gates for the PCA operator (x147's engine): eigensolver invariants,
  * model-vs-distributed-projection agreement, and the optimality property
  * that makes PCA PCA.
  */
class PcaSpec extends SparkSpec {

  private lazy val e = Tables(spark, sf001, "embeddings")
  private lazy val model = Pca.fit(e, "embedding", 8)
  private lazy val d = model.dim

  test("jacobi solves a known 3x3 exactly") {
    // eigenvalues of [[2,1,0],[1,2,1],[0,1,2]] are 2, 2±√2
    val m = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 1.0),
      Array(0.0, 1.0, 2.0))
    val (eig, v) = Pca.jacobiEigSym(m)
    val got = eig.sorted
    val want = Array(2.0 - math.sqrt(2), 2.0, 2.0 + math.sqrt(2))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
    // residual ‖MV − VΛ‖∞
    for (c <- 0 until 3; r <- 0 until 3) {
      val mv = (0 until 3).map(k => m(r)(k) * v(k)(c)).sum
      assert(math.abs(mv - eig(c) * v(r)(c)) < 1e-12)
    }
  }

  test("components are orthonormal and eigenvalues descend") {
    for (i <- 0 until model.r; j <- i until model.r) {
      val dot = (0 until d).map(k => model.components(i)(k) * model.components(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"V${i}.V$j = $dot")
    }
    model.eigenvalues.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12)
    }
    assert(model.eigenvalues.head > 0)
    assert(model.trace >= model.eigenvalues.sum - 1e-9)
  }

  test("projected variance equals the eigenvalue, per axis") {
    val pv = e.select(posexplode(Pca.projectCol(col("embedding"), model))
        .as(Seq("pos", "c")))
      .groupBy("pos")
      .agg((avg(col("c") * col("c")) - avg(col("c")) * avg(col("c"))).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (i <- 0 until model.r) {
      val lam = model.eigenvalues(i)
      assert(math.abs(pv(i) - lam) <= 1e-6 * math.max(lam, 1e-9),
        s"axis $i: projected var ${pv(i)} vs eigenvalue $lam")
    }
    // and the projection is centered: mean ≈ 0 on every axis
    val means = e.select(posexplode(Pca.projectCol(col("embedding"), model))
        .as(Seq("pos", "c")))
      .groupBy("pos").agg(avg(col("c")).as("m")).collect()
    means.foreach(r => assert(math.abs(r.getDouble(1)) < 1e-9))
  }

  test("top-r axes reconstruct strictly better than any fewer, and capture " +
      "their eigenvalue share of total variance") {
    val errs = Seq(2, 4, 8).map(r =>
      r -> Pca.meanReconstructionError(e, "embedding", Pca.fit(e, "embedding", r)))
    errs.sliding(2).foreach { case Seq((_, e1), (_, e2)) =>
      assert(e2 < e1, s"more axes must not reconstruct worse: $errs")
    }
    // err(r) = trace − Σ_{i<r} λ_i (the Eckart-Young identity) — ties the
    // distributed error computation to the driver spectrum
    val m8 = model
    val want = m8.trace - m8.eigenvalues.sum
    val got = errs.last._2
    assert(math.abs(got - want) <= 1e-6 * math.max(want, 1e-9),
      s"err $got vs trace-residual $want")
  }

  test("refit under the same layout is bit-identical (registry determinism)") {
    val m2 = Pca.fit(e, "embedding", 8)
    assert(m2.mean.sameElements(model.mean))
    assert(m2.eigenvalues.sameElements(model.eigenvalues))
    assert(m2.components.zip(model.components).forall {
      case (a, b) => a.sameElements(b)
    })
  }
}
