package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** x234's correctness gate: approx_percentile's documented guarantee is a
  * RANK error — the returned value sits within accuracy⁻¹·n ranks of the
  * true quantile position — not a value error, so the gate computes each
  * approximate value's true rank and checks the distance. At accuracy
  * 10⁴ and fixture group sizes (≤ thousands of rows) the bound is a
  * handful of ranks.
  */
class ApproxQuantileSpec extends SparkSpec {

  test("every approximate quantile is within the documented rank error of exact") {
    val approx = SparkEntry.queries("x234_approx_quantiles")(spark, sf001)
      .collect()
    assert(approx.nonEmpty)
    val values = Tables(spark, sf001, "events")
      .select(col("event_type"), col("value"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    approx.foreach { r =>
      val tpe = r.getString(0)
      val xs = values(tpe)
      val n = xs.length
      val tol = math.max(1.0, n / 10000.0) + 1
      Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2),
        0.99 -> r.getDouble(3)).foreach { case (p, v) =>
        // rank of the returned value in the sorted group
        val rank = xs.count(_ <= v)
        val target = p * n
        assert(math.abs(rank - target) <= tol,
          s"$tpe p$p: value $v at rank $rank, target $target, tol $tol")
      }
    }
  }

  test("the sketch agrees with exact percentiles on small groups (sanity)") {
    val exact = SparkEntry.queries("c24_percentiles")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = SparkEntry.queries("x234_approx_quantiles")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, p50) =>
      assert(math.abs(approx(k) - p50) <= math.abs(p50) * 0.05 + 1.0,
        s"$k p50 drifted: exact $p50 vs approx ${approx(k)}")
    }
  }
}
