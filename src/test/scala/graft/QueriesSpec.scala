package graft

import org.apache.spark.sql.functions._

/** Registry-wide invariants at sf0.001: every query runs, returns rows, and
  * declared oracle column names match the Spark result columns (the driver's
  * hash-compare sorts columns by name, so a mismatch silently fails there).
  */
class QueriesSpec extends SparkSpec {

  test("registry names are unique and non-empty") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.nonEmpty && names.distinct.size == names.size)
  }

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs and returns rows on sf0.001") {
      val df = q.fn(spark, sf001)
      assert(df.columns.nonEmpty)
      // c02 (anti join) may legitimately be empty at tiny SF; all others
      // must produce rows for the driver's rows-only check.
      if (q.name != "c02_anti_join_dedup") assert(df.count() > 0, s"${q.name} empty")
      // int64 OUTPUT LINT (round 12, the x302 failure class): the driver's
      // hash canonicalization is lossy above signed int64, so no ORACLED
      // row may emit a numeric column whose values can exceed it. Decimal
      // columns with more than 18 integer digits of headroom are the only
      // way past int64 in this registry (sums/products are decimal-typed);
      // for each, assert the actual values fit. A row that genuinely needs
      // 2^64-scale values must re-key them (fixed-width hex, two BIGINT
      // halves) the way x302 does.
      if (q.oracle.isDefined) {
        import org.apache.spark.sql.types.DecimalType
        val wide = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] &&
            f.dataType.asInstanceOf[DecimalType].precision -
              f.dataType.asInstanceOf[DecimalType].scale > 18 => f.name
        }
        if (wide.nonEmpty) {
          val maxes = df.select(wide.map(c => max(abs(col(c))).as(c)): _*).head()
          wide.zipWithIndex.foreach { case (c, i) =>
            val v = maxes.getDecimal(i)
            assert(v == null ||
              v.abs.compareTo(new java.math.BigDecimal(Long.MaxValue)) <= 0,
              s"${q.name}.$c emits ${v} — beyond signed int64, the driver's " +
                "oracle hash cannot represent it; re-key the column (see x302)")
          }
        }
      }
    }
  }

  test("x01 exact dedup: keeper is min doc_id and copy counts sum to corpus") {
    val df = SparkEntry.queries("x01_dedup_exact")(spark, sf001)
    val total = df.agg(sum("n_copies")).head().getLong(0)
    val corpus = Tables(spark, sf001, "documents").count()
    assert(total == corpus)
  }

  test("x06 cosine top-k: similarities sorted desc within [-1, 1]") {
    val sims = SparkEntry.queries("x06_cosine_topk")(spark, sf001)
      .select("sim").collect().map(_.getDouble(0))
    assert(sims.length == 20)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sameElements(sims.sortBy(-_)))
  }

  test("x164 acf: Cauchy-Schwarz holds exactly and acf stays in [-1, 1]") {
    val rows = SparkEntry.queries("x164_autocorrelation")(spark, sf001)
      .select("lag", "num", "den_x", "den_y", "acf").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val (num, dx, dy) = (BigInt(r.getLong(1)), BigInt(r.getLong(2)), BigInt(r.getLong(3)))
      // the exact integer components must satisfy num² ≤ den_x·den_y —
      // any accumulation error in the rollup would break the identity
      assert(num * num <= dx * dy, s"Cauchy-Schwarz violated at lag ${r.getLong(0)}")
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-12)
    }
  }

  test("x165 changepoint: exactly one argmax flag and a zero-sum final deviation") {
    val rows = SparkEntry.queries("x165_changepoint")(spark, sf001)
      .select("d_stat", "is_changepoint").collect()
    assert(rows.count(_.getBoolean(1)) == 1)
    // D_N = N·S − N·S = 0 by construction: the centered cumsum closes
    assert(rows.last.getLong(0) == 0L)
    val flaggedAbs = rows.filter(_.getBoolean(1)).map(r => math.abs(r.getLong(0))).head
    assert(rows.forall(r => math.abs(r.getLong(0)) <= flaggedAbs))
  }

  test("x170 knn eval: every holdout vector predicted exactly once") {
    val rows = SparkEntry.queries("x170_knn_label_eval")(spark, sf001).collect()
    val total = rows.map(_.getLong(2)).sum
    val corpus = graft.Tables(spark, sf001, "embeddings").count()
    assert(total == math.min(500L, corpus),
      s"matrix mass $total must equal the holdout size")
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("x171 audience overlap matches driver-side set intersection") {
    val rows = SparkEntry.queries("x171_audience_overlap")(spark, sf001).collect()
    val membership = graft.Tables(spark, sf001, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = membership.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    assert(rows.length == types.combinations(2).size)
    rows.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val inter = (byType(ta) & byType(tb)).size.toLong
      assert(r.getLong(2) == byType(ta).size.toLong)
      assert(r.getLong(3) == byType(tb).size.toLong)
      assert(r.getLong(4) == inter, s"intersection($ta,$tb)")
      assert(r.getLong(5) ==
        1000L * inter / (byType(ta).size + byType(tb).size - inter))
    }
  }

  test("x172 sketch overlap: inclusion-exclusion estimate lands near the exact truth") {
    val rows = SparkEntry.queries("x172_sketch_overlap")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (estU, estI, exact, err) =
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert(err == estI - exact)
      // m=256 HLL has ~6.5% σ per estimate; inclusion-exclusion stacks
      // three of them — allow 4 stacked σ plus small-count slack
      assert(math.abs(err) <= (estU * 26) / 100 + 10,
        s"est_inter $estI too far from exact $exact (union $estU)")
    }
  }

  test("x166 holt: recurrence replays exactly against a driver-side fold") {
    val rows = SparkEntry.queries("x166_holt_smoothing")(spark, sf001)
      .orderBy("day").select("n", "level_micros", "trend_micros", "forecast_micros")
      .collect()
    var l = 0L; var b = 0L; var first = true
    rows.foreach { r =>
      val n = r.getLong(0)
      if (first) { l = n * 1000000L; b = 0L; first = false }
      else {
        val lPrev = l
        l = (n * 1000000L + 3L * (lPrev + b)) / 4L
        b = ((l - lPrev) + 3L * b) / 4L
      }
      assert(r.getLong(1) == l && r.getLong(2) == b && r.getLong(3) == l + b)
    }
  }
}
