package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Sixth-arc evaluation/serving operators: the quality-signal eval
  * extensions (PR/AP/calibration), multi-rater agreement, the Markov
  * temporal backtest, time-decay attribution, two-factor OLS, RRF fusion,
  * item-item recommendations, the lakehouse layout advisors, the
  * l-diversity census and the hubness audit. Each test replays the
  * operator's defining identity driver-side (BigInt where the engine math
  * is integer-exact) or pins the structural invariant the operator's
  * semantics guarantee.
  */
class EvalHarnessSpec extends SparkSpec {

  test("x264 PR curve: precision/recall identities hold at every threshold") {
    val rows = SparkEntry.queries("x264_pr_curve")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tp, fp) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"))
      assert(r.getAs[Long]("precision_milli") == 1000 * tp / (tp + fp))
      assert(r.getAs[Long]("recall_milli") >= 0L)
      assert(r.getAs[Long]("recall_milli") <= 1000L)
    }
    // descending thresholds accumulate: tp and fp are monotone non-decreasing
    val tps = rows.map(_.getAs[Long]("tp"))
    assert(tps.sameElements(tps.sorted))
    // the final row predicts everything positive: recall = 1
    assert(rows.last.getAs[Long]("recall_milli") == 1000L)
  }

  test("x265 average precision equals a driver-side replay of x264's curve") {
    val curve = SparkEntry.queries("x264_pr_curve")(spark, sf001)
      .collect().map(r => (r.getAs[Long]("tp"), r.getAs[Long]("fp")))
    val p = curve.last._1 // full-recall tp = total positives
    var (prev, mass) = (0L, BigInt(0))
    curve.foreach { case (tp, fp) =>
      mass += BigInt(tp - prev) * (BigInt(1000000) * tp / (tp + fp))
      prev = tp
    }
    val r = SparkEntry.queries("x265_average_precision")(spark, sf001).head()
    assert(r.getAs[Long]("n_pos") == p)
    assert(r.getAs[Long]("ap_micro") == (mass / p).toLong)
    assert(r.getAs[Long]("ap_micro") >= 0L && r.getAs[Long]("ap_micro") <= 1000000L)
  }

  test("x266 calibration: bin mass totals the corpus and ECE is the weighted gap") {
    val rows = SparkEntry.queries("x266_calibration_ece")(spark, sf001).collect()
    val corpus = Tables(spark, sf001, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == corpus)
    rows.foreach { r =>
      assert(r.getAs[Long]("gap_milli")
        == r.getAs[Long]("mean_pred_milli") - r.getAs[Long]("emp_milli"))
    }
    val ece = rows.map(r => BigInt(r.getAs[Long]("n"))
      * r.getAs[Long]("gap_milli").abs).sum / corpus
    assert(rows.forall(_.getAs[Long]("ece_milli") == ece.toLong))
  }

  test("x267 Fleiss' kappa equals the driver-side cleared-denominator form") {
    val r = SparkEntry.queries("x267_fleiss_kappa")(spark, sf001).head()
    val (n, t, s) = (BigInt(r.getAs[Long]("n_docs")),
      BigInt(r.getAs[Long]("t")), BigInt(r.getAs[Long]("s")))
    val pe2 = t * t + (3 * n - t) * (3 * n - t)
    val kappa = BigInt(1000000) * (3 * n * s - 2 * pe2) / (18 * n * n - 2 * pe2)
    assert(r.getAs[Long]("kappa_micro") == kappa.toLong)
    assert(kappa >= -1000000 && kappa <= 1000000)
    // S counts pair agreements: bounded by the 6N of unanimous panels
    assert(s >= 2 * n && s <= 6 * n)
  }

  test("x268 backtest: accuracies in range and test mass covers every source") {
    val rows = SparkEntry.queries("x268_markov_backtest")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_test"))
      val acc = r.getAs[Long]("acc_milli")
      assert(acc >= 0L && acc <= 1000L)
      assert(acc == 1000 * r.getAs[Long]("n_correct") / r.getAs[Long]("n_test"))
    }
    // the argmax model cannot beat oracle accuracy 1.0 but must beat 0 on
    // the fixture (five balanced types: some predictions land)
    assert(rows.map(_.getAs[Long]("n_correct")).sum > 0L)
  }

  test("x269 attribution: per-conversion credit is conserved up to truncation") {
    val rows = SparkEntry.queries("x269_timedecay_attribution")(spark, sf001)
      .collect()
    val totalCredit = rows.map(_.getAs[Long]("credit_micro")).sum
    val nTouches = rows.map(_.getAs[Long]("n_touches")).sum
    // count conversions that HAVE at least one touch in the window —
    // those are the normalizer groups credit was split over
    val e = Tables(spark, sf001, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val conv = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("cus"))
    val nConv = e.join(conv, Seq("user_id"))
      .where(col("us") < col("cus")
        && col("us") >= col("cus") - lit(7L * 86400000000L))
      .select(col("user_id"), col("cus")).distinct().count()
    // each conversion distributes 10^6 micros minus at most 1 micro per
    // touch of integer-division truncation
    assert(totalCredit <= 1000000L * nConv)
    assert(totalCredit > 1000000L * nConv - nTouches)
  }

  test("x270 OLS coefficients match an exact BigInt Cramer solve of the normal equations") {
    val daily = Tables(spark, sf001, "events")
      .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val minDay = daily.map(_._1).min
    val pts = daily.map { case (d, y) =>
      val t = BigInt(java.time.temporal.ChronoUnit.DAYS.between(minDay, d))
      val dow = d.getDayOfWeek
      val w = if (dow == java.time.DayOfWeek.SATURDAY
        || dow == java.time.DayOfWeek.SUNDAY) BigInt(1) else BigInt(0)
      (t, w, BigInt(y))
    }
    val n = BigInt(pts.length)
    val st = pts.map(_._1).sum; val sw = pts.map(_._2).sum
    val stt = pts.map(p => p._1 * p._1).sum
    val stw = pts.map(p => p._1 * p._2).sum
    val sww = pts.map(p => p._2 * p._2).sum
    val sy = pts.map(_._3).sum
    val sty = pts.map(p => p._1 * p._3).sum
    val swy = pts.map(p => p._2 * p._3).sum
    val det = n * (stt * sww - stw * stw) - st * (st * sww - stw * sw) +
      sw * (st * stw - stt * sw)
    val detA = sy * (stt * sww - stw * stw) - st * (sty * sww - stw * swy) +
      sw * (sty * stw - stt * swy)
    val detB = n * (sty * sww - stw * swy) - sy * (st * sww - stw * sw) +
      sw * (st * swy - sty * sw)
    val detC = n * (stt * swy - sty * stw) - st * (st * swy - sty * sw) +
      sy * (st * stw - stt * sw)
    val r = SparkEntry.queries("x270_two_factor_ols")(spark, sf001).head()
    assert(r.getAs[Long]("n_days") == pts.length.toLong)
    assert(r.getAs[Long]("intercept_milli") == (1000 * detA / det).toLong)
    assert(r.getAs[Long]("slope_milli") == (1000 * detB / det).toLong)
    assert(r.getAs[Long]("weekend_milli") == (1000 * detC / det).toLong)
  }

  test("x271 RRF: fused score is exactly the sum of the two rank contributions") {
    val rows = SparkEntry.queries("x271_rrf_hybrid")(spark, sf001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (lr, sr) = (r.getAs[Long]("lex_rank"), r.getAs[Long]("sem_rank"))
      val want = (if (lr > 0) 1000000 / (60 + lr) else 0L) +
        (if (sr > 0) 1000000 / (60 + sr) else 0L)
      assert(r.getAs[Long]("rrf_micro") == want)
      assert(lr >= 0L && lr <= 20L && sr >= 0L && sr <= 20L)
      assert(lr > 0 || sr > 0)
    }
    // fused order is descending in the quantized score
    val scores = rows.map(_.getAs[Long]("rrf_micro"))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("x272 recs: top-3 per item, similarity bounded, neighbors never self") {
    val rows = SparkEntry.queries("x272_item_item_recs")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("item")).foreach { case (item, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq
        == (1L to rs.length.toLong))
      rs.foreach { r =>
        assert(r.getAs[Long]("nb") != item)
        val sim = r.getAs[Long]("sim_micro")
        // w <= min(supp_i, supp_j) => squared cosine <= 1
        assert(sim >= 0L && sim <= 1000000L)
      }
      // ranked descending by the quantized metric
      val sims = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("sim_micro"))
      assert(sims.sameElements(sims.sortBy(-(_: Long))))
    }
  }

  test("x273 advisor: span accounting is exact for a provably-sorted key") {
    val rows = SparkEntry.queries("x273_sort_key_advisor")(spark, sf001).collect()
    assert(rows.length == 4)
    // every value spans at least one file; the metric floor is 1000 milli
    rows.foreach { r =>
      assert(r.getAs[Long]("files_sum") >= r.getAs[Long]("ndv"))
      assert(r.getAs[Long]("avg_files_milli") >= 1000L)
    }
    // output is sorted by the metric: the head row IS the recommendation
    val metric = rows.map(_.getAs[Long]("avg_files_milli"))
    assert(metric.sameElements(metric.sorted))
    // high-cardinality near-unique keys cluster best: l_partkey must beat
    // the 3-value l_returnflag whose every value spans ~all 32 files
    val byName = rows.map(r => r.getAs[String]("candidate")
      -> r.getAs[Long]("avg_files_milli")).toMap
    assert(byName("l_partkey") < byName("l_returnflag"))
  }

  test("x274 advisor: byte accounting replays driver-side for event_type") {
    val vals = Tables(spark, sf001, "events")
      .select(col("event_type")).collect().map(_.getString(0))
    val plain = vals.map(_.length.toLong).sum
    val distinct = vals.distinct
    val dict = distinct.map(_.length.toLong).sum +
      vals.length.toLong * (if (distinct.length <= 256) 1 else 2)
    val r = SparkEntry.queries("x274_encoding_advisor")(spark, sf001)
      .collect().find(_.getAs[String]("column_name") == "event_type").get
    assert(r.getAs[Long]("n") == vals.length.toLong)
    assert(r.getAs[Long]("ndv") == distinct.length.toLong)
    assert(r.getAs[Long]("plain_bytes") == plain)
    assert(r.getAs[Long]("dict_bytes") == dict)
    // five short repeated strings: dictionary must win
    assert(r.getAs[String]("encoding") == "dict")
  }

  test("x275 l-diversity: band mass totals the corpus and min_l is global") {
    val rows = SparkEntry.queries("x275_l_diversity")(spark, sf001).collect()
    val corpus = Tables(spark, sf001, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
    val minL = rows.map(_.getAs[Long]("min_l")).distinct
    assert(minL.length == 1 && minL.head >= 1L)
  }

  test("x276 hubness: k-occurrence mass is exactly queries x k and covers the corpus") {
    val rows = SparkEntry.queries("x276_hubness_audit")(spark, sf001).collect()
    val corpus = Tables(spark, sf001, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == corpus)
    val mass = rows.map(r => r.getAs[Long]("in_deg") * r.getAs[Long]("n_vectors")).sum
    assert(mass == math.min(500L, corpus) * 10L)
  }
}
