package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Statistical identities behind the x219/x220/x222/x226 metric operators —
  * each oracle pins cross-engine equality; these pin that the IMPLEMENTED
  * formula is the statistic it claims to be (rank identity vs pairwise
  * definition, bound checks, the packing guarantee).
  */
class AnalyticsMetricsSpec extends SparkSpec {

  test("x219 rank-form AUC equals the pairwise (Mann-Whitney) definition") {
    // AUC = P(score_pos > score_neg) + 0.5 P(tie), computed literally over
    // the pos x neg pair grid at sf0.001 — the definition the domain-window
    // rank identity must reproduce exactly
    val sc = Tables(spark, sf001, "documents").select(
      (col("lang") === "en").as("pos"),
      expr("(1000 * size(array_distinct(split(text, ' ')))) " +
        "div size(split(text, ' '))").as("score"))
    val p = sc.where(col("pos")).select(col("score").as("sp"))
    val n = sc.where(!col("pos")).select(col("score").as("sn"))
    val pair = p.crossJoin(n)
      .agg((sum(when(col("sp") > col("sn"), 2L)
        .when(col("sp") === col("sn"), 1L).otherwise(0L))).as("w2"),
        count(lit(1)).as("np"))
      .select(expr("(1000000 * w2) div (2 * np)").as("auc_micro"))
      .head().getLong(0)
    val fast = SparkEntry.queries("x219_auc_rank")(spark, sf001)
      .select("auc_micro").head().getLong(0)
    assert(fast === pair, s"rank identity $fast != pairwise $pair")
  }

  test("x220 gini is in [0, 1e6) and sums cover all ordered customers") {
    val g = SparkEntry.queries("x220_gini_concentration")(spark, sf001)
      .collect()
    assert(g.length === 5)
    g.foreach { r =>
      val gini = r.getAs[Long]("gini_micro")
      assert(gini >= 0L && gini < 1000000L, s"gini out of range: $r")
    }
    val custWithOrders = Tables(spark, sf001, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(g.map(_.getAs[Long]("n")).sum === custWithOrders)
  }

  test("x222 kappa is within [-1e6, 1e6] and the confusion matrix covers the corpus") {
    val r = SparkEntry.queries("x222_cohens_kappa")(spark, sf001).head()
    val total = r.getAs[Long]("a") + r.getAs[Long]("b") +
      r.getAs[Long]("c") + r.getAs[Long]("d")
    assert(total === Tables(spark, sf001, "documents").count())
    val k = r.getAs[Long]("kappa_micro")
    assert(k >= -1000000L && k <= 1000000L, s"kappa out of range: $k")
  }

  test("x232 k-center: radii are non-increasing and the picks cover at the last radius") {
    val picks = SparkEntry.queries("x232_kcenter_coreset")(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(picks.map(_._1).toSeq == (0 until 8))
    val radii = picks.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"farthest-first radii must be non-increasing: ${radii.toSeq}")
    // covering: every vector is within the NEXT radius (<= the last pick's
    // distance) of some center — the Gonzalez guarantee the coreset is for
    val e = Tables(spark, sf001, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000, 0) as bigint))")
        .as("v"))
    val centers = e.where(col("vec_id").isin(picks.map(_._2): _*))
      .collect().map(_.getSeq[Long](1))
    val maxMin = e.collect().map { r =>
      val v = r.getSeq[Long](1)
      centers.map(c => v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.max
    assert(maxMin <= radii.last,
      s"a point sits farther ($maxMin) than the last selection radius (${radii.last})")
  }

  test("x226 boustrophedon packing: covers the corpus, imbalance <= max doc size") {
    // serpentine dealing of descending sizes bounds the token-mass spread
    // across shards by the largest single document — the greedy guarantee
    // the operator exists for (plain round-robin does not have it)
    val shards = SparkEntry.queries("x226_shard_packing")(spark, sf001)
      .collect()
    assert(shards.map(_.getAs[Long]("shard")).sorted.toSeq === (0L to 7L))
    val d = Tables(spark, sf001, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
    val (totalTok, maxTok) =
      (d.agg(sum("n_tok")).head().getLong(0), d.agg(max("n_tok")).head().getLong(0))
    assert(shards.map(_.getAs[Long]("tok_total")).sum === totalTok)
    val loads = shards.map(_.getAs[Long]("tok_total"))
    assert(loads.max - loads.min <= maxTok,
      s"spread ${loads.max - loads.min} exceeds max doc $maxTok")
  }
}
