package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hashed logistic-regression quality classifier on planted separable
  * corpora: training must converge (monotone-ish loss, gated loosely as
  * halved), the held-out split must separate cleanly, and the scoring
  * kernel must agree with driver-side arithmetic.
  */
class QualityClassifierSpec extends SparkSpec {

  private val dim = 64

  // 40 docs: the positive class carries two marker tokens the negative
  // class never contains; shared filler tokens appear in both so the
  // model has to find the markers, not memorize doc identity
  private def corpus = {
    import spark.implicits._
    (0 until 40).map { i =>
      val filler = s"alpha beta gamma delta tok${i % 7} tok${i % 11}"
      if (i % 2 == 0) (i.toLong, s"$filler junkmark spammark junkmark", 1)
      else (i.toLong, s"$filler cleanextra", 0)
    }.toDF("doc_id", "text", "label")
  }

  test("training separates a planted quality signal on a held-out split") {
    val feats = QualityClassifier.featurize(corpus, dim).cache()
    val train = feats.where(col("doc_id") < 30)
    val hold = feats.where(col("doc_id") >= 30)
    val model = QualityClassifier.train(train, dim, iters = 30, lr = 1.0)

    assert(model.losses.length == 30)
    assert(model.losses.last < model.losses.head * 0.5,
      s"loss must at least halve over training: ${model.losses.head} -> ${model.losses.last}")

    val scored = QualityClassifier.score(hold, model).collect()
    assert(scored.length == 10)
    val correct = scored.count(r => r.getInt(3) == r.getInt(1))
    assert(correct == 10,
      s"cleanly separable holdout must classify perfectly, got $correct/10")
    // scores must actually separate, not hover at the boundary
    val posMin = scored.filter(_.getInt(1) == 1).map(_.getDouble(2)).min
    val negMax = scored.filter(_.getInt(1) == 0).map(_.getDouble(2)).max
    assert(posMin > 0.6 && negMax < 0.4,
      s"score margins must be wide: posMin=$posMin negMax=$negMax")
    feats.unpersist()
  }

  test("featurize: tf normalization and sorted sparse layout") {
    import spark.implicits._
    val d = Seq((0L, "a a b", 1)).toDF("doc_id", "text", "label")
    val r = QualityClassifier.featurize(d, dim, binary = false).collect()(0)
    val idx = r.getSeq[Int](2)
    val vals = r.getSeq[Double](3)
    assert(idx == idx.sorted, "indices must be sorted")
    assert(idx.length == 2, "two distinct tokens -> two buckets")
    assert(math.abs(vals.sum - 1.0) < 1e-12, "tf values sum to 1")
    assert(vals.contains(2.0 / 3) && vals.contains(1.0 / 3))
  }

  test("SparseDotLit kernel agrees with driver arithmetic and nulls bad rows") {
    import spark.implicits._
    val w = Seq(0.5, -1.0, 2.0)
    val d = Seq(
      (Seq(0, 2), Seq(2.0, 3.0)),   // 0.5*2 + 2*3 = 7
      (Seq(1), Seq(4.0)),           // -4
      (Seq(5), Seq(1.0)),           // out-of-range index -> null
      (Seq(0, 1), Seq(1.0)))        // length mismatch -> null
      .toDF("idx", "vals")
    val r = d.select(
      graft.functions.VectorOps.sparseDotLit(col("idx"), col("vals"), w))
      .collect().map(x => if (x.isNullAt(0)) None else Some(x.getDouble(0)))
    assert(r.toSeq == Seq(Some(7.0), Some(-4.0), None, None))
  }
}
