package graft
object Hot {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("hot", 16)
    val q = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "x03_dedup_minhash_lsh", "x04_dedup_simhash", "x06_cosine_topk",
      "x07_ann_lsh_topk", "c16_composite_key_join", "c08_except", "c17_sessionization")
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = q(n)(spark, dir).count()
      println(f"HOT $n%-26s rep$rep ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$c")
    }
    spark.stop()
  }
}
