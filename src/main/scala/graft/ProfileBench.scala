package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling: per-query fixed overhead vs data cost. */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("profile", 32)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val q = SparkEntry.queries
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("b10_status_counts", "b10_status_counts", "c14_sorted_limit",
        "c14_sorted_limit", "b07_multijoin_revenue", "b07_multijoin_revenue",
        "c17_sessionization", "c08_except", "x07_ann_lsh_topk", "x06_cosine_topk")
    for (name <- names) q.get(name) match {
      case Some(fn) => time(name)(fn(spark, dir).count())
      case None => println(
        s"PROF unknown query '$name'; known:\n  ${q.keys.toSeq.sorted.mkString("\n  ")}")
    }
    spark.stop()
  }
}
