package graft

/** t1-style smoke: SparkEntry.entry must return >0 rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-smoke", 8)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(3, truncate = false)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
    require(n > 0, "entry() returned no rows")
  }
}
