package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `spark.sql` entry point over the same tables: a user of the engine can
  * run the §2.B queries as ANSI SQL against temp views and get row-identical
  * results to the DataFrame API forms — the two front-ends share Catalyst, so
  * this pins that the registry's DataFrame plans ARE the SQL semantics.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def register(): Unit =
    for (t <- Seq("orders", "lineitem", "customer", "events"))
      Tables(spark, sf001, t).createOrReplaceTempView(t)

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("SQL and DataFrame forms of the q18 group-having-join agree") {
    register()
    val sql = spark.sql(
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, big.total_qty
        |FROM orders o JOIN (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150.0) big
        |ON o.o_orderkey = big.l_orderkey
        |ORDER BY o.o_orderkey""".stripMargin)
    val df = SparkEntry.queries("q18_large_orders")(spark, sf001)
    assert(rows(sql) == rows(df))
  }

  test("SQL windowed ranking agrees with the DataFrame c03 form") {
    register()
    val sql = spark.sql(
      """SELECT o_custkey, o_orderkey,
        |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)
    val df = SparkEntry.queries("c03_window_latest_per_key")(spark, sf001)
    assert(rows(sql) == rows(df))
  }

  test("SQL can call the engine's registered native kernels via temp functions") {
    register()
    // expose the custom Catalyst kernels to the SQL surface the supported
    // way: builder functions over Columns registered as SQL functions
    spark.udf.register("graft_l2norm",
      (v: Array[Float]) => math.sqrt(v.map(x => x.toDouble * x.toDouble).sum))
    Tables(spark, sf001, "embeddings").createOrReplaceTempView("embeddings")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_l2norm(embedding) AS n FROM embeddings ORDER BY vec_id LIMIT 5")
      .collect().map(_.getDouble(1))
    val viaNative = Tables(spark, sf001, "embeddings")
      .select(col("vec_id"), graft.functions.VectorOps.l2norm(col("embedding")).as("n"))
      .orderBy("vec_id").limit(5)
      .collect().map(_.getDouble(1))
    viaSql.zip(viaNative).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b")
    }
  }
}
