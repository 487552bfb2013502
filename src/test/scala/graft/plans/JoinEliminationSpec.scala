package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
import org.apache.spark.sql.functions._

/** Left-join elimination (JoinElimination): with the key declared unique
  * the join must VANISH from the optimized plan and change nothing in
  * the rows; without the declaration, with a non-unique key, or with a
  * right column consumed, the join must stay.
  */
class JoinEliminationSpec extends SparkSpec {

  private def customerP = s"$sf001/customer.parquet"
  private def ordersP = s"$sf001/orders.parquet"

  private def joins(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: LJoin => j }.length

  private def leftJoin(rightCols: Seq[String]) = {
    val dim = spark.read.parquet(customerP)
    spark.read.parquet(ordersP)
      .join(dim, col("o_custkey") === col("c_custkey"), "left_outer")
      .select((Seq("o_orderkey", "o_custkey") ++ rightCols).map(col): _*)
  }

  test("declared-unique key eliminates the join; rows are unchanged") {
    JoinElimination.install(spark)
    JoinElimination.clear()
    try {
      val before = leftJoin(Nil)
      assert(joins(before) == 1, "no declaration -> join stays")
      val expected = before.orderBy("o_orderkey").collect().map(_.toSeq).toSeq

      // the audit must pass on a real key and declare it
      assert(JoinElimination.verifyAndDeclareUnique(spark, customerP, "c_custkey"))
      val after = leftJoin(Nil)
      assert(joins(after) == 0, after.queryExecution.optimizedPlan.toString)
      assert(after.orderBy("o_orderkey").collect().map(_.toSeq).toSeq == expected,
        "elimination must be row-for-row invisible")

      // only-left residual filter above the join: still eliminable
      val filtered = spark.read.parquet(ordersP)
        .join(spark.read.parquet(customerP),
          col("o_custkey") === col("c_custkey"), "left_outer")
        .where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"))
      assert(joins(filtered) == 0,
        filtered.queryExecution.optimizedPlan.toString)

      // consuming a right column keeps the join
      val needsRight = leftJoin(Seq("c_mktsegment"))
      assert(joins(needsRight) == 1, "right column consumed -> join stays")

      // joining on a NON-declared (and non-unique) key keeps the join
      val nonUnique = spark.read.parquet(ordersP)
        .join(spark.read.parquet(customerP),
          col("o_custkey") === col("c_nationkey"), "left_outer")
        .select(col("o_orderkey"))
      assert(joins(nonUnique) == 1, "non-declared key -> join stays")
    } finally JoinElimination.clear()
  }

  test("the audit refuses to declare a duplicated column") {
    JoinElimination.clear()
    try {
      assert(!JoinElimination.verifyAndDeclareUnique(spark, customerP,
        "c_mktsegment"), "segments repeat; audit must fail")
      // and the failed audit must not have declared anything
      val df = leftJoinOn("c_mktsegment")
      assert(joins(df) == 1)
    } finally JoinElimination.clear()
  }

  private def leftJoinOn(key: String) =
    spark.read.parquet(ordersP)
      .join(spark.read.parquet(customerP),
        col("o_orderpriority") === col(key), "left_outer")
      .select(col("o_orderkey"))

  test("x190: the registry row's optimized plan is join-free") {
    val df = graft.SparkEntry.queries("x190_join_elimination")(spark, sf001)
    assert(joins(df) == 0, df.queryExecution.optimizedPlan.toString)
    assert(df.count() == spark.read.parquet(ordersP).count(),
      "left-join elimination preserves fact cardinality")
  }

  test("distinct over a declared-unique key collapses to a project") {
    DistinctElimination.install(spark)
    JoinElimination.clear()
    try {
      def aggs(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.length
      val sel = spark.read.parquet(customerP)
        .select(col("c_custkey"), col("c_mktsegment")).distinct()
      assert(aggs(sel) == 1, "no declaration -> distinct stays")
      val expected = sel.orderBy("c_custkey").collect().map(_.toSeq).toSeq

      assert(JoinElimination.verifyAndDeclareUnique(spark, customerP, "c_custkey"))
      val gone = spark.read.parquet(customerP)
        .select(col("c_custkey"), col("c_mktsegment")).distinct()
      assert(aggs(gone) == 0, gone.queryExecution.optimizedPlan.toString)
      assert(gone.orderBy("c_custkey").collect().map(_.toSeq).toSeq == expected)

      // distinct NOT covering the unique key keeps its aggregate
      val noKey = spark.read.parquet(customerP)
        .select(col("c_mktsegment")).distinct()
      assert(aggs(noKey) == 1, "no unique column in the set -> distinct stays")

      // a real aggregate is never touched
      val realAgg = spark.read.parquet(customerP)
        .groupBy(col("c_custkey")).agg(count(lit(1)))
      assert(aggs(realAgg) >= 1)
    } finally JoinElimination.clear()
  }
}
