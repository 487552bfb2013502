package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The user-extension surface (§2.C "UDF/UDAF/UDTF"): Scala UDF registration,
  * a typed Aggregator UDAF, and SQL registration — available but deliberately
  * not used in the shipped operators (native expressions and built-ins are
  * the hot path; see graft.functions.HashExpressions for the preferred
  * pattern).
  */
class UdfSurfaceSpec extends SparkSpec {

  test("scalar UDF registers and evaluates (DataFrame + SQL)") {
    val stripD = udf((s: String) => s.stripSuffix(".d"))
    spark.udf.register("strip_d", stripD)
    import spark.implicits._
    val df = Seq("run1.d", "run2.d", "plain").toDF("name")
    assert(df.select(stripD(col("name"))).collect().map(_.getString(0)).toSeq
      == Seq("run1", "run2", "plain"))
    df.createOrReplaceTempView("___udf_probe")
    assert(spark.sql("SELECT strip_d(name) FROM ___udf_probe WHERE name = 'run1.d'")
      .head().getString(0) == "run1")
  }

  /** Typed UDAF: exact mean via (sum, count) buffer. */
  object MeanAgg extends Aggregator[Double, (Double, Long), Double] {
    def zero = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double) = (b._1 + a, b._2 + 1)
    def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
    def finish(b: (Double, Long)): Double = if (b._2 == 0) 0.0 else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  test("typed Aggregator UDAF matches built-in avg") {
    val meanUdaf = udaf(MeanAgg)
    val got = Tables(spark, sf001, "orders")
      .agg(meanUdaf(col("o_totalprice")).as("m"), avg(col("o_totalprice")).as("a"))
      .head()
    assert(math.abs(got.getDouble(0) - got.getDouble(1)) < 1e-6)
  }

  test("UDTF-style expansion via explode of a UDF-produced array") {
    val shingles = udf((s: String, n: Int) => s.split(" ").sliding(n).map(_.mkString(" ")).toSeq)
    import spark.implicits._
    val out = Seq("a b c d").toDF("text")
      .select(explode(shingles(col("text"), lit(2))).as("sh"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("a b", "b c", "c d"))
  }
}
