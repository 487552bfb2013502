package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the text kernels, evaluated driver-side via Literal
  * inputs (no Spark jobs — hundreds of samples per property). Reference
  * semantics are recomputed in plain Scala, so the kernels are checked
  * against the DEFINITION, not against another Spark formulation.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private def litTokens(ts: Seq[String]): Literal =
    Literal.create(ts, ArrayType(StringType))

  // small vocab → plenty of repeats and shared windows; plus arbitrary
  // unicode tokens to exercise UTF8String equality/hashing
  private val token: Gen[String] = Gen.oneOf(
    Gen.oneOf("a", "b", "c", "aa", "é", "世界", ""),
    Gen.stringOfN(3, Gen.asciiPrintableChar))
  private val tokensGen: Gen[List[String]] = Gen.listOf(token)

  test("TopTokenCount == max multiplicity under plain Scala grouping") {
    holds(Prop.forAll(tokensGen) { ts =>
      val expected =
        if (ts.isEmpty) 0L
        else ts.groupBy(identity).values.map(_.size).max.toLong
      TopTokenCount(litTokens(ts)).eval() == expected
    })
  }

  test("ShingleHashes: window count and window-identity under plain Scala") {
    val ngramGen = Gen.choose(1, 8)
    holds(Prop.forAll(tokensGen, ngramGen) { (ts, n) =>
      val windows: Seq[Seq[String]] =
        if (ts.isEmpty) Nil
        else if (ts.length < n) Seq(ts)
        else ts.sliding(n).toSeq
      val hashes = ShingleHashes(litTokens(ts), n).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
      // one hash per window, and hash equality ⇔ window equality (64-bit
      // collisions are impossible at these sizes in practice — a failure
      // here means the construction broke, not bad luck)
      hashes.length == windows.length &&
        hashes.distinct.length == windows.distinct.length &&
        windows.zip(hashes).groupBy(_._1).values
          .forall(g => g.map(_._2).distinct.length == 1)
    })
  }

  test("ShingleHashes skips null tokens like the explode idiom") {
    val withNull = Literal.create(Seq("x", null, "y", "z"), ArrayType(StringType))
    val noNull = Literal.create(Seq("x", "y", "z"), ArrayType(StringType))
    for (n <- 1 to 4)
      assert(
        ShingleHashes(withNull, n).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq ==
        ShingleHashes(noNull, n).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq)
  }
}
