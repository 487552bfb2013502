package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the distributed CC operator: exact agreement with an in-test
  * union-find on a seeded random graph, logarithmic round count on a long
  * path (the pointer-jump guarantee), and degenerate inputs.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference union-find (path compression, no ranks — fine at test size). */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root = min of component because unions always point larger -> smaller
    (0 until n).map(v => v.toLong -> find(v).toLong).toMap
  }

  test("random graph matches union-find exactly") {
    val rnd = new scala.util.Random(42)
    val n = 400
    val edges = Seq.fill(500)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val expected = unionFind(n, edges)
    val (labels, _) = ConnectedComponents.run(edges.toDF("src", "dst"))
    val got = labels.as[(Long, Long)].collect().toMap
    // operator only labels vertices that appear in a (non-loop) edge
    got.foreach { case (id, comp) => assert(comp == expected(id), s"vertex $id") }
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(v => edges.exists(e => (e._1 == v || e._2 == v) && e._1 != e._2))
    assert(got.keySet == touched.toSet)
  }

  test("127-hop path converges in logarithmic rounds") {
    val path = (0L until 127L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = ConnectedComponents.run(path)
    assert(labels.agg(max(col("comp"))).head().getLong(0) == 0L)
    assert(labels.count() == 128)
    assert(rounds <= 10, s"pointer jumping should close a 127-hop path in ~7 rounds, took $rounds")
  }

  test("10k-vertex random graph: exact agreement, bounded rounds") {
    // sparse regime (m ~ 1.2n): many components, some large — the shape an
    // LSH candidate graph actually has. Pins that convergence stays
    // logarithmic as the graph grows, not just on toy sizes.
    val rnd = new scala.util.Random(7)
    val n = 10000
    val edges = Seq.fill(12000)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val expected = unionFind(n, edges)
    val (labels, rounds) = ConnectedComponents.run(edges.toDF("src", "dst"))
    val got = labels.as[(Long, Long)].collect().toMap
    got.foreach { case (id, comp) => assert(comp == expected(id), s"vertex $id") }
    // observed 12 ≈ log2(10000): convergence tracks O(log n), same as the
    // path test (7 ≈ log2(128)); 16 = ceil(log2 n) + slack
    assert(rounds <= 16, s"O(log n) convergence expected at 10k vertices, took $rounds")
  }

  test("two components stay separate") {
    val e = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("a", "b")
    val (labels, _) = ConnectedComponents.run(e)
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L))
  }

  test("self-loops and duplicate edges are ignored; empty input yields empty labels") {
    val e = Seq((5L, 5L), (3L, 4L), (4L, 3L), (3L, 4L)).toDF("a", "b")
    val (labels, _) = ConnectedComponents.run(e)
    assert(labels.as[(Long, Long)].collect().toMap == Map(3L -> 3L, 4L -> 3L))
    val (empty, rounds0) = ConnectedComponents.run(Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(empty.isEmpty && rounds0 == 0)
  }
}
