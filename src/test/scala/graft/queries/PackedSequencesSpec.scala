package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Document packing invariants on planted id sequences: fixed-length cuts,
  * boundary accounting, and the round trip — the packed stream must be
  * exactly the shard's concatenated document ids, nothing lost, nothing
  * reordered, nothing invented.
  */
class PackedSequencesSpec extends SparkSpec {

  // 12 docs with varying id lengths; single-shard (shardHexChars would
  // split them, so the round-trip test recomputes the expected order from
  // the same md5 key the operator uses)
  private def ids = {
    import spark.implicits._
    (0 until 12).map { i =>
      (i.toLong, (0 until (5 + 3 * (i % 4))).map(j => i * 100 + j).toArray)
    }.toDF("doc_id", "ids")
  }

  private def md5key(docId: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s"$docId:42".getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("every sequence except each shard's tail is exactly seqLen tokens") {
    val seqLen = 16
    val packed = CorpusPackedFixture.run(ids, 1, seqLen)
    val byShard = packed.groupBy(_.getString(0))
    byShard.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.dropRight(1).foreach(r =>
        assert(r.getLong(2) == seqLen, s"non-tail sequence must be full: $r"))
      assert(sorted.last.getLong(2) <= seqLen)
    }
    // total tokens conserved
    val total = packed.map(_.getLong(2)).sum
    assert(total == (0 until 12).map(i => 5 + 3 * (i % 4)).sum)
  }

  test("document starts are counted as loss-mask reset points") {
    val packed = CorpusPackedFixture.run(ids, 1, 16)
    assert(packed.map(_.getLong(4)).sum == 12,
      "every document starts exactly once across the packed stream")
  }

  test("round trip: the packed digests reproduce the shard-ordered concatenated stream") {
    val seqLen = 16
    val packed = CorpusPackedFixture.run(ids, 1, seqLen)
    // rebuild the expected stream per shard: docs ordered by (md5 key,
    // doc_id) — the operator's own shard ordering — then cut and digest
    val docs = ids.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1)))
      .map { case (id, arr) => (md5key(id).take(1), md5key(id), id, arr) }
    docs.groupBy(_._1).foreach { case (shard, ds) =>
      val stream = ds.sortBy(d => (d._2, d._3)).flatMap(_._4)
      val expected = stream.grouped(seqLen).zipWithIndex.map { case (chunk, i) =>
        i.toLong -> chunk.mkString(",")
      }.toMap
      val got = packed.filter(_.getString(0) == shard)
      assert(got.length == expected.size, s"shard $shard sequence count")
      got.foreach { r =>
        val want = expected(r.getLong(1))
        val wantDigest = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(org.apache.spark.unsafe.types.UTF8String.fromString(want),
            org.apache.spark.sql.types.StringType, 42L)
        assert(r.getLong(5) == wantDigest,
          s"shard $shard seq ${r.getLong(1)}: digest mismatch")
      }
    }
  }
}

/** Shared runner: collect the packed frame once per call. */
private object CorpusPackedFixture {
  def run(ids: org.apache.spark.sql.DataFrame, shardHexChars: Int,
      seqLen: Int): Array[org.apache.spark.sql.Row] =
    Text.packSequences(ids, shardHexChars, seqLen).collect()
}
