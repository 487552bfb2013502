package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SCD Type-2 / MERGE / snapshot-diff invariants the row hashes can't
  * see: interval tiling (no gaps, no overlaps, one current version per
  * user), the one-exchange build plan, the equi-join (not nested-loop)
  * lookup with its exactly-one-match guarantee, MERGE's delete/insert
  * bookkeeping, and the diff's erasure rows.
  */
class ScdSpec extends SparkSpec {

  test("x177: intervals tile [first_change, inf) per user, one exchange") {
    val df = SparkEntry.queries("x177_scd2_build")(spark, sf001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // exactly one current (NULL valid_to) version per user, versions 1..n,
    // and each valid_to equals the next version's valid_from (no gaps)
    rows.groupBy(_.getLong(0)).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq == (1 to sorted.length),
        s"user $u versions must be dense")
      assert(sorted.count(_.isNullAt(3)) == 1 && sorted.last.isNullAt(3),
        s"user $u must have exactly one open current version")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(3) == b.getTimestamp(2),
            s"user $u: valid_to must chain to next valid_from")
        case _ =>
      }
      // consecutive versions always change the attribute (compression)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(1) != b.getString(1))
        case _ =>
      }
    }
    // one user_id hash exchange feeds the whole window chain; the only
    // other exchange is the presentation orderBy's range partitioning
    // (count physical nodes — the AQE string repeats the initial plan)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val hashEx = graft.SparkSpec.allPlanNodes(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeLike
        if e.outputPartitioning.isInstanceOf[HashPartitioning] => e }
    assert(hashEx.length == 1, df.queryExecution.executedPlan.toString)
  }

  test("x178: PIT lookup equi-joins and matches exactly once per probe") {
    val df = SparkEntry.queries("x178_scd2_lookup")(spark, sf001)
    val got = df.collect()
    val probes = Tables(spark, sf001, "events")
      .where(pmod(col("event_id"), lit(7)) === 0).count()
    assert(got.length == probes.toInt,
      s"every probe must match exactly one version: ${got.length} vs $probes")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "interval predicate must ride the user_id equi-join\n" + plan)
    // spot-check the semantics: the attr at a probe's own ts is the last
    // change at or before it
    val e = Tables(spark, sf001, "events").collect()
      .map(r => (r.getLong(2), r.getTimestamp(1), r.getLong(0), r.getString(3)))
    got.take(50).foreach { r =>
      val (eid, u, ts) = (r.getLong(0), r.getLong(1), r.getTimestamp(2))
      val expect = e.filter(x => x._1 == u && !x._2.after(ts))
        .maxBy(x => (x._2.getTime, x._3))._4
      assert(r.getString(3) == expect, s"probe $eid attr_at_ts")
    }
  }

  test("x179: MERGE applies U/I, drops D-matched, skips D-unmatched") {
    val rows = SparkEntry.queries("x179_merge_upsert")(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length,
      "merge output must be key-unique")
    val actions = rows.map(_.getString(4)).toSet
    assert(actions.subsetOf(Set("keep", "U", "I")), actions.toString)
    // inserted rows carry zeroed counters; updated rows keep theirs
    rows.filter(_.getString(4) == "I").foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(3) == 0L)
    }
    // a matched source row whose latest batch event is 'purchase' must
    // have deleted its target row
    val e = Tables(spark, sf001, "events")
    val deleted = e.where(pmod(col("event_id"), lit(5)) === 0)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_type"),
        concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 10, "0"))).as("t"))
      .where(col("t") === "purchase")
      .join(e.where(pmod(col("event_id"), lit(5)) =!= 0)
        .select(col("user_id")).distinct(), Seq("user_id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty, "fixture must exercise the delete branch")
    val out = rows.map(_.getLong(0)).toSet
    assert(deleted.forall(!out.contains(_)), "D-matched keys must be gone")
  }

  test("x180: diff classifies erasures as D and keeps only changed rows") {
    val rows = SparkEntry.queries("x180_snapshot_diff")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val ops = rows.map(_.getString(1)).toSet
    assert(ops.subsetOf(Set("I", "U", "D")) && ops.contains("D") &&
      ops.contains("U"), ops.toString)
    // every D row is an erased user (generation B excludes user_id%13=0)
    rows.filter(_.getString(1) == "D").foreach { r =>
      assert(r.getLong(0) % 13 == 0, s"unexpected delete for ${r.getLong(0)}")
    }
    // D rows carry only the A side, I rows only the B side
    rows.foreach { r =>
      r.getString(1) match {
        case "D" => assert(!r.isNullAt(2) && r.isNullAt(3))
        case "I" => assert(r.isNullAt(2) && !r.isNullAt(3))
        case _ => assert(!r.isNullAt(2) && !r.isNullAt(3))
      }
    }
  }
}
