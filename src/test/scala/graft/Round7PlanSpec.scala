package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusQueries, StarQueries}

/** Physical-plan shape assertions for the round-7 additions. */
class Round7PlanSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q190 star join: every dimension broadcasts, the fact table never re-exchanges") {
    val df = StarQueries.q190StarJoin(spark, sf)
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    val p = planOf(df)
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 4,
      s"region/nation/customer/supplier (and ideally orders) must broadcast; got $nBroadcast in:\n$p")
    assert(!p.contains("CartesianProduct"))
    // at most the lineitem⋈orders pair may shuffle; with AQE the
    // date-filtered orders side broadcasts too at this SF
    val nSmj = "SortMergeJoin".r.findAllIn(p).length
    assert(nSmj <= 1, s"more than one shuffle join in the star:\n$p")
  }

  test("q186 equi-width histogram: stats broadcast, bucketing is a hash agg") {
    val p = planOf(StarQueries.q186EquiwidthHist(spark, sf))
    assert(p.contains("Broadcast"))
    assert(p.contains("HashAggregate"))
  }

  test("q181 exact substring dedup: fp agg is hash-based, no cartesian, doc window keyed") {
    val df = CorpusQueries.substringDedupExact(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
    val opt = df.queryExecution.optimizedPlan.toString.replaceAll("\\s", "")
    val keyless = "windowspecdefinition\\((?!id)".r
    assert(keyless.findFirstIn(opt).isEmpty, s"keyless window in:\n$opt")
  }

  test("q80 qdigest: no recount scan — the verdict rides the gridded ranking pass") {
    // the plan must contain NO per-row conditional-count aggregate over
    // the raw stream beyond the sketch + the single ranked pass: assert
    // the obvious regression markers instead of counting scans — no
    // cartesian, and the only sort is the tiny bracketing-bucket window
    val df = CorpusQueries.quantileSketch(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ObjectHashAggregate"), "sketch agg must be object-hash, not sort-based")
  }
}
