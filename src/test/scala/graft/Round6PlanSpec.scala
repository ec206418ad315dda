package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Physical-plan shape assertions for the round-6 additions — the
  * properties that make them scale, checked on the EXECUTED plan, not
  * trusted from the code: blocking really replaces the cartesian, the
  * control-plane tables really broadcast, the boilerplate back-join
  * really rides a hash join on its agg key. */
class Round6PlanSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("blocked fuzzy join plans a hash/merge equi-join, never a cartesian") {
    val p = planOf(CorpusQueries.fuzzyLinkage(spark, sf))
    assert(!p.contains("CartesianProduct"),
      "blocking key must make the candidate join an equi-join")
    assert(p.contains("Join") || p.contains("join"))
  }

  test("consistent-hash vnode table broadcasts into the key scan") {
    val p = planOf(CorpusQueries.consistentRebalance(spark, sf))
    assert(p.contains("Broadcast"),
      "the vnode ring is control-plane and must broadcast")
  }

  test("KS drift: value grid and totals broadcast, no cartesian blowup") {
    val p = planOf(CorpusQueries.ksDrift(spark, sf))
    assert(p.contains("Broadcast"))
    assert(!p.contains("CartesianProduct"))
  }

  test("boilerplate threshold table broadcasts; chunk agg is hash-based") {
    val p = planOf(CorpusQueries.boilerplateStrip(spark, sf))
    assert(p.contains("Broadcast"))
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }

  test("gap-fill calendar join keeps keyed windows (no keyless raw-stream window)") {
    val df = CorpusQueries.gapFill(spark, sf)
    val p = df.queryExecution.optimizedPlan.toString
    // every windowspecdefinition here partitions by the key column
    val keyless = "windowspecdefinition\\((?!event_type)".r
    assert(keyless.findFirstIn(p.replaceAll("\\s", "")).isEmpty,
      s"found keyless window in:\n$p")
  }
}
