package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.StarQueries

/** Physical-plan shape assertions for the round-8 additions: the two
  * canonical fact-join shapes (TPC-H Q21-like self-join-as-aggregate,
  * Q8-like two-fact-path) must keep the plans that survive 100 TB —
  * fact scanned once, dims broadcast, no cartesian, facts reduced
  * BEFORE the join. */
class Round8PlanSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    // an action on THIS Dataset executes THIS QueryExecution, so AQE
    // finalizes the plan we assert on (a noop write would spawn a
    // separate QueryExecution and leave df's plan at isFinalPlan=false)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("isFinalPlan=false"),
      s"plan did not AQE-finalize after collect():\n$p")
    // the executed AdaptiveSparkPlan prints BOTH plans; assert on the
    // final one only (the initial section would double scan counts)
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  private def scanLines(p: String): Seq[String] =
    p.linesIterator.filter(l =>
      l.contains("FileScan parquet") || l.contains("Scan parquet")).toSeq

  test("q193 Q21-shape: ONE lineitem scan (no literal self-join), dims broadcast, no cartesian") {
    val df = StarQueries.q193WaitingSupplier(spark, sf)
    val p = finalPlan(df)
    // the EXISTS / NOT-EXISTS rewrite touches the fact once; the
    // literal plan would scan it three times (l1, l2, l3)
    assert(scanLines(p).count(_.contains("lineitem")) == 1,
      s"fact must be scanned exactly once, got:\n${scanLines(p).mkString("\n")}")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1,
      s"supplier⋈nation must broadcast in:\n$p")
    // at most the perOrder⋈orders pair may shuffle-join; AQE broadcasts
    // the status-filtered orders side at this SF
    assert("SortMergeJoin".r.findAllIn(p).length <= 1,
      s"more than one shuffle join:\n$p")
  }

  test("q194 two fact paths: each fact scanned once and REDUCED before the customer join") {
    val df = StarQueries.q194TwoFactPaths(spark, sf)
    val p = finalPlan(df)
    assert(scanLines(p).count(_.contains("orders")) == 1,
      s"orders must be scanned exactly once:\n${scanLines(p).mkString("\n")}")
    assert(scanLines(p).count(_.contains("events")) == 1,
      s"events must be scanned exactly once:\n${scanLines(p).mkString("\n")}")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), s"nation must broadcast in:\n$p")
    // both fact paths must aggregate to customer grain BELOW the join:
    // a HashAggregate keyed by the fact's customer key on each path
    assert(p.contains("o_custkey"), p)
    assert(p.contains("user_id"), p)
    val aggs = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("o_custkey")),
      s"orders path must pre-aggregate on o_custkey:\n${aggs.mkString("\n")}")
    assert(aggs.exists(_.contains("user_id")),
      s"events path must pre-aggregate on user_id:\n${aggs.mkString("\n")}")
  }

  test("q195 Q17-shape: decorrelated threshold join stays co-keyed, part broadcasts, no cartesian") {
    val df = StarQueries.q195SmallQtyRevenue(spark, sf)
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), s"part dim must broadcast:\n$p")
    // the decorrelated rewrite reads the fact for the threshold agg and
    // the probe — never once per subquery; two scans is the contract
    assert(scanLines(p).count(_.contains("lineitem")) <= 2,
      s"fact must not be re-read per correlation:\n${scanLines(p).mkString("\n")}")
  }

  test("q192 audio row: features survive the round trip for a non-trivial fixture") {
    // the oracle gate proves the arithmetic; this pins the plumbing —
    // blob synthesis and decode compose inside the engine and the
    // chunk-walking parse handles the LIST-chunk variant (doc_id % 3)
    val rows = graft.queries.CorpusQueries.audioFeatures(spark, sf)
      .limit(4).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sample_rate") >= 8000L) // never the fallback
      assert(r.getAs[Long]("n_samples") >= 100L)
      assert(r.getAs[Long]("sum_sq") > 0L)
    }
  }

  test("q196 Q2-shape: decorrelated min join, dims broadcast, no cartesian, fact not re-read per correlation") {
    val p = finalPlan(StarQueries.q196MinCostSupplier(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"region-pruned suppliers and part dim must broadcast:\n$p")
    // the literal correlated plan re-reads ps per part; the rewrite's
    // per-part min is a keyed WINDOW over the cost relation, so the
    // fact is scanned exactly once and the min costs no second branch
    assert(scanLines(p).count(_.contains("lineitem")) == 1,
      s"fact must be scanned exactly once:\n${scanLines(p).mkString("\n")}")
    assert(p.contains("Window"), s"per-part min must be a keyed window:\n$p")
  }

  test("q197 Q18-shape: fact aggregated to order grain ONCE, never rejoined for the sum") {
    val p = finalPlan(StarQueries.q197LargeQtyOrders(spark, sf))
    assert(scanLines(p).count(_.contains("lineitem")) == 1,
      s"fact must be scanned exactly once:\n${scanLines(p).mkString("\n")}")
    assert(!p.contains("CartesianProduct"))
    val aggs = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("l_orderkey")),
      s"fact must pre-aggregate on l_orderkey below the joins:\n${aggs.mkString("\n")}")
  }

  test("q198 Q22-shape: scalar broadcast + anti-join, nation broadcast, no cartesian") {
    val p = finalPlan(StarQueries.q198DormantCustomers(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftAnti"), s"dormancy must plan as an anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation must broadcast:\n$p")
    // the scalar threshold crosses as a broadcast nested loop of ONE row
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q199 Q11-shape: threshold derived from the per-part agg, not a second fact pass") {
    val p = finalPlan(StarQueries.q199ValueShare(spark, sf))
    assert(!p.contains("CartesianProduct"))
    // both branches hang off the per-part aggregate; the fact feeds the
    // agg at most twice (exchange reuse collapses it to once under AQE)
    assert(scanLines(p).count(_.contains("lineitem")) <= 2,
      s"threshold must come from the per-part agg:\n${scanLines(p).mkString("\n")}")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the one-row scalar
  }

  test("q200 Q15-shape: shipdate pushed to the scan, max broadcast, tie set by decimal equality") {
    val df = StarQueries.q200TopRevenueSupplier(spark, sf)
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin"), s"supplier dim must broadcast:\n$p")
    assert(p.contains("PushedFilters") || p.contains("l_shipdate"),
      s"quarter filter must reach the scan:\n$p")
    assert(scanLines(p).count(_.contains("lineitem")) <= 2, p)
  }

  test("q203 Q13-shape: orders aggregated to custkey grain BELOW the left join, zero bucket preserved") {
    val df = StarQueries.q203OrderCountHist(spark, sf)
    val p = finalPlan(df)
    assert(!p.contains("CartesianProduct"))
    val aggs = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggs.exists(_.contains("o_custkey")),
      s"orders must pre-aggregate on o_custkey below the join:\n${aggs.mkString("\n")}")
    // the signature zero-orders bucket must be present in the result
    val zero = df.collect().find(_.getAs[Long]("c_count") == 0L)
    assert(zero.isDefined && zero.get.getAs[Long]("n_customers") > 0L,
      "zero-orders bucket must survive the left join")
  }

  test("q204 Q7-shape: disjunctive nation pair never plans a cartesian; dims broadcast") {
    val p = finalPlan(StarQueries.q204VolumeShipping(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"the OR pair predicate must not key the join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"IN-filtered supplier/customer dims must broadcast:\n$p")
    assert(scanLines(p).count(_.contains("lineitem")) == 1, p)
  }

  test("q201 Q20-shape: ONE fact scan folds both correlated sums (conditional agg)") {
    val p = finalPlan(StarQueries.q201ExcessStock(spark, sf))
    assert(scanLines(p).count(_.contains("lineitem")) == 1,
      s"the correlated availability-vs-shipped compare must fold into one scan:\n${scanLines(p).mkString("\n")}")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftSemi"), s"part family and supplier must semi-join:\n$p")
  }
}
