package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, Skew}

/** Tolerance + merge-consistency specs for sketch aggregates, and
  * exactness specs for the skew-mitigation operators (which must produce
  * bit-identical results to their direct formulations). */
class SketchSkewSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val lineitem = Tables.load(spark, sf, "lineitem")

  test("salted collect_set equals direct collect_set") {
    val salted = Skew.saltedCollectSet(lineitem, "l_returnflag", "l_suppkey", salts = 8)
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val direct = lineitem.groupBy("l_returnflag")
      .agg(array_sort(collect_set(col("l_suppkey"))).as("l_suppkey_set"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    assert(salted == direct)
  }

  test("salted join equals plain inner join, and spreads the key over salts") {
    val li = lineitem.select(col("l_suppkey").as("suppkey"),
      col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val s = Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    val salted = Skew.saltedJoin(li, s, "suppkey", salts = 8)
      .select("suppkey", "l_orderkey", "l_linenumber", "s_name")
      .orderBy("suppkey", "l_orderkey", "l_linenumber")
      .collect().toSeq
    val plain = li.join(s, "suppkey")
      .select("suppkey", "l_orderkey", "l_linenumber", "s_name")
      .orderBy("suppkey", "l_orderkey", "l_linenumber")
      .collect().toSeq
    assert(salted == plain)
    // the exchange must hash on (key, salt), not the bare key — that is
    // the whole point: a hot key spreads over `salts` reducers
    val bcOff = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Skew.saltedJoin(li, s, "suppkey", salts = 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
      assert(plan.linesIterator.exists(l =>
        l.contains("hashpartitioning") && l.contains("suppkey") && l.contains("__salt")),
        s"exchange not keyed by (suppkey, __salt):\n$plan")
    } finally bcOff match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("two-phase distinct count equals count(DISTINCT)") {
    val twoPhase = Skew.distinctCountTwoPhase(lineitem, "l_returnflag", "l_suppkey")
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val direct = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(twoPhase == direct)
  }

  test("HLL approx distinct within rsd tolerance of exact") {
    val approx = Sketches.approxDistinct(lineitem, "l_returnflag", "l_suppkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err < 0.15, s"$k: approx ${approx(k)} vs exact $n (err $err)")
    }
  }

  test("HLL sketches merge losslessly: union of per-group == direct global") {
    val perGroup = Sketches.hllSketches(lineitem, "l_returnflag", "l_suppkey")
    val merged = Sketches.hllMergeEstimate(perGroup).head().getLong(0)
    val direct = Sketches.hllDirectEstimate(lineitem, "l_suppkey").head().getLong(0)
    assert(merged == direct)
  }
}
