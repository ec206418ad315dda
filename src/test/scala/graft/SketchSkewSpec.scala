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
