package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KsDrift

/** Fixture spec for X140 exact KS drift: hand-computable D values —
  * disjoint supports give D=1, identical distributions give D=0, and a
  * half-shifted group gives the exact fractional statistic. */
class KsDriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("shifted supports score high; rest-matching distribution scores 0") {
    val df = (Seq.fill(4)(("lo", 1L)) ++ Seq.fill(4)(("hi", 100L)) ++
      Seq.fill(2)(("mix", 1L)) ++ Seq.fill(2)(("mix", 100L)))
      .toDF("source", "n_chars")
    val out = KsDrift.perGroupVsRest(df, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ks")).toMap
    // lo: F_lo(1)=1 vs F_rest(1)=2/8 (mix's two 1s) → D = 3/4; hi
    // mirrors it: F_hi(1)=0 vs F_rest(1)=6/8 → 3/4
    assert(out("lo") == 0.75 && out("hi") == 0.75)
    // mix's ECDF: F_mix(1)=1/2; rest = 4×1 + 4×100 → F_rest(1)=1/2 → D=0
    assert(out("mix") == 0.0)
  }

  test("half-shifted group: exact fractional D") {
    // a = {1,2}, rest = {1,3}: ECDF gaps at v=2 → |1 − 1/2| = 1/2
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 3L))
      .toDF("source", "n_chars")
    val out = KsDrift.perGroupVsRest(df, "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("ks")).toMap
    assert(out("a") == 0.5 && out("b") == 0.5)
  }
}
