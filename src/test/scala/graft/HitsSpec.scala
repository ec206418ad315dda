package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hits

/** Fixture specs for X130 HITS: the mutual-reinforcement property that
  * separates it from plain document frequency, and the determinism of
  * the fixed-point arithmetic across partitionings. */
class HitsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("equal df, stronger hubs win: reinforcement beats raw frequency") {
    // x and y both have df=2 — but x's docs (1,2) also touch the
    // corpus-wide authority 'core', while y's docs (5,6) are isolated:
    // HITS must rank auth(x) > auth(y); df cannot separate them
    val edges = Seq(
      (1L, "core"), (2L, "core"), (3L, "core"), (4L, "core"),
      (1L, "x"), (2L, "x"),
      (5L, "y"), (6L, "y")
    ).toDF("src", "dst")
    val auth = Hits.bipartiteAuthorities(edges, iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(auth("core") > auth("x"), "max-df token is the top authority")
    assert(auth("x") > auth("y"),
      s"equal-df x (strong hubs) must outrank y (isolated hubs): $auth")
  }

  test("scores are partitioning-independent (integer fixed point)") {
    val edges = (1L to 40L).flatMap { d =>
      Seq((d, s"t${d % 7}"), (d, s"t${d % 3}"), (d, "common"))
    }.distinct.toDF("src", "dst")
    val a = Hits.bipartiteAuthorities(edges.repartition(1), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val b = Hits.bipartiteAuthorities(edges.repartition(13), iters = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
