package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

/** Fixture spec for X150 k-core peeling: a K4 clique survives the
  * 2-core forever, pendant chains peel outside-in (removal round =
  * distance from the chain end — the coarse coreness rank), isolated
  * nodes drop in round 1. */
class KCoreSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("clique survives, chain peels outside-in, isolate drops first") {
    // K4 on 0-3; chain 3-10-11-12 (pendant path); isolate 20
    val nodes = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L).toDF("vec_id")
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 10L), (10L, 11L), (11L, 12L)
    ).toDF("vec_a", "vec_b")
    val out = KCore.peel(nodes, edges, k = 2, rounds = 5)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    // clique: alive with degree 3 each (edge 3-10 dies with the chain)
    (0L to 3L).foreach { v =>
      assert(out(v)._1.isEmpty, s"clique node $v must survive the 2-core")
      assert(out(v)._2.contains(3L))
    }
    // chain end 12 peels first (deg 1), then 11, then 10
    assert(out(12L)._1.contains(1L))
    assert(out(11L)._1.contains(2L))
    assert(out(10L)._1.contains(3L))
    // isolate: degree 0 → round 1
    assert(out(20L)._1.contains(1L))
  }
}
