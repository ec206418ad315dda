package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConsistentHash

/** Fixture spec for X141 consistent hashing: the minimal-movement
  * property itself — off-diagonal mass only flows INTO the new shard,
  * and its fraction is near 1/(n+1), nowhere near the ~n/(n+1) a
  * modulo reshard pays. */
class ConsistentHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("adding a shard moves only ~1/(n+1) of keys, all to the new shard") {
    val keys = (0L until 2000L).toDF("doc_id")
    val m = ConsistentHash.rebalanceMatrix(keys, "doc_id",
        shards = 8, replicas = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val moved = m.filter { case (b, a, _) => b != a }
    // every moved key lands on the NEW shard (id 8) — consistent
    // hashing never reshuffles between surviving shards
    assert(moved.forall(_._2 == 8L), s"unexpected lateral moves: ${moved.toSeq}")
    val nMoved = moved.map(_._3).sum.toDouble
    val frac = nMoved / 2000.0
    assert(frac > 0.03 && frac < 0.25,
      f"moved fraction $frac%.3f should sit near 1/9, far from 8/9")
  }
}
