package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Fixture spec for X136 blocked fuzzy linkage: the verify budget, and
  * the explicit blocking recall contract (an edit INSIDE the blocking
  * slice loses the pair — the documented tradeoff that kills the
  * cartesian). */
class FuzzyJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val master = Seq((1L, "alpha-0001-x"), (2L, "gamma-0002-y"))
    .toDF("id", "name")

  private def link(b: Seq[(Long, String)]) =
    FuzzyJoin.blockedLevenshteinJoin(master, b.toDF("id", "name"),
        maxDist = 1, blockAt = 7, blockLen = 4, lenBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet

  test("one edit outside the blocking slice links with dist=1") {
    assert(link(Seq((10L, "alphaX0001-x"))) == Set((1L, 10L, 1L)))
  }

  test("two edits exceed the budget: candidate pair is rejected") {
    assert(link(Seq((10L, "alXhaX0001-x"))).isEmpty)
  }

  test("an edit INSIDE the blocking slice loses the pair (recall contract)") {
    // dist would be 1, but the block keys differ → never a candidate
    assert(link(Seq((10L, "alpha-0009-x"))).isEmpty)
  }

  test("length outside the band is never a candidate") {
    assert(link(Seq((10L, "alpha-0001-xlonger"))).isEmpty)
  }
}
