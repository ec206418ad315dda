package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X156 vocab growth: monotone cumulative type counts
  * and the saturation signal — the random-word corpus keeps growing
  * between prefixes (no single source saturates its bigram space at
  * sf0.001's ~25 docs/source). */
class VocabGrowthSpec extends AnyFunSuite {
  import TestSpark._

  test("cumulative type counts are monotone and growth is visible") {
    val rows = CorpusQueries.vocabGrowth(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t25, t50, t100) = (r.getAs[Long]("types_25"),
        r.getAs[Long]("types_50"), r.getAs[Long]("types_100"))
      assert(t25 <= t50 && t50 <= t100, s"${r.get(0)}: non-monotone curve")
      assert(t25 > 0)
    }
    assert(rows.exists(r =>
      r.getAs[Long]("types_100") > r.getAs[Long]("types_50")),
      "the random corpus must still be adding bigram types at 100%")
  }
}
