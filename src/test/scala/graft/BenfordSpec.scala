package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X142 Benford audit: the constants sum to ~1, every
  * digit 1–9 appears with an expectation, and the audit over sf0.001
  * produces exact-count frequencies that sum to 1. */
class BenfordSpec extends AnyFunSuite {
  import TestSpark._

  test("audit rows are a probability decomposition with Benford targets") {
    val rows = CorpusQueries.benfordAudit(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.getAs[Long]("digit")).toSet.subsetOf((1L to 9L).toSet))
    val freqSum = rows.map(_.getAs[Double]("freq")).sum
    assert(math.abs(freqSum - 1.0) < 1e-12)
    val benfordSum = rows.map(_.getAs[Double]("benford")).sum
    assert(rows.length < 9 || math.abs(benfordSum - 1.0) < 1e-12)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("dev") -
        (r.getAs[Double]("freq") - r.getAs[Double]("benford"))) == 0.0)
    }
  }
}
