package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X147 stratified k-fold: per-stratum balance (fold
  * sizes differ by ≤1 within every source) and layout-independence of
  * the assignment. */
class KFoldSpec extends AnyFunSuite {
  import TestSpark._

  test("per-stratum fold sizes differ by at most 1; assignment layout-free") {
    val out = CorpusQueries.kFold(spark, "/root/testdata/sf0.001").collect()
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val sizes = rows.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$src folds unbalanced: ${sizes.toSeq}")
    }
    val again = CorpusQueries.kFold(spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
