package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X158 span corruption: the identities the hash gate
  * replays but cannot explain — spans partition the masked set, the
  * empirical mask rate sits near the configured 15%, and the stats are
  * a pure function of doc identity (layout-independent). */
class SpanCorruptionSpec extends AnyFunSuite {
  import TestSpark._

  test("span identities, target rate, determinism") {
    val rows = CorpusQueries.spanCorruption(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    var tok = 0L; var msk = 0L
    rows.foreach { r =>
      val (n, m, s) = (r.getAs[Long]("n_tok"), r.getAs[Long]("n_masked"),
        r.getAs[Long]("n_spans"))
      tok += n; msk += m
      assert(s <= m && (m == 0 || s >= 1), "spans partition the masked set")
      assert(m <= n)
      if (s > 0)
        assert(r.getAs[Long]("span_len_milli") == m * 1000 / s)
    }
    val rate = msk.toDouble / tok
    assert(rate > 0.10 && rate < 0.20, s"corpus mask rate $rate far from 0.15")
    val again = CorpusQueries.spanCorruption(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    assert(rows.map(_.toString).toSeq == again)
  }
}
