package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X167 nested export: assembly completeness — every
  * line lands in exactly one record in canonical order, the doc parses
  * back to n_lines entries, and the nested total reconciles with the
  * flat sum. */
class NestExportSpec extends AnyFunSuite {
  import TestSpark._

  test("records parse back: counts, order, totals reconcile") {
    val sf = "/root/testdata/sf0.001"
    val rows = CorpusQueries.nestExport(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalLines = rows.map(_.getAs[Long]("n_lines")).sum
    assert(totalLines == Tables.load(spark, sf, "lineitem").count())
    rows.foreach { r =>
      val parts = r.getAs[String]("lines_doc").split('|')
      assert(parts.length == r.getAs[Long]("n_lines"))
      val triples = parts.map(_.split(':').map(_.toLong))
      // canonical non-decreasing (ln, qty, cents) order
      assert(triples.sliding(2).forall {
        case Array(a, b) => Seq(a(0), a(1), a(2)).zip(Seq(b(0), b(1), b(2)))
          .foldLeft(0) { case (c, (x, y)) => if (c != 0) c else x.compare(y) } <= 0
        case _ => true
      })
      assert(triples.map(_(2)).sum == r.getAs[Long]("total_cents"))
    }
  }
}
