package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture specs for the audit family (X151–X153): metric identities on
  * the classifier eval, the k-anonymity flag boundary, and the data
  * contract verdicts on the (clean) testdata. */
class AuditSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  test("langid eval: confusion identities and harmonic F1") {
    val rows = CorpusQueries.langIdEval(spark, sf).collect()
    assert(rows.nonEmpty)
    val sumTrue = rows.map(_.getAs[Long]("n_true")).sum
    val sumPred = rows.map(_.getAs[Long]("n_pred")).sum
    assert(sumTrue == sumPred, "every doc has one truth and one prediction")
    rows.foreach { r =>
      val (t, p, tp) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_pred"),
        r.getAs[Long]("tp"))
      assert(tp <= math.min(t, p))
      if (t + p > 0)
        assert(r.getAs[Double]("f1") == 2.0 * tp / (t + p).toDouble)
    }
    // the marker heuristic should actually work on the synthetic corpus
    val en = rows.find(_.getAs[String]("cls") == "en").get
    assert(en.getAs[Double]("recall") > 0.5)
  }

  test("k-anonymity flag flips exactly at the k=5 boundary") {
    val rows = CorpusQueries.kAnonymity(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("k_anon_ok") == (r.getAs[Long]("n") >= 5))
    }
    assert(rows.exists(!_.getAs[Boolean]("k_anon_ok")),
      "small QI classes must exist at sf0.001 for the audit to bite")
  }

  test("AQP sample: ~1% rate, deterministic across runs") {
    val a = CorpusQueries.sampleAqp(spark, sf).collect()
    a.foreach { r =>
      val (n, ns) = (r.getAs[Long]("n"), r.getAs[Long]("n_samp"))
      assert(ns > 0 && math.abs(ns.toDouble / n - 0.01) < 0.01,
        s"sample rate off: $ns of $n")
    }
    val b = CorpusQueries.sampleAqp(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("data contract: testdata is clean, every rule green") {
    val rows = CorpusQueries.dataContract(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"), s"rule ${r.getString(0)} violated")
    }
  }
}
