package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate

/** Fixture spec for X128 per-source boilerplate strip: semantics the
  * DuckDB hash gate replays but cannot explain — no-keeper excision
  * (EVERY occurrence of a boilerplate chunk goes, including the first),
  * per-source scoping (the same chunk in another source survives), and
  * the all-boilerplate → NULL contract. */
class BoilerplateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // source A: 3 docs sharing the "hdr nav" header chunk; source B: one
  // doc that also contains "hdr nav" but B has only one doc so the
  // minDf=2 floor protects it
  private val docs = Seq(
    (0L, "hdr nav alpha beta", "A"),
    (1L, "hdr nav gamma delta", "A"),
    (2L, "hdr nav epsilon zeta", "A"),
    (3L, "hdr nav unique here", "B")
  ).toDF("doc_id", "text", "source")

  private def run() =
    Boilerplate.stripBoilerplate(docs, "doc_id", "text", "source",
        size = 2, ratioPct = 10, minDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_boiler"), r.getAs[String]("new_text")))).toMap

  test("boilerplate is excised from every doc of the source — no keeper") {
    val out = run()
    assert(out(0L) == ((1L, "alpha beta")))
    assert(out(1L) == ((1L, "gamma delta")))
    assert(out(2L) == ((1L, "epsilon zeta")))
  }

  test("the same chunk under another source is NOT boilerplate there") {
    assert(run()(3L) == ((0L, "hdr nav unique here")))
  }

  test("a document that is entirely boilerplate strips to NULL") {
    val all = Seq(
      (0L, "hdr nav", "A"), (1L, "hdr nav", "A"), (2L, "hdr nav x", "A")
    ).toDF("doc_id", "text", "source")
    val out = Boilerplate.stripBoilerplate(all, "doc_id", "text", "source",
        size = 2, ratioPct = 10, minDf = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("new_text"))).toMap
    assert(out(0L).isEmpty && out(1L).isEmpty)
    // doc 2's trailing short chunk "x" is its own 1-token chunk with
    // df=1 — it survives
    assert(out(2L).contains("x"))
  }
}
