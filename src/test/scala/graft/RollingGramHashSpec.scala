package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingGramHash

/** The O(n) rolling gram hash must agree with the O(n·L) direct
  * polynomial evaluation at every window — the rolling recurrence is an
  * optimization, never a semantics change. */
class RollingGramHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def hashes(tokens: Seq[String], l: Int): Seq[Long] =
    Seq(tokens.mkString(" ")).toDF("text")
      .select(exprColumn(RollingGramHash(
        columnExpr(split(col("text"), " ")), l)).as("h"))
      .collect().head.getSeq[Long](0)

  test("rolling equals direct polynomial at every window") {
    val toks = Seq("alpha", "beta", "gamma", "beta", "alpha", "δδ", "beta")
    val l = 3
    val got = hashes(toks, l)
    // direct: same FNV token hash + left-to-right Horner mod 2^61-1,
    // recomputed from scratch per window (no rolling)
    val M = BigInt(2).pow(61) - 1
    def tok(s: String): BigInt = {
      var h = BigInt("cbf29ce484222325", 16)
      s.getBytes("UTF-8").foreach { b =>
        h = ((h ^ (b & 0xffL)) * BigInt("100000001b3", 16)) &
          (BigInt(2).pow(64) - 1)
      }
      h & (BigInt(2).pow(60) - 1)
    }
    val direct = toks.sliding(l).map(w =>
      w.foldLeft(BigInt(0))((acc, t) => (acc * 1000003 + tok(t)) mod M)
        .toLong).toSeq
    assert(got === direct)
  }

  test("equal grams collide, unequal grams differ; short docs yield empty") {
    val got = hashes(Seq("a", "b", "a", "b", "a"), 2)
    assert(got.length == 4)
    assert(got(0) == got(2) && got(1) == got(3), "repeated bigrams must hash equal")
    assert(got(0) != got(1))
    assert(hashes(Seq("only"), 2).isEmpty)
  }

  test("codegen and interpreted paths agree") {
    val df = (0 until 50)
      .map(i => (0 until 10).map(j => s"t${(i * 7 + j * 3) % 13}").mkString(" "))
      .toDF("text")
    val h = exprColumn(RollingGramHash(columnExpr(split(col("text"), " ")), 4))
    val a = df.select(h.as("h")).collect().map(_.getSeq[Long](0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val b = try df.select(h.as("h")).collect().map(_.getSeq[Long](0)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(a === b)
  }
}
