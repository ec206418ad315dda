package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Md5Hash56, PairCombinations}

/** Unit behavior of the pair-combinations Generator and expression
  * foldability. */
class PairCombinationsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def pairsOf(xs: Seq[Long]): Seq[(Long, Long)] =
    Seq(xs).toDF("ds")
      .select(exprColumn(PairCombinations(columnExpr(col("ds")))).as(Seq("x", "y")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("emits all C(n,2) ordered pairs of a sorted array") {
    assert(pairsOf(Seq(1L, 2L, 3L)) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val n = 10
    val ps = pairsOf((1L to n).toSeq)
    assert(ps.length == n * (n - 1) / 2)
    assert(ps.forall { case (a, b) => a < b })
    assert(ps.distinct.length == ps.length)
  }

  test("empty and singleton arrays emit nothing; null array emits nothing") {
    assert(pairsOf(Seq.empty) == Seq.empty)
    assert(pairsOf(Seq(7L)) == Seq.empty)
    val fromNull = Seq(Tuple1[Option[Seq[Long]]](None)).toDF("ds")
      .select(exprColumn(PairCombinations(columnExpr(col("ds")))).as(Seq("x", "y")))
      .count()
    assert(fromNull == 0)
  }

  test("struct elements pass through with their fields") {
    val ps = Seq(Seq((1L, 10L), (2L, 20L), (3L, 30L))).toDF("ds")
      .select(exprColumn(PairCombinations(columnExpr(col("ds")))).as(Seq("x", "y")))
      .select(col("x._1"), col("x._2"), col("y._1"), col("y._2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ps.toSeq == Seq((1L, 10L, 2L, 20L), (1L, 10L, 3L, 30L), (2L, 20L, 3L, 30L)))
  }

  test("literal inputs to custom expressions constant-fold") {
    val plan = spark.range(1)
      .select(exprColumn(Md5Hash56(columnExpr(lit("abc")))).as("h"))
      .queryExecution.optimizedPlan
    // after ConstantFolding the projection holds a Literal, not the expr
    assert(plan.expressions.exists(_.collectFirst {
      case l: org.apache.spark.sql.catalyst.expressions.Literal
        if l.dataType == org.apache.spark.sql.types.LongType => l
    }.isDefined), s"not folded: $plan")
  }
}
