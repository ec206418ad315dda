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

  // --- SimHashBandPairs: the fused banded-simhash expansion ---

  private def bandPairs(bucket: Seq[(Long, Long)], blk: Int,
      masks: Seq[Long], maxHamming: Int): Seq[(Long, Long, Long)] =
    Seq((bucket, blk)).toDF("ds", "blk")
      .select(exprColumn(graft.functions.SimHashBandPairs(
          columnExpr(col("ds")), columnExpr(col("blk")), masks, maxHamming))
        .as(Seq("doc_a", "doc_b", "hamming")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("band-pairs generator: verify + first-block dedup in one pass") {
    // masks: two 2-bit blocks over 4 bits
    val masks = Seq(0x3L, 0xcL)
    // fingerprints: 0b0001, 0b0010, 0b1110
    val bucket = Seq((10L, 1L), (11L, 2L), (12L, 14L))
    // (10,11): xor 0b0011, hamming 2, first agreeing block 1 -> emitted
    // only from the blk=1 bucket. (11,12): xor 0b1100, hamming 2, first
    // agreeing block 0 -> emitted only from blk=0. (10,12): xor 0b1111,
    // hamming 4, agrees nowhere -> never emitted.
    assert(bandPairs(bucket, 0, masks, 4) == Seq((11L, 12L, 2L)))
    assert(bandPairs(bucket, 1, masks, 4) == Seq((10L, 11L, 2L)))
    // hamming cap filters
    assert(bandPairs(bucket, 1, masks, 1) == Seq())
  }

  test("band-pairs generator: empty, singleton, and null buckets emit nothing") {
    val masks = Seq(0x3L, 0xcL)
    assert(bandPairs(Seq.empty, 0, masks, 4) == Seq())
    assert(bandPairs(Seq((1L, 1L)), 0, masks, 4) == Seq())
    val fromNull = Seq(Tuple2[Option[Seq[(Long, Long)]], Int](None, 0)).toDF("ds", "blk")
      .select(exprColumn(graft.functions.SimHashBandPairs(
          columnExpr(col("ds")), columnExpr(col("blk")), masks, 4))
        .as(Seq("doc_a", "doc_b", "hamming")))
      .count()
    assert(fromNull == 0)
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
