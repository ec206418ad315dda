package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Fixture spec for X148 Gini: the closed-form endpoints — uniform
  * counts give exactly 0, total concentration approaches (n−1)/n, and
  * a hand-computed middle case is exact. */
class GiniSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def g(xs: Seq[Long]): Double =
    Skew.gini(xs.toDF("x"), "x", "t").collect().head.getAs[Double]("gini")

  test("uniform distribution scores exactly 0") {
    assert(g(Seq(7L, 7L, 7L, 7L)) == 0.0)
  }

  test("total concentration scores (n-1)/n") {
    // x = (0,0,0,100): G = (2·4·100 − 5·100)/(4·100) = 300/400
    assert(g(Seq(0L, 0L, 0L, 100L)) == 0.75)
  }

  test("hand-computed middle case is exact") {
    // x asc = (1,2,3,4): Σi·x = 1+4+9+16 = 30; G = (60 − 50)/40 = 0.25
    assert(g(Seq(4L, 2L, 3L, 1L)) == 0.25)
  }
}
