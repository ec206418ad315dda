package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeansExact

/** Fixture spec for X132 simplified silhouette: separation sensitivity —
  * tight well-separated clusters score near 1 and outscore a uniform
  * arc split arbitrarily in half — the semantics the hash gate replays
  * but cannot explain. */
class SilhouetteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def blob(base: Array[Float], ids: Range, eps: Float) =
    ids.map(i => (i.toLong, base.zipWithIndex.map { case (v, d) =>
      v + (if (d == i % 4) eps * (1 + i % 3) else 0f) }))

  test("well-separated clusters score high, split blob scores low") {
    // two orthogonal tight blobs → silhouette ≈ 1
    val a = blob(Array(10f, 0f, 0f, 0f), 0 until 6, 0.01f)
    val b = blob(Array(0f, 10f, 0f, 0f), 6 until 12, 0.01f)
    val sep = KMeansExact.silhouette(
      (a ++ b).toDF("vec_id", "embedding"), k = 2, iters = 2)
      .collect().map(_.getAs[Double]("sil_avg"))
    assert(sep.length == 2 && sep.forall(_ > 0.9), sep.toSeq.toString)

    // a uniform 90° arc forced into k=2: boundary points sit nearly
    // equidistant between the two halves' centroids → depressed mean s
    val arc = (0 until 12).map { i =>
      val th = (math.Pi / 2) * i / 11.0
      (i.toLong, Array(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f))
    }
    val low = KMeansExact.silhouette(
      arc.toDF("vec_id", "embedding"), k = 2, iters = 2)
      .collect().map(_.getAs[Double]("sil_avg"))
    assert(sep.min > low.max,
      s"separated clusters ($sep) must outscore the split arc ($low)")
  }
}
