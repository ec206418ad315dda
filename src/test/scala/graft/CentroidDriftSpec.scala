package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X155 centroid drift, on CONTROLLED clusters (the
  * synthetic corpus' labels are structureless, so semantics are pinned
  * here): coincident half-distributions score ≈1, a deliberately
  * rotated half scores low — the drift signal the operator exists
  * to raise. */
class CentroidDriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // md5-based halves are a fixed function of vec_id: probe which half
  // each id lands in, then construct the fixture around that assignment
  private def halfOf(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = (java.lang.Long.parseLong(d.substring(0, 7), 16) << 28) +
      java.lang.Long.parseLong(d.substring(7, 14), 16)
    (h % 2).toInt
  }

  private def base(i: Int, main: Double, alt: Double) =
    Array.tabulate(64)(d => (if (d == 0) main else if (d == 1) alt else 0.0) +
      0.001 * ((i * 31 + d) % 7))

  test("coincident halves ≈ 1; rotated half drops the cosine") {
    val ids = (0L until 40L)
    // label "same": both halves draw from direction e0
    val same = ids.map(i => (i, "same", base(i.toInt, 10.0, 0.0).map(_.toFloat)))
    // label "drift": half 0 points along e0, half 1 along e1
    val drift = ids.map { i =>
      val v = if (halfOf(i + 1000L) == 0) base(i.toInt, 10.0, 0.0)
        else base(i.toInt, 0.0, 10.0)
      (i + 1000L, "drift", v.map(_.toFloat))
    }
    val out = CorpusQueries.centroidDriftOf(
      (same ++ drift).toDF("vec_id", "label", "embedding"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("centroid_cos"))
      .toMap
    assert(out("same") > 0.99, s"coincident halves must not drift: $out")
    assert(out("drift") < 0.3, s"rotated half must read as drift: $out")
  }
}
