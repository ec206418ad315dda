package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X163 ALS half-step: the output factors satisfy the
  * defining ridge normal equations A·f = b (rebuilt independently in
  * plain Scala from the same item hashes) to float precision — the
  * property that makes it a TRAINING step rather than a scoring
  * heuristic. */
class AlsSpec extends AnyFunSuite {
  import TestSpark._

  private def h56(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(d.substring(0, 7), 16) << 28) +
      java.lang.Long.parseLong(d.substring(7, 14), 16)
  }

  test("factors satisfy the ridge normal equations") {
    val sf = "/root/testdata/sf0.001"
    val f = CorpusQueries.alsHalfStep(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val ratings = Tables.load(spark, sf, "events")
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2).toDouble))
    val byUser = ratings.groupBy(_._1)
    assert(f.keySet == byUser.keySet)
    byUser.foreach { case (u, rs) =>
      var (s11, s12, s22, b1, b2) = (0.125, 0.0, 0.125, 0.0, 0.0)
      rs.sortBy(_._2).foreach { case (_, item, v) =>
        val x1 = ((h56(item) % 7) + 1).toDouble / 8.0
        val x2 = ((h56(item) % 11) + 1).toDouble / 16.0
        s11 += x1 * x1; s12 += x1 * x2; s22 += x2 * x2
        b1 += v * x1; b2 += v * x2
      }
      val (f1, f2) = f(u)
      assert(math.abs(s11 * f1 + s12 * f2 - b1) < 1e-8 * math.abs(b1),
        s"user $u: A·f != b (row 1)")
      assert(math.abs(s12 * f1 + s22 * f2 - b2) < 1e-8 * math.abs(b2),
        s"user $u: A·f != b (row 2)")
    }
  }

  test("alternation: the item step can only lower the ridge objective") {
    val sf = "/root/testdata/sf0.001"
    val lambda = 0.125
    val userF = CorpusQueries.alsHalfStep(spark, sf).collect()
      .map(r => r.getLong(0) -> Array(r.getDouble(1), r.getDouble(2))).toMap
    val itemG = CorpusQueries.alsAlternation(spark, sf).collect()
      .map(r => r.getString(0) -> Array(r.getDouble(1), r.getDouble(2))).toMap
    val ratings = Tables.load(spark, sf, "events")
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2).toDouble))
    def x0(item: String) = Array(
      ((h56(item) % 7) + 1).toDouble / 8.0,
      ((h56(item) % 11) + 1).toDouble / 16.0)
    def obj(items: String => Array[Double]) = {
      val sq = ratings.map { case (u, i, v) =>
        val p = userF(u).zip(items(i)).map { case (a, b) => a * b }.sum
        (v - p) * (v - p)
      }.sum
      val regU = userF.values.map(f => f.map(x => x * x).sum).sum
      val regI = ratings.map(_._2).distinct
        .map(i => items(i).map(x => x * x).sum).sum
      sq + lambda * (regU + regI)
    }
    val before = obj(x0)
    val after = obj(itemG)
    assert(after <= before + 1e-9,
      s"item step must not increase the objective: $before -> $after")
    assert(after < before, "fixture should show a strict improvement")
  }
}
