package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Fixture spec for X138 sliding KMV distinct: date-range window
  * semantics (gap days SHRINK the window content — rows-frame would
  * slide), sub-k exactness, and merge correctness across days. */
class SlidingDistinctSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ev(day: Int, users: Seq[String]) =
    users.map(u => (u, Timestamp.valueOf(f"2024-02-$day%02d 09:00:00")))

  test("window unions distinct users across days; overlap not double-counted") {
    val events = (ev(1, Seq("a", "b")) ++ ev(2, Seq("b", "c")) ++
      ev(3, Seq("a", "d", "e"))).toDF("user_id", "ts")
    val out = Sketches.kmvSlidingDailyDistinct(events, "user_id", "ts",
        k = 256, windowDays = 7)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("est_distinct"),
          r.getAs[Boolean]("is_exact")))).toMap
    assert(out("2024-02-01") == ((1L, 2.0, true)))
    assert(out("2024-02-02") == ((2L, 3.0, true)))  // a,b,c
    assert(out("2024-02-03") == ((3L, 5.0, true)))  // a..e
  }

  test("gap day shrinks the date-range window instead of sliding it") {
    // days 1 and 9 are > 7 apart: day 9's window must NOT reach day 1
    val events = (ev(1, Seq("a", "b", "c")) ++ ev(9, Seq("z")))
      .toDF("user_id", "ts")
    val out = Sketches.kmvSlidingDailyDistinct(events, "user_id", "ts",
        k = 256, windowDays = 7)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Double]("est_distinct")).toMap
    assert(out("2024-02-09") == 1.0)
  }

  test("k below cardinality flips to estimate mode, flagged inexact") {
    val events = ev(1, (0 until 300).map(i => s"u$i")).toDF("user_id", "ts")
    val r = Sketches.kmvSlidingDailyDistinct(events, "user_id", "ts",
      k = 64, windowDays = 7).collect().head
    assert(!r.getAs[Boolean]("is_exact"))
    val est = r.getAs[Double]("est_distinct")
    assert(est > 150 && est < 600, s"estimate $est out of tolerance for 300")
  }
}
