package graft

import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GapFill

/** Fixture spec for X139 gap-fill: exact interpolation values across a
  * multi-day gap, observed rows passing through untouched, and per-key
  * calendar scoping (no extrapolation beyond a key's observed span). */
class GapFillSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("interior gaps interpolate linearly; observed rows pass through") {
    val daily = Seq(
      ("a", Date.valueOf("2024-03-01"), 10L),
      ("a", Date.valueOf("2024-03-04"), 40L), // 2-day gap: 20, 30
      ("a", Date.valueOf("2024-03-05"), 39L),
      ("b", Date.valueOf("2024-03-02"), 7L)   // singleton span: no gap rows
    ).toDF("event_type", "day", "n")
    val out = GapFill.linearDaily(daily, "event_type")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getBoolean(3))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      ("a", "2024-03-01", 10.0, false),
      ("a", "2024-03-02", 20.0, true),
      ("a", "2024-03-03", 30.0, true),
      ("a", "2024-03-04", 40.0, false),
      ("a", "2024-03-05", 39.0, false),
      ("b", "2024-03-02", 7.0, false)))
  }

  test("fractional interpolation is exact-operand double arithmetic") {
    val daily = Seq(
      ("x", Date.valueOf("2024-03-01"), 1L),
      ("x", Date.valueOf("2024-03-04"), 2L)
    ).toDF("event_type", "day", "n")
    val got = GapFill.linearDaily(daily, "event_type")
      .where($"is_interpolated").orderBy("day")
      .collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(1.0 + 1.0 / 3.0, 1.0 + 2.0 / 3.0))
  }
}
