package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X166 RANGE frames: value-based frame semantics that
  * a ROWS frame gets wrong — events just inside/outside the hour bound,
  * peer rows in the same second excluded, gaps not sliding the frame. */
class RollingRangeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  test("strict trailing hour: boundary, peers, and gaps behave by value") {
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val ev = Seq(
      (1L, "u", t(0), 1.0),     // base
      (2L, "u", t(3600), 1.0),  // exactly 1h later: bounds are INCLUSIVE, base at −3600 is in
      (3L, "u", t(3599), 1.0),  // 59:59 later: base INSIDE
      (4L, "u", t(3599), 1.0),  // peer second of 3: excluded from each other
      (5L, "u", t(7300), 1.0)   // after a gap: frame empty
    ).toDF("event_id", "user_id", "ts", "value")
    val w = Window.partitionBy("user_id")
      .orderBy(expr("unix_micros(ts) div 1000000"))
      .rangeBetween(-3600L, -1L)
    val out = ev.select(col("event_id"), count(lit(1)).over(w).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0)
    // event 2 at +3600: frame [0, 3599] contains events at 0, 3599, 3599
    assert(out(2L) == 3)
    // events 3/4 at +3599: frame [−1, 3598] contains only the base
    assert(out(3L) == 1 && out(4L) == 1,
      "peer rows in the same second must not see each other")
    assert(out(5L) == 0, "a gap empties a value-based frame")
  }
}
