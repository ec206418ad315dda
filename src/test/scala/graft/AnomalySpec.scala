package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture spec for X134 trailing-window anomaly scores: a planted spike
  * trips the |z|>2 flag against a stable baseline, constant baselines
  * produce z=0 (var=0 guard), and the frame counts OBSERVED days (a gap
  * day shifts the window rather than shrinking it). */
class AnomalySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def events(counts: Seq[(String, Int, Int)]) = // (type, day, n)
    counts.flatMap { case (t, d, n) =>
      (0 until n).map(i =>
        (s"$t-$d-$i", Timestamp.valueOf(f"2024-01-${d}%02d 12:00:00"), t))
    }.toDF("event_id", "ts", "event_type")

  private def run(df: org.apache.spark.sql.DataFrame) =
    graft.operators.Anomaly.trailingZScores(df, "event_type", "ts").collect()

  test("planted spike trips the flag; stable days do not") {
    val base = (1 to 8).map(d => ("click", d, if (d % 2 == 0) 11 else 9))
    val out = run(events(base :+ (("click", 9, 60)))) // 6× spike on day 9
    val spike = out.find(_.getAs[java.sql.Date]("day").toString == "2024-01-09").get
    assert(spike.getAs[Boolean]("is_anomaly") && spike.getAs[Double]("z") > 2.0)
    assert(out.filterNot(_ eq spike).forall(!_.getAs[Boolean]("is_anomaly")))
  }

  test("constant baseline: var=0 guard yields z=0, no flag") {
    val out = run(events((1 to 9).map(d => ("view", d, 10))))
    assert(out.nonEmpty && out.forall(r =>
      r.getAs[Double]("z") == 0.0 && !r.getAs[Boolean]("is_anomaly")))
  }

  test("gap days shift the observed-rows frame instead of shrinking it") {
    // days 1..7 then a gap (no day 8), then day 9: day 9's frame is the
    // 7 OBSERVED rows 1..7 → it still emits (c=7)
    val out = run(events((1 to 7).map(d => ("buy", d, 10)) :+ (("buy", 9, 10))))
    assert(out.map(_.getAs[java.sql.Date]("day").toString).toSeq ==
      Seq("2024-01-09"))
  }
}
