package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Fixture spec for X164 attribution: first- and last-touch disagree on
  * a long journey, a purchase with no prior touch credits 'direct', and
  * a later purchase's window still sees the pre-first-purchase touches.
  * Driven through a temp-table clone of the query body via the same
  * window device. */
class AttributionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("journey credit: first vs last diverge; direct fallback") {
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val events = Seq(
      // u1: view → click → purchase : first=view, last=click
      (1L, "u1", at(1), "view"), (2L, "u1", at(2), "click"),
      (3L, "u1", at(3), "purchase"),
      // u2: immediate purchase → direct
      (4L, "u2", t0, "purchase"),
      // u1 second purchase later: first still view, last now purchase?
      // no — purchases are excluded from touches; last = click
      (5L, "u1", at(9), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    events.createOrReplaceTempView("__attr")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val conv = events
      .withColumn("first_touch",
        coalesce(first(touch, ignoreNulls = true).over(w), lit("direct")))
      .withColumn("last_touch",
        coalesce(last(touch, ignoreNulls = true).over(w), lit("direct")))
      .where(col("event_type") === "purchase")
      .collect().map(r => (r.getLong(0),
        r.getAs[String]("first_touch"), r.getAs[String]("last_touch")))
    val byId = conv.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(3L) == (("view", "click")))
    assert(byId(4L) == (("direct", "direct")))
    assert(byId(5L) == (("view", "click")),
      "purchases never count as touches; the journey's clicks persist")
  }
}
