package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoVisit

/** Fixture spec for X137 co-visitation: session scoping (items in
  * DIFFERENT sessions of the same user never pair), within-session
  * dedup (a repeated item counts once per session), and the exact-ratio
  * lift arithmetic. */
class CoVisitSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("pairs are session-scoped, deduped, lift exact") {
    val events = Seq(
      // u1 session 1: {a, b, b} → pair (a,b) once despite repeated b
      ("u1", t(0), "a"), ("u1", t(1), "b"), ("u1", t(2), "b"),
      // u1 session 2 (gap > 30 min): {c} — no pair with session 1 items
      ("u1", t(60), "c"),
      // u2 session 1: {a, b}
      ("u2", t(0), "a"), ("u2", t(1), "b")
    ).toDF("user_id", "ts", "event_type")
    val out = CoVisit.pairs(events, "user_id", "ts", "event_type",
      gapSeconds = 1800, minSupport = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("item_a") == "a" && r.getAs[String]("item_b") == "b")
    assert(r.getAs[Long]("n_ab") == 2 && r.getAs[Long]("n_sessions") == 3)
    // lift = n_ab·n_sessions / (n_a·n_b) = 2·3/(2·2) = 1.5, exact
    assert(r.getAs[Double]("lift") == 1.5)
  }

  test("support threshold prunes singleton pairs") {
    val events = Seq(("u1", t(0), "a"), ("u1", t(1), "b"))
      .toDF("user_id", "ts", "event_type")
    assert(CoVisit.pairs(events, "user_id", "ts", "event_type",
      gapSeconds = 1800, minSupport = 2).count() == 0)
  }
}
