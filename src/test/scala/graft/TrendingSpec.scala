package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decay

/** Fixture spec for X159 trending: a key whose volume is recent must
  * out-rank an equal-total key whose volume is old under the FAST
  * horizon, while the slow horizon ranks them closer — the rank delta
  * is the rising signal. Exercised through the decay operator the
  * query composes. */
class TrendingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("recent volume wins the fast horizon") {
    def ev(k: String, day: Int, n: Int) =
      (0 until n).map(i => (s"$k-$day-$i", k,
        Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")))
    // riser: 30 events today; faded: 30 events 20 days ago
    val events = (ev("riser", 21, 30) ++ ev("faded", 1, 30) ++ ev("ref", 21, 1))
      .toDF("event_id", "user_id", "ts")
    def score(hl: Int) = Decay.decayedCounts(events, "user_id", "ts", hl)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("decayed_count")).toMap
    val fast = score(2)
    assert(fast("riser") > 10 * fast("faded"),
      s"fast horizon must favor recency: $fast")
    val slow = score(14)
    assert(slow("riser") / slow("faded") < fast("riser") / fast("faded"),
      "slow horizon compresses the recency advantage")
  }
}
