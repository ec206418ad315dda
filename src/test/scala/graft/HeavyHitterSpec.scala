package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Fixture specs for X129 exact heavy hitters: the MG summary's bounded
  * state and superset guarantee under vocab ≫ k, and the exactness of
  * the recounted output — the properties the DuckDB hash gate replays
  * but cannot explain. */
class HeavyHitterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("vocab >> k: exactly the > n/k items surface, counts exact") {
    // 2 heavy items (400 + 300 of n=1000) drowned in 300 near-unique
    // tail items; k=8 → threshold n/8 = 125
    val rows = Seq.fill(400)("heavy_a") ++ Seq.fill(300)("heavy_b") ++
      (0 until 300).map(i => s"tail_$i")
    val out = Sketches.heavyHitters(rows.toDF("item"), "item", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("heavy_a", 400L, 1000L), ("heavy_b", 300L, 1000L)))
  }

  test("adversarial order: heavies arriving LAST still surface") {
    // the tail fills all k counters first; decrements must evict it
    val rows = (0 until 500).map(i => s"t_$i") ++ Seq.fill(600)("late_heavy")
    val out = Sketches.heavyHitters(
      rows.toDF("item").repartition(1), "item", k = 8)
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("late_heavy"))
  }

  test("merge across many partitions preserves the guarantee") {
    val rows = Seq.fill(250)("h") ++ (0 until 750).map(i => s"t_${i % 400}")
    val out = Sketches.heavyHitters(
      rows.toDF("item").repartition(16), "item", k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("h", 250L)))
  }

  test("no item above threshold: empty result, not a crash") {
    val rows = (0 until 640).map(i => s"u_${i % 320}") // all cnt=2, n/k=10
    assert(Sketches.heavyHitters(rows.toDF("item"), "item", k = 64).count() == 0L)
  }
}
