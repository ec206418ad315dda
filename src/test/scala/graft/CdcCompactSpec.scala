package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** Fixture spec for X154 CDC compaction: all four net rules — created-
  * then-deleted vanishes, delete of a pre-existing key nets to D,
  * insert+updates net to I with the LAST value, updates-only net to U. */
class CdcCompactSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")

  test("net rules: absent, D, I-with-last-value, U") {
    val log = Seq(
      (1L, "I", t(0), 1L, 10.0), (1L, "U", t(1), 2L, 11.0),
      (1L, "D", t(2), 3L, 12.0),                              // absent
      (2L, "U", t(0), 4L, 20.0), (2L, "D", t(1), 5L, 21.0),   // D
      (3L, "I", t(0), 6L, 30.0), (3L, "U", t(1), 7L, 31.0),   // I, v=31
      (4L, "U", t(0), 8L, 40.0), (4L, "U", t(1), 9L, 41.0)    // U, v=41
    ).toDF("k", "op", "ts", "seq", "v")
    val out = Temporal.cdcCompact(log, "k", "op", "ts", "seq", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), r.getLong(3)))).toMap
    assert(!out.contains(1L), "create+delete inside the window must vanish")
    assert(out(2L) == (("D", None, 2L)))
    assert(out(3L) == (("I", Some(31.0), 2L)))
    assert(out(4L) == (("U", Some(41.0), 2L)))
  }

  test("10k-touch key still produces one merge row") {
    val log = ((0 until 10000).map(i => (7L, "U", t(i % 60), i.toLong, i.toDouble))
      :+ ((7L, "I", t(0), -1L, 0.0)))
      .toDF("k", "op", "ts", "seq", "v")
    val out = Temporal.cdcCompact(log, "k", "op", "ts", "seq", "v").collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "I" && out.head.getLong(3) == 10001L)
  }
}
