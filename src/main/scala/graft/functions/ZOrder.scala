package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for two-dimensional data clustering.
  *
  * Range-clustering on ONE key (Sinks.writeClustered) gives perfect
  * file-level min/max skipping on that key and none on any other; a
  * Z-order interleave gives useful skipping on BOTH keys at once — the
  * standard layout trick for fact tables filtered by two independent
  * dimensions (customer × day, tenant × time).
  *
  * Built from plain `functions._` bit arithmetic — whole-stage codegen'd,
  * and every intermediate stays under 2^33, so the math is exact (and
  * ANSI-safe) on 64-bit integers in any engine; the DuckDB oracle runs
  * the identical shift/mask cascade.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions of a 32-bit
    * lane (classic mask cascade). */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    (d.bitwiseOR(shiftleft(d, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton value interleaving the low 16 bits of `a` (even
    * positions) and `b` (odd positions). Callers quantize wider domains
    * to 16 bits first — for clustering, relative order within the
    * domain is what matters, not full precision. */
  def zValue(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))
}
