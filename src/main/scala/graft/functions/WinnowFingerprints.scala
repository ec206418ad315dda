package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken '03,
  * "Winnowing: Local Algorithms for Document Fingerprinting") over a
  * single-space-tokenized string, as one expression pass.
  *
  * Selection rule, exactly the paper's: hash every word `k`-gram
  * (gram i = tokens[i..i+k-1], the [[NGramShingles]] position
  * convention, hashed with [[Md5Hash56]]), slide a window of `w`
  * consecutive gram hashes, and in each window select the minimum hash
  * — RIGHTMOST position on ties. Guarantees: every shared run of at
  * least w+k-1 tokens between two documents yields at least one shared
  * selected fingerprint, and no fingerprint gap exceeds w positions —
  * the density/recall contract ad-hoc "every w-th hash" sampling lacks.
  *
  * The declarative formulation (positions × windows join + per-window
  * argmin) shuffles n·w cells per document; this expression selects in
  * one O(n·w) local scan per row — no shuffle, one eval per document —
  * and emits the DISTINCT selected (pos, fp) pairs in position order
  * (winnowing selections are non-decreasing in position; adjacent
  * windows mostly re-select the same gram, which is where the
  * compression comes from).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"winnow: k=$k w=$w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    val nGrams = math.max(toks.length - k, 0) + 1
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val end = math.min(i + k, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      hs(i) = Md5Hash56.hash(UTF8String.fromString(sb.toString))
      i += 1
    }
    val nWin = math.max(nGrams - w, 0) + 1
    val selPos = new scala.collection.mutable.ArrayBuffer[Int](nWin)
    var lastSel = -1
    var jw = 0
    while (jw < nWin) {
      val end = math.min(jw + w, nGrams)
      var best = jw
      var p = jw + 1
      while (p < end) {
        if (hs(p) <= hs(best)) best = p // rightmost minimum
        p += 1
      }
      if (best != lastSel) { selPos += best; lastSel = best }
      jw += 1
    }
    val out = new Array[Any](selPos.length)
    var o = 0
    while (o < selPos.length) {
      out(o) = InternalRow(selPos(o), hs(selPos(o)))
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
