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
    // Gram hashing over BYTE SLICES of the one input buffer (round 13
    // allocation-rate work): the previous form split to token Strings
    // and built each gram through StringBuilder→String→UTF8String→
    // byte[] — five allocations per gram, millions per partition. A
    // split segment's byte range in the ORIGINAL buffer is exactly the
    // gram text (segments are separated by exactly one ' ' each, and
    // multibyte UTF-8 units never contain 0x20), so gram i..j hashes as
    // hash(bytes, start(i), end(j) − start(i)) with zero allocation.
    // Token boundaries replicate Java split(' ') exactly: split on
    // EVERY space (empty segments kept), then trailing empty segments
    // dropped.
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nSeg = 1
    var p = 0
    while (p < bytes.length) { if (bytes(p) == ' '.toByte) nSeg += 1; p += 1 }
    val starts = new Array[Int](nSeg)
    val ends = new Array[Int](nSeg)
    var segStart = 0
    var idx = 0
    p = 0
    while (p <= bytes.length) {
      if (p == bytes.length || bytes(p) == ' '.toByte) {
        starts(idx) = segStart; ends(idx) = p; idx += 1; segStart = p + 1
      }
      p += 1
    }
    var nTok = nSeg
    while (nTok > 0 && starts(nTok - 1) == ends(nTok - 1)) nTok -= 1
    val nGrams = math.max(nTok - k, 0) + 1
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      // gram i = segments[i .. min(i+k, nTok)−1]; empty-text edge:
      // nTok == 0 hashes the empty slice, the split("")==[""] behavior
      hs(i) =
        if (nTok == 0) Md5Hash56.hash(bytes, 0, 0)
        else {
          val from = starts(i)
          val to = ends(math.min(i + k, nTok) - 1)
          Md5Hash56.hash(bytes, from, to - from)
        }
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
