package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries '82; mergeability per
  * Agarwal et al., PODS'12): at most `k` counters; an unseen item either
  * takes a free counter or decrements ALL counters (dropping zeros). The
  * guarantee: every item with true count > n/k is IN the summary, and each
  * kept counter undercounts by at most n/k.
  *
  * Why this next to CMS top-k (X22 family): the CMS needs a candidate-set
  * pass anyway (a sketch can't enumerate), while the MG summary IS the
  * candidate enumeration — O(k) state, one pass, deterministic, no hash
  * collisions to reason about. The production top-k pattern at 100 TB is
  * MG-prefilter → broadcast the ≤k candidates → exact recount restricted
  * to them ([[graft.operators.Sketches.heavyHitters]]) — the full-vocab
  * shuffle an exact global top-k would pay never happens, and the FINAL
  * output is exact, so the DuckDB oracle gates it bit-for-bit.
  *
  * merge: counter-wise sum, then subtract the (k+1)-largest total from
  * every counter and drop non-positives — the PODS'12 mergeable-summary
  * reduction, associative enough that partial aggregation over any
  * partitioning preserves the n/k guarantee. eval: the candidate items,
  * lexicographically sorted — counters intentionally NOT emitted by
  * default (they are lower bounds, and the exact recount replaces
  * them); `emitCounts = true` emits (item, counter) structs, the
  * mergeable form the streaming state table persists
  * ([[graft.streaming.CorpusStreams.heavyHitterIngest]]).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int = 64,
    emitCounts: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 1, s"k=$k must be > 1")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of the reused UTF8String backing buffer
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k => buf.update(s, 1L)
        case None => decrementAll(buf, 1L)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (s, c) =>
      b1.update(s, b1.getOrElse(s, 0L) + c)
    }
    if (b1.size > k) {
      // (k+1)-th largest counter value: everything at or below it may be
      // an artifact of the merge; subtracting it preserves the error
      // bound (err_1 + err_2 ≤ n/k overall)
      val sorted = b1.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - k - 1)
      decrementAll(b1, cut)
    }
    b1
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (s, c) =>
      if (c <= by) dead += s else buf.update(s, c - by)
    }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    val out = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) {
      out(i) =
        if (emitCounts)
          InternalRow(UTF8String.fromString(keys(i)), buf(keys(i)))
        else UTF8String.fromString(keys(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    if (emitCounts)
      ArrayType(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))),
        containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
