package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values / bottom-k) distinct-count sketch over 56-bit
  * hashes: the buffer keeps the k smallest DISTINCT hash values seen, and
  * the k-th smallest order statistic estimates the distinct count as
  * `(k-1) · 2^56 / h_k` (Bar-Yossef et al., RANDOM'02). When fewer than k
  * distinct hashes exist the buffer IS the distinct set and the count is
  * exact — so the sketch degrades to exactness on small groups.
  *
  * Why this next to HLL (X22): the KMV state is a value sample, not a
  * register array, which makes it (a) integer-exact and reproducible in
  * any engine that can sort hashes — the whole estimate is one division
  * on one order statistic, so a SQL oracle replays it bit-for-bit — and
  * (b) closed under set operations (intersecting two bottom-k sets gives
  * a Jaccard estimator for free). Scale shape: O(k) state per group,
  * partial aggregation folds each map task's slice, the exchange carries
  * ≤ k longs per (mapper, group); merge = set-union + retruncate,
  * associative and commutative, so shard-by-shard sketching composes
  * losslessly regardless of layout.
  *
  * Evaluates to the sorted bottom-k hash array (`array<bigint>`) — the
  * storable/mergeable form; callers derive the estimate with plain
  * column arithmetic (see `Sketches.kmvDistinctChecked`), keeping the
  * estimator's arithmetic visible to the oracle.
  */
case class KmvAgg(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Buf] with UnaryLike[Expression] {

  require(k > 1, s"k=$k must be > 1")

  override def createAggregationBuffer(): KmvAgg.Buf = new KmvAgg.Buf(k)

  override def update(buffer: KmvAgg.Buf, input: InternalRow): KmvAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: KmvAgg.Buf, b2: KmvAgg.Buf): KmvAgg.Buf = {
    val it = b2.set.iterator()
    while (it.hasNext) b1.add(it.next())
    b1
  }

  override def eval(buffer: KmvAgg.Buf): Any = {
    val out = new Array[Any](buffer.set.size())
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: KmvAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.set.size() * 8)
    bb.putInt(buffer.set.size())
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new KmvAgg.Buf(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  /** Bounded distinct-set buffer: the k smallest distinct longs seen. */
  final class Buf(k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
    def add(h: Long): Unit = {
      if (set.size() < k) { set.add(h); () }
      else if (h < set.last()) {
        if (set.add(h)) { set.pollLast(); () }
      }
    }
  }
}
