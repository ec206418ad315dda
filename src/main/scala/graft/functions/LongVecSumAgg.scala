package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise sum of an `array<bigint>` column as ONE imperative
  * aggregate — the reduction kernel behind the distributed Gram-matrix /
  * covariance pass (X65 family): each row contributes a fixed-width
  * vector of integer-scaled products, partials fold locally, and the
  * exchange carries ONE d-long buffer per map task instead of |rows|·d
  * exploded cells through a groupBy(cell) shuffle. Long addition is
  * associative and commutative, so the result is layout- and
  * merge-order-independent — which is what lets integer-scaled float
  * reductions hash-match a SQL oracle bit-for-bit where a double sum
  * would depend on partition order. Dimension comes from the first
  * non-null input; inputs of differing length are ignored (defensive —
  * callers build fixed-width product vectors).
  */
case class LongVecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVecSumAgg.Buf] with UnaryLike[Expression] {

  import LongVecSumAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(null)

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buffer.sum == null) buffer.sum = new Array[Long](d)
      if (buffer.sum.length == d) {
        var i = 0
        while (i < d) { buffer.sum(i) += arr.getLong(i); i += 1 }
      }
    }
    buffer
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    if (b2.sum != null) {
      // defensive copy: aliasing b2's array would let later merges
      // mutate the input buffer's state in place — safe under the
      // current freshly-deserialized-per-row call pattern, but wrong
      // the moment a caller reuses b2
      if (b1.sum == null) b1.sum = b2.sum.clone()
      else if (b1.sum.length == b2.sum.length) {
        var i = 0
        while (i < b1.sum.length) { b1.sum(i) += b2.sum(i); i += 1 }
      }
    }
    b1
  }

  override def eval(buffer: Buf): Any = {
    if (buffer.sum == null) null
    else {
      val out = new Array[Any](buffer.sum.length)
      var i = 0
      while (i < out.length) { out(i) = buffer.sum(i); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val d = if (buffer.sum == null) 0 else buffer.sum.length
    val bb = ByteBuffer.allocate(4 + d * 8)
    bb.putInt(d)
    var i = 0
    while (i < d) { bb.putLong(buffer.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    if (d == 0) new Buf(null)
    else {
      val sum = new Array[Long](d)
      var i = 0
      while (i < d) { sum(i) = bb.getLong(); i += 1 }
      new Buf(sum)
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "long_vec_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVecSumAgg =
    copy(child = newChild)
}

object LongVecSumAgg {
  /** Mutable elementwise-sum buffer; allocated on first input. */
  final class Buf(var sum: Array[Long])
}
