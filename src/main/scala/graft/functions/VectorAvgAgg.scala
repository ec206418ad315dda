package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise mean of an `array<double>` column as ONE imperative
  * aggregate: buffer = (count, sum[dim]), update is a tight vector add,
  * merge is elementwise. Replaces the posexplode → groupBy(pos) →
  * re-assemble pipeline (two shuffles, |rows|·dim intermediate records)
  * with a single partial-aggregatable pass whose shuffle payload is one
  * (dim+1)-double buffer per group — the mergeable-state shape that holds
  * at 100 TB. Dimension is taken from the first non-null input; inputs of
  * differing length are ignored (defensive — embeddings are fixed-width).
  */
case class VectorAvgAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvgAgg.Buf] with UnaryLike[Expression] {

  import VectorAvgAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(0L, null)

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buffer.sum == null) buffer.sum = new Array[Double](d)
      if (buffer.sum.length == d) {
        var i = 0
        while (i < d) { buffer.sum(i) += arr.getDouble(i); i += 1 }
        buffer.count += 1L
      }
    }
    buffer
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    if (b2.sum != null) {
      if (b1.sum == null) { b1.sum = b2.sum; b1.count = b2.count }
      else if (b1.sum.length == b2.sum.length) {
        var i = 0
        while (i < b1.sum.length) { b1.sum(i) += b2.sum(i); i += 1 }
        b1.count += b2.count
      }
    }
    b1
  }

  override def eval(buffer: Buf): Any = {
    if (buffer.sum == null || buffer.count == 0L) null
    else {
      val out = new Array[Any](buffer.sum.length)
      var i = 0
      while (i < out.length) { out(i) = buffer.sum(i) / buffer.count; i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val d = if (buffer.sum == null) 0 else buffer.sum.length
    val bb = ByteBuffer.allocate(8 + 4 + d * 8)
    bb.putLong(buffer.count).putInt(d)
    var i = 0
    while (i < d) { bb.putDouble(buffer.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val d = bb.getInt()
    if (d == 0) new Buf(count, null)
    else {
      val sum = new Array[Double](d)
      var i = 0
      while (i < d) { sum(i) = bb.getDouble(); i += 1 }
      new Buf(count, sum)
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_avg"

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorAvgAgg =
    copy(child = newChild)
}

object VectorAvgAgg {
  /** Mutable (count, sum) pair; sum allocated on first input. */
  final class Buf(var count: Long, var sum: Array[Double])
}
