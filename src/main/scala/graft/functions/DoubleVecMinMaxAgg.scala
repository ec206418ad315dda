package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise (min, max) of an `array<double>` column as ONE imperative
  * aggregate — the stats kernel for array-native quantization (X75):
  * per-dimension extrema come out of a single pass over the VECTOR rows
  * with a fixed 2d-double buffer per map task, instead of posexploding
  * |rows|·d cells through a groupBy(dim) shuffle just to reduce them
  * back to d rows. min/max are associative, commutative and EXACT on
  * doubles (no rounding, unlike a float sum), so the result is layout-
  * and merge-order-independent — bit-equal to what the exploded
  * formulation or a SQL oracle computes per cell.
  *
  * Output layout: `[min(0)..min(d-1), max(0)..max(d-1)]` (length 2d).
  * Dimension comes from the first non-null input; inputs of differing
  * length are ignored (defensive — embedding columns are fixed-width).
  */
case class DoubleVecMinMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DoubleVecMinMaxAgg.Buf] with UnaryLike[Expression] {

  import DoubleVecMinMaxAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(null, null)

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (buffer.mn == null) {
        buffer.mn = new Array[Double](d)
        buffer.mx = new Array[Double](d)
        var i = 0
        while (i < d) {
          val x = arr.getDouble(i)
          buffer.mn(i) = x; buffer.mx(i) = x; i += 1
        }
      } else if (buffer.mn.length == d) {
        var i = 0
        while (i < d) {
          val x = arr.getDouble(i)
          if (x < buffer.mn(i)) buffer.mn(i) = x
          if (x > buffer.mx(i)) buffer.mx(i) = x
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    if (b2.mn != null) {
      if (b1.mn == null) { b1.mn = b2.mn.clone(); b1.mx = b2.mx.clone() }
      else if (b1.mn.length == b2.mn.length) {
        var i = 0
        while (i < b1.mn.length) {
          if (b2.mn(i) < b1.mn(i)) b1.mn(i) = b2.mn(i)
          if (b2.mx(i) > b1.mx(i)) b1.mx(i) = b2.mx(i)
          i += 1
        }
      }
    }
    b1
  }

  override def eval(buffer: Buf): Any = {
    if (buffer.mn == null) null
    else {
      val d = buffer.mn.length
      val out = new Array[Any](2 * d)
      var i = 0
      while (i < d) { out(i) = buffer.mn(i); out(d + i) = buffer.mx(i); i += 1 }
      new GenericArrayData(out)
    }
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val d = if (buffer.mn == null) 0 else buffer.mn.length
    val bb = ByteBuffer.allocate(4 + d * 16)
    bb.putInt(d)
    var i = 0
    while (i < d) { bb.putDouble(buffer.mn(i)); i += 1 }
    i = 0
    while (i < d) { bb.putDouble(buffer.mx(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt()
    if (d == 0) new Buf(null, null)
    else {
      val mn = new Array[Double](d)
      val mx = new Array[Double](d)
      var i = 0
      while (i < d) { mn(i) = bb.getDouble(); i += 1 }
      i = 0
      while (i < d) { mx(i) = bb.getDouble(); i += 1 }
      new Buf(mn, mx)
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "double_vec_minmax"

  override def withNewMutableAggBufferOffset(newOffset: Int): DoubleVecMinMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DoubleVecMinMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DoubleVecMinMaxAgg =
    copy(child = newChild)
}

object DoubleVecMinMaxAgg {
  /** Mutable elementwise extrema buffer; allocated on first input. */
  final class Buf(var mn: Array[Double], var mx: Array[Double])
}
