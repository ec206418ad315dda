package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min frequency sketch over a 56-bit hash column.
  *
  * The mergeable-sketch answer to "how often does each key occur" when
  * the key space is too large for an exact group-by to be cheap: a
  * `depth × width` counter grid, each input incrementing one counter per
  * row (index = row-seeded mix of the key hash), point estimate = MIN
  * over the depth counters. Estimates never undercount; overcount is
  * bounded by collisions (~N/width per row, the min over `depth`
  * independent rows in practice far less).
  *
  * Scale shape: single pass, fixed `depth·width·8`-byte state
  * (64 KiB at the 4×2048 default) regardless of input size — partial
  * aggregation means each map task folds its slice locally and the
  * exchange carries one sketch per partition, the same control-plane
  * cost envelope as HLL ([[graft.operators.Sketches]]). Counter merge is
  * elementwise sum, so sketches of disjoint slices compose losslessly —
  * the property that lets a 100 TB corpus be sketched shard-by-shard.
  *
  * The row-seed mixer is the same splitmix64 finalizer family as
  * [[MinHashAgg]]; sketches are engine-internal (queries gate the
  * estimate against exact counts, they never hash-compare the sketch
  * itself), so no cross-engine arithmetic twin is needed.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"depth=$depth")
  require(width > 1, s"width=$width")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buffer(d * width + CountMin.cell(h, d, width)) += 1L
        d += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min_sketch_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMin {
  private val golden = 0x9E3779B97F4A7C15L

  /** Counter column for hash `h` in sketch row `d` — splitmix64 finalizer
    * over a row-offset seed, reduced mod width. JVM wrapping arithmetic
    * (deliberately NOT an SQL expression: ANSI mode would throw on the
    * wrap this mixer depends on). */
  def cell(h: Long, d: Int, width: Int): Int = {
    var z = h + (d + 1) * golden
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (((z ^ (z >>> 31)) & Long.MaxValue) % width).toInt
  }

  /** Point-estimate lookup: min over the depth counters for `hash`.
    * Interpreter-evaluated ([[CodegenFallback]]) by design — estimates
    * are probed for the handful of keys a report surfaces (top-k rows,
    * not the corpus), never in a per-row hot path. */
  case class Estimate(sketch: Expression, hash: Expression,
      depth: Int = 4, width: Int = 2048)
    extends Expression with BinaryLike[Expression] with CodegenFallback {

    override def left: Expression = sketch
    override def right: Expression = hash
    override def checkInputDataTypes(): TypeCheckResult =
      (sketch.dataType, hash.dataType) match {
        case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, bigint), got $other")
      }
    override def prettyName: String = "count_min_estimate"
    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override def eval(input: InternalRow): Any = {
      val s = sketch.eval(input)
      val h = hash.eval(input)
      if (s == null || h == null) null
      else {
        val arr = s.asInstanceOf[ArrayData]
        val hv = h.asInstanceOf[Long]
        var best = Long.MaxValue
        var d = 0
        while (d < depth) {
          val c = arr.getLong(d * width + cell(hv, d, width))
          if (c < best) best = c
          d += 1
        }
        best
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Estimate =
      copy(sketch = newLeft, hash = newRight)
  }
}
