package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a single imperative aggregate.
  *
  * Expressing the signature as `numHashes` separate `min()` aggregates
  * generates one huge codegen'd aggregate (64 buffer slots -> multi-second
  * janino compiles and hugeMethodLimit fallback risk). This aggregate
  * keeps one `long[numHashes]` buffer and updates all permutations in a
  * tight loop per input hash — one pass, mergeable partial state (the
  * elementwise min), fixed-size serialization.
  *
  * Permutation family: splitmix64 finalizer over `h + (i+1)·golden`
  * (64-bit wrapping arithmetic). An earlier affine family
  * `(x·(2i+1) + b_i) mod 2^59` was order-PRESERVING wherever `x` is
  * below `2^59/(2i+1)` (no modular wrap) — the low-index permutations
  * all picked the same minimal shingle, so one differing shingle flipped
  * every low band at once and a 0.98-Jaccard pair could (and did, at
  * sf0.1) miss all LSH bands. Signatures are engine-internal — LSH
  * candidates are exact-verified before emission — so the mixer needs no
  * cross-engine arithmetic twin, only min-wise quality.
  *
  * Input: the 55-bit shingle hash column. Output: array<long> signature
  * (non-negative: the sign bit is cleared so downstream band keys are
  * stable strings).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes > 0 && numHashes <= 64)

  private val golden = 0x9E3779B97F4A7C15L

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val p = mix(h + (i + 1) * golden)
        if (p < buffer(i)) buffer(i) = p
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    var i = 0
    while (i < numHashes) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
