package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** q-digest quantile sketch (Shrivastava et al., SenSys'04) over a
  * bounded integer domain [0, 2^bits).
  *
  * The mergeable-sketch answer to "what is the p-th percentile" when the
  * exact rank machinery ([[graft.operators.Percentiles]]) is overkill or
  * the data arrives shard-by-shard: counts live on the nodes of a
  * conceptual complete binary tree over the value domain; compression
  * folds small families (child + sibling + parent ≤ n/σ) upward, so
  * popular values keep their own leaves while sparse regions collapse
  * into coarse ranges. Rank error of a quantile read is bounded by the
  * count absorbed on one root-to-leaf path: ≤ bits · n/σ, a FRACTION
  * (bits/σ) of n that shrinks as σ grows — and the bound is
  * deterministic, not probabilistic (no hash luck involved; every
  * operation here is deterministic, so results are reproducible
  * run-to-run and layout-independent by the merge algebra).
  *
  * Scale shape: state is O(σ·bits) node counts regardless of input size
  * (~3σ after compression in practice); partial aggregation folds each
  * map task's slice locally and the exchange carries one digest per
  * partition — the same control-plane envelope as HLL/CMS. Merge is
  * cell-wise count addition + recompress, associative and commutative up
  * to the compression invariant, which only ever moves counts UP the
  * tree (never across), so quantile bounds survive any merge order.
  *
  * Node ids: root 1 covers [0, 2^bits); node k at depth d covers the
  * (k - 2^d)-th slice of width 2^(bits-d); leaves are ids 2^bits + v.
  */
case class QDigestAgg(
    child: Expression,
    bits: Int = 24,
    sigma: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigest.Buffer] with UnaryLike[Expression] {

  require(bits > 0 && bits <= 40, s"bits=$bits out of (0,40]")
  require(sigma > 0, s"sigma=$sigma")

  override def createAggregationBuffer(): QDigest.Buffer = new QDigest.Buffer(bits, sigma)

  override def update(buffer: QDigest.Buffer, input: InternalRow): QDigest.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: QDigest.Buffer, b2: QDigest.Buffer): QDigest.Buffer = {
    b1.mergeIn(b2); b1
  }

  /** Emits [n, id1, count1, id2, count2, ...], ids ascending — the
    * storable sketch probed by [[QDigest.Quantile]]. */
  override def eval(buffer: QDigest.Buffer): Any =
    new GenericArrayData(buffer.toLongs)

  override def serialize(buffer: QDigest.Buffer): Array[Byte] = {
    val longs = buffer.toLongs
    val bb = ByteBuffer.allocate(longs.length * 8)
    longs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QDigest.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val longs = Array.fill(bytes.length / 8)(bb.getLong())
    QDigest.Buffer.fromLongs(longs, bits, sigma)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "qdigest_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QDigestAgg =
    copy(child = newChild)
}

/** [[QDigestAgg]] over a VALUE-COMPRESSED (value, count) stream: each
  * input row contributes `cnt` occurrences of `value` in one buffer op
  * (`counts(leaf) += cnt`), identical by the merge algebra to `cnt`
  * single adds. The right update path when the caller has already
  * reduced the raw stream to per-value counts (the q80 check derives
  * one compressed table and feeds the sketch, the rank recount and the
  * exact twin from it) — the digest state, bound, and stored form are
  * exactly [[QDigestAgg]]'s. */
case class QDigestWeightedAgg(
    value: Expression,
    cnt: Expression,
    bits: Int = 24,
    sigma: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigest.Buffer] with BinaryLike[Expression] {

  require(bits > 0 && bits <= 40, s"bits=$bits out of (0,40]")
  require(sigma > 0, s"sigma=$sigma")

  override def left: Expression = value
  override def right: Expression = cnt

  override def createAggregationBuffer(): QDigest.Buffer = new QDigest.Buffer(bits, sigma)

  override def update(buffer: QDigest.Buffer, input: InternalRow): QDigest.Buffer = {
    val v = value.eval(input)
    val c = cnt.eval(input)
    if (v != null && c != null)
      buffer.addN(v.asInstanceOf[Long], c.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: QDigest.Buffer, b2: QDigest.Buffer): QDigest.Buffer = {
    b1.mergeIn(b2); b1
  }

  override def eval(buffer: QDigest.Buffer): Any =
    new GenericArrayData(buffer.toLongs)

  override def serialize(buffer: QDigest.Buffer): Array[Byte] = {
    val longs = buffer.toLongs
    val bb = ByteBuffer.allocate(longs.length * 8)
    longs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QDigest.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val longs = Array.fill(bytes.length / 8)(bb.getLong())
    QDigest.Buffer.fromLongs(longs, bits, sigma)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "qdigest_weighted_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestWeightedAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestWeightedAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QDigestWeightedAgg =
    copy(value = newLeft, cnt = newRight)
}

object QDigest {

  /** Mutable digest state: node id → count, plus the running total. */
  final class Buffer(val bits: Int, val sigma: Int) {
    private[QDigest] val counts = mutable.LongMap.empty[Long]
    private[QDigest] var n = 0L
    private val leafBase = 1L << bits
    private val maxVal = leafBase - 1
    // Compression trigger, ADAPTIVE with a high floor: compressing is
    // O(live nodes × cascade depth) — folding a sparse leaf bubbles it
    // up many levels — so compressing eagerly at a small map size costs
    // more than it saves (measured: trigger 8σ re-compressed every few
    // thousand adds and was ~10× the update loop itself). The trigger
    // floor of 64K entries (~2 MB of LongMap) amortizes a compress over
    // tens of thousands of adds; when a compress can't shrink the map
    // below ¾ of the trigger the trigger doubles, capped at 2M entries
    // (~32 MB — and by then n is large enough that ⌊n/σ⌋ folds plenty).
    // Anything still uncompressed folds at serialize/eval time, so the
    // STORED digest is always the O(σ·bits) form.
    private var compressAt = math.max(16 * sigma, 1 << 16)
    private val compressAtCap = 1 << 21

    /** Values are clamped into the domain — a quantile sketch over
      * prices/lengths treats out-of-range as saturation, not an error. */
    def add(v: Long): Unit = addN(v, 1L)

    /** `cnt` occurrences of `v` in one map op — the value-compressed
      * update path ([[QDigestWeightedAgg]]); identical to `cnt` single
      * adds by the merge algebra. */
    def addN(v: Long, cnt: Long): Unit = {
      if (cnt <= 0L) return
      val c = if (v < 0) 0L else if (v > maxVal) maxVal else v
      counts(leafBase + c) = counts.getOrElse(leafBase + c, 0L) + cnt
      n += cnt
      if (counts.size >= compressAt) maybeGrow()
    }

    def mergeIn(other: Buffer): Unit = {
      other.counts.foreach { case (id, c) =>
        counts(id) = counts.getOrElse(id, 0L) + c
      }
      n += other.n
      maybeGrow()
    }

    private def maybeGrow(): Unit = {
      compress()
      if (counts.size > compressAt * 3 / 4 && compressAt < compressAtCap)
        compressAt *= 2
    }

    /** Fold families whose total fits in n/σ upward, level by level from
      * the leaves — the q-digest invariant. Deterministic: levels
      * descend, ids within a level ascend. ONE pass buckets the present
      * ids by level (newly created parents are appended to their level's
      * bucket as merges happen), so a compress is O(size + bits), not
      * the O(size · bits) of re-scanning the map per level — at ~580k
      * distinct inputs that difference measured 5× on the whole
      * aggregation. */
    def compress(): Unit = {
      val threshold = n / sigma
      if (threshold <= 0) return
      val perLevel = Array.fill(bits + 1)(mutable.ArrayBuilder.make[Long])
      counts.keysIterator.foreach { id =>
        val lvl = 63 - java.lang.Long.numberOfLeadingZeros(id)
        if (lvl >= 1 && lvl <= bits) perLevel(lvl) += id
      }
      var level = bits
      while (level >= 1) {
        val ids = perLevel(level).result()
        java.util.Arrays.sort(ids)
        var i = 0
        var lastBase = -1L
        while (i < ids.length) {
          val base = ids(i) & ~1L
          if (base != lastBase && base >= 2L) {
            lastBase = base
            val cl = counts.getOrElse(base, 0L)
            val cr = counts.getOrElse(base | 1L, 0L)
            val parent = base >> 1
            val cpOpt = counts.get(parent)
            val cp = cpOpt.getOrElse(0L)
            if (cl + cr > 0 && cl + cr + cp <= threshold) {
              counts(parent) = cp + cl + cr
              counts.remove(base)
              counts.remove(base | 1L)
              // a parent materialized by this merge must still be
              // considered at ITS level this same compress
              if (cpOpt.isEmpty && level - 1 >= 1) perLevel(level - 1) += parent
            }
          }
          i += 1
        }
        level -= 1
      }
    }

    /** [n, id, count, ...] with ids ascending (canonical, comparable).
      * Compresses first: the serialized/stored form is always the
      * O(σ·bits) digest, whatever the in-memory trigger deferred. */
    def toLongs: Array[Long] = {
      compress()
      val ids = counts.keys.toArray
      java.util.Arrays.sort(ids)
      val out = new Array[Long](1 + ids.length * 2)
      out(0) = n
      var i = 0
      while (i < ids.length) {
        out(1 + 2 * i) = ids(i)
        out(2 + 2 * i) = counts(ids(i))
        i += 1
      }
      out
    }
  }

  object Buffer {
    def fromLongs(longs: Array[Long], bits: Int, sigma: Int): Buffer = {
      val b = new Buffer(bits, sigma)
      b.n = longs(0)
      var i = 1
      while (i + 1 < longs.length) {
        b.counts(longs(i)) = longs(i + 1)
        i += 2
      }
      b
    }
  }

  /** Quantile read: walk nodes in increasing upper bound (deeper node
    * first on ties), accumulate counts until the target rank is covered,
    * report that node's upper bound. The true rank of the reported value
    * is within bits·n/σ of frac·n. Interpreter-evaluated by design —
    * probed on report rows, never per input row. */
  case class Quantile(sketch: Expression, frac: Expression, bits: Int = 24)
    extends Expression with CodegenFallback {

    override def children: Seq[Expression] = Seq(sketch, frac)
    override def checkInputDataTypes(): TypeCheckResult =
      (sketch.dataType, frac.dataType) match {
        case (ArrayType(LongType, _), org.apache.spark.sql.types.DoubleType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, double), got $other")
      }
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "qdigest_quantile"

    override def eval(input: InternalRow): Any = {
      val s = sketch.eval(input)
      val f = frac.eval(input)
      if (s == null || f == null) null
      else {
        val arr = s.asInstanceOf[ArrayData]
        val n = arr.getLong(0)
        if (n == 0L) null
        else {
          val m = (arr.numElements() - 1) / 2
          // (upper bound, depth, count) per node, sorted by (ub, -depth)
          val nodes = new Array[(Long, Int, Long)](m)
          var i = 0
          while (i < m) {
            val id = arr.getLong(1 + 2 * i)
            val c = arr.getLong(2 + 2 * i)
            val depth = 63 - java.lang.Long.numberOfLeadingZeros(id)
            val width = bits - depth
            val ub = ((id - (1L << depth)) + 1L) << width // exclusive upper bound
            nodes(i) = (ub, depth, c)
            i += 1
          }
          val sorted = nodes.sortBy { case (ub, d, _) => (ub, -d) }
          val target = math.max(1L, math.ceil(f.asInstanceOf[Double] * n).toLong)
          var acc = 0L
          var ans = sorted.last._1 - 1L
          var j = 0
          var done = false
          while (j < sorted.length && !done) {
            acc += sorted(j)._3
            if (acc >= target) { ans = sorted(j)._1 - 1L; done = true }
            j += 1
          }
          ans
        }
      }
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Quantile =
      copy(sketch = newChildren(0), frac = newChildren(1))
  }
}
