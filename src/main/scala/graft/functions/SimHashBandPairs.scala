package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}

/** Fused candidate-expansion + hamming-verify generator for the
  * pigeonhole-banded SimHash join (NearDup.simhashPairs).
  *
  * Input: one LSH bucket — `bucket` = array<struct<doc_id, simhash>>
  * sorted by doc_id, `blk` = the block index this bucket was keyed on.
  * Emits (doc_a, doc_b, hamming) for every pair in the bucket with
  * hamming ≤ maxHamming whose FIRST agreeing block (lowest index i with
  * xor & masks(i) == 0) is `blk` — so across all buckets each
  * qualifying pair is emitted exactly once, with no distinct shuffle.
  *
  * Why a dedicated generator instead of PairCombinations + column
  * filters: the bucket expansion is quadratic, and a generic expansion
  * allocates two struct rows per CANDIDATE before the filter can drop
  * it (~10M allocations at sf0.1, 11× the all-pairs runtime). Here the
  * candidate loop is primitive long arithmetic over two flat arrays —
  * xor, popcount, mask scan — and only SURVIVORS allocate an output row.
  */
case class SimHashBandPairs(
    bucket: Expression,
    blk: Expression,
    masks: Seq[Long],
    maxHamming: Int)
  extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(bucket, blk)

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("hamming", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = bucket.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      if (blk.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"simhash_band_pairs block index must be int, got ${blk.dataType}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_band_pairs requires array<struct<long,long>>, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = bucket.eval(input)
    val b = blk.eval(input)
    if (v == null || b == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val blkIdx = b.asInstanceOf[Int]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    // flatten once: the quadratic loop reads primitive arrays, not
    // per-access struct getters
    val ids = new Array[Long](n)
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      hs(i) = row.getLong(1)
      i += 1
    }
    val nMasks = masks.length
    val maskArr = masks.toArray
    new Iterator[InternalRow] {
      private var ci = 0
      private var cj = 1
      private var pending = false // row holds an unconsumed emission
      // ONE mutable output row, reused across emissions (round 13, the
      // PairCombinations rule): GenerateExec re-wraps every emission in
      // its own reused JoinedRow before the unsafe projection, so a
      // fresh 3-long boxed row per survivor was pure allocation —
      // setLong writes primitives, zero allocation per pair. The scan
      // that WRITES the reused row is deferred to hasNext (never a
      // lookahead inside next()), so the handed-out row is only
      // overwritten after the consumer has moved on.
      private val row = new org.apache.spark.sql.catalyst.expressions
        .SpecificInternalRow(Seq(LongType, LongType, LongType))
      private def scan(): Unit = {
        while (!pending && ci < n - 1) {
          val xor = hs(ci) ^ hs(cj)
          val ham = java.lang.Long.bitCount(xor)
          if (ham <= maxHamming) {
            // first agreeing block — emit only from that bucket
            var f = 0
            while (f < nMasks && (xor & maskArr(f)) != 0L) f += 1
            if (f == blkIdx) {
              row.setLong(0, ids(ci))
              row.setLong(1, ids(cj))
              row.setLong(2, ham.toLong)
              pending = true
            }
          }
          cj += 1
          if (cj >= n) { ci += 1; cj = ci + 1 }
        }
      }
      override def hasNext: Boolean = { if (!pending) scan(); pending }
      override def next(): InternalRow = {
        if (!pending) scan()
        if (!pending) throw new NoSuchElementException(
          "SimHashBandPairs: next() on exhausted pair iterator")
        pending = false
        row
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashBandPairs =
    copy(bucket = newChildren(0), blk = newChildren(1))
}
