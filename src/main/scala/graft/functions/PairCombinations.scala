package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Generator emitting every ordered pair (i < j) of a sorted array's
  * elements as two columns (x, y) — the candidate-pair expansion inside
  * bucket-grouped near-dup joins.
  *
  * The declarative formulation
  * `explode(flatten(transform(ds, (x,i) => transform(slice(ds, i+2, n), ...))))`
  * evaluates its lambdas interpreted (higher-order functions sit outside
  * whole-stage codegen) and allocates a sliced array per element — ~40%
  * of the pair-generation stage at sf0.1. This generator walks the array
  * once per output row with two integer cursors and no intermediate
  * allocation. Quadratic emission is inherent to the operator; callers
  * bound it per bucket (`dfCap`) — see NearDup.
  */
case class PairCombinations(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elementType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(Seq(
    StructField("x", elementType, nullable = true),
    StructField("y", elementType, nullable = true)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_combinations requires an array input, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n < 2) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        // ONE mutable output row, reused across emissions (round 13
        // allocation-rate work): GenerateExec immediately wraps each
        // emitted row in its own REUSED JoinedRow and unsafe-projects
        // it, so any consumer that buffers must already copy — the
        // generator allocating a fresh row (plus two boxed elements)
        // per pair was pure GC pressure on a quadratic emitter. The
        // long fast path writes primitives without boxing (ids are
        // long in every caller).
        private val isLong = elementType == org.apache.spark.sql.types.LongType
        private val row = new org.apache.spark.sql.catalyst.expressions
          .SpecificInternalRow(Seq(elementType, elementType))
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          if (isLong) {
            row.setLong(0, arr.getLong(i))
            row.setLong(1, arr.getLong(j))
          } else {
            row.update(0, arr.get(i, elementType))
            row.update(1, arr.get(j, elementType))
          }
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombinations =
    copy(child = newChild)
}
