package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All LSH table signatures of one vector in ONE expression node.
  *
  * The declarative formulation — L·m `vec_dot(vec, typedLit(plane))`
  * sub-expressions summed through CASE WHEN chains — inlines L·m
  * unrolled dot loops into a single whole-stage-codegen method. At
  * 8 tables × 6 planes that method passes the JVM's 8 KB-bytecode
  * JIT ceiling (`DontCompileHugeMethods`), so the hot projection runs
  * INTERPRETED bytecode: measured ~230 µs/row on 64-dim vectors —
  * ~50× the compiled cost, and the dominant term of the whole LSH
  * query (q49, round-10 weak row). This expression keeps the kernel
  * in pre-compiled Scala (JIT-hot, planes resident as primitive
  * arrays) and hands codegen a one-line call through a reference
  * object, so the enclosing stage stays small enough to compile.
  *
  * Bit semantics are identical to the declarative form (and the
  * recall-gate specs): sig(table t) = Σ_j [dot(vec, plane_tj) ≥ 0]·2^j
  * with the same sequential left-fold dot accumulation — including on
  * NaN, where the sign test is `!(acc < 0)` to match Spark SQL's
  * `>= 0` (Spark orders NaN above every double, so a NaN dot sets the
  * bit in BOTH formulations). Output: array<long> of length L, index =
  * table id (pair with `posexplode`).
  *
  * `planes` is a Seq-of-Seqs, NOT nested arrays: Catalyst
  * canonicalization, semanticEquals, subexpression elimination and
  * exchange reuse all compare expression trees via case-class
  * equality, and Array equality is reference-based — nested arrays
  * would make two semantically identical nodes never compare equal.
  * The hot loop runs over a lazily-built primitive mirror.
  */
case class LshSignatures(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  @transient private lazy val planesArr: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lsh_signatures"

  def compute(input: ArrayData): ArrayData = {
    val pl = planesArr
    val d = input.numElements()
    val out = new Array[Long](pl.length)
    var t = 0
    while (t < pl.length) {
      val table = pl(t)
      var sig = 0L
      var j = 0
      while (j < table.length) {
        val p = table(j)
        val n = math.min(d, p.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += input.getDouble(i) * p(i); i += 1 }
        if (!(acc < 0.0)) sig |= 1L << j
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSigs", this, classOf[LshSignatures].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}
