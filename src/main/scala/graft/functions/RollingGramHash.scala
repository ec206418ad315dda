package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All stride-1 `l`-gram hashes of a token array in ONE O(n) pass — the
  * polynomial rolling hash (Rabin–Karp) behind exact substring dedup.
  *
  * The declarative formulation (`transform(sequence(...), s ->
  * md5(array_join(slice(w, s+1, L), ' ')))`) re-reads L tokens and runs
  * one md5 per gram — O(n·L) work per document plus an interpreted
  * lambda per gram. Here each token hashes once (FNV-1a 64 over its
  * UTF-8 bytes, masked to 60 bits) and grams roll:
  * `h' = (h − t_i·B^(L−1))·B + t_{i+L}  (mod 2^61−1)` — O(n) total,
  * branch-free modular folds via `Math.multiplyHigh`.
  *
  * The hash VALUES are engine-internal (no oracle compares them; the
  * dedup oracles gate output positions/text): what matters is that
  * equal grams collide exactly and unequal grams collide with
  * probability ~2^-61 per pair (Mersenne-prime polynomial hashing;
  * token-level FNV collisions add ~|vocab|²/2^64). Same collision
  * contract every md5-keyed dedup operator in the engine already
  * accepts, at L× less map-side work.
  *
  * Output: array of n−L+1 hashes (empty when the doc is shorter than
  * L); codegen is a single static call — the loop runs in compiled
  * Scala, not an interpreted lambda.
  */
case class RollingGramHash(child: Expression, l: Int)
    extends UnaryExpression {

  require(l >= 1, s"gram length l=$l must be >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_gram_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingGramHash.gramHashes(input.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingGramHash.gramHashes($c, $l)")

  override protected def withNewChildInternal(newChild: Expression): RollingGramHash =
    copy(child = newChild)
}

object RollingGramHash {
  private final val M = (1L << 61) - 1
  private final val B = 1000003L

  /** (a·b) mod 2^61−1 for 0 ≤ a, b < 2^61, via the 128-bit product:
    * 2^64 ≡ 8 (mod M), so x = hi·2^64 + lo ≡ 8·hi + (lo>>>61) + (lo&M). */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var x = 8L * hi + (lo >>> 61) + (lo & M)
    if (x >= M) x -= M
    if (x >= M) x -= M
    x
  }

  /** FNV-1a 64 over the token's UTF-8 bytes, masked below the modulus. */
  private def tokenHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h & ((1L << 60) - 1)
  }

  def gramHashes(arr: ArrayData, l: Int): ArrayData = {
    val n = arr.numElements()
    if (n < l) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = tokenHash(arr.getUTF8String(i)); i += 1 }
    // B^(l-1) mod M
    var bl = 1L
    i = 1
    while (i < l) { bl = mulmod(bl, B); i += 1 }
    val out = new Array[Long](n - l + 1)
    var h = 0L
    i = 0
    while (i < l) { h = mulmod(h, B) + th(i); if (h >= M) h -= M; i += 1 }
    out(0) = h
    i = 1
    while (i <= n - l) {
      var x = h - mulmod(th(i - 1), bl)
      if (x < 0) x += M
      h = mulmod(x, B) + th(i + l - 1)
      if (h >= M) h -= M
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
