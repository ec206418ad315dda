package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a single-space-tokenized string, as
  * one expression pass.
  *
  * The declarative formulation (split → sequence → transform(slice →
  * concat_ws) → array_distinct) evaluates one interpreted lambda per
  * shingle — ~500 per document — plus intermediate array allocations.
  * This expression builds the distinct shingle array in one scan of the
  * token array with a hash set, one eval per row.
  *
  * Semantics match the declarative form exactly (and the DuckDB oracle):
  * shingle i = tokens[i..i+n-1] joined by ' ' for i in 0..max(len-n, 0),
  * so a doc shorter than n tokens yields its whole token list as one
  * shingle; empty strings are dropped by the caller's filter.
  */
case class NGramShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "ngram_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(' ')
    val count = math.max(toks.length - n, 0) + 1
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
}
