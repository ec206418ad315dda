package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}

/** Vector kernels over `array<float>` embedding columns.
  *
  * The dot-product fold is a native Catalyst expression (see
  * [[DotProduct]]) — whole-stage-codegen'd, unlike `zip_with`/`aggregate`
  * whose lambdas evaluate interpreted. The accumulation stays a sequential
  * in-order double fold, bit-identical to DuckDB's list functions, so
  * results are exactly reproducible across engines.
  */
object Vectors {

  /** Dot product of two float/double array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    exprColumn(DotProduct(
      columnExpr(a.cast("array<double>")),
      columnExpr(b.cast("array<double>"))))

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe only to the extent the inputs are. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
