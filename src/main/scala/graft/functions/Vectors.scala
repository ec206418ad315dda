package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over `array<float>` embedding columns.
  *
  * Built from codegen'd higher-order functions (`zip_with`/`aggregate`)
  * rather than UDFs: the fold is a sequential in-order double accumulation,
  * which is both fast (whole-stage codegen) and bit-deterministic — the
  * same left-fold DuckDB's list functions use, so results are exactly
  * reproducible across engines.
  */
object Vectors {

  /** Left-fold sum of an array<double> column. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float/double array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y))

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null-safe only to the extent the inputs are. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
