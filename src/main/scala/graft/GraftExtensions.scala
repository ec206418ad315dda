package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Session extension wiring: makes graft's native expressions available
  * from SQL text, e.g. `SELECT vec_dot(a, b)`.
  *
  * Install at session build time:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  * or imperatively on a live session via
  * `org.apache.spark.sql.graftsql.registerGraftFunctions(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** (name, info, builder) descriptions for every injected function.
    * Inputs are wrapped in casts to the kernel's native array<double>, so
    * SQL callers can pass float or double arrays. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProduct(
        Cast(children(0), ArrayType(DoubleType)),
        Cast(children(1), ArrayType(DoubleType)))))
}
