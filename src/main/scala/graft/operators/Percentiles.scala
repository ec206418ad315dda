package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles via sort + window instead of Spark's
  * holistic `percentile` aggregate.
  *
  * The built-in buffers every (value → count) per group in an in-memory
  * map and sorts it single-threaded at eval — 5+ s for 600k rows at
  * sf0.1, and a scale hazard (group state ∝ group cardinality). This
  * formulation is all shuffle-parallel primitives: one range-partitioned
  * sort per key, a row_number/count window pass, then a tiny final agg
  * that picks the two bracketing rows per percentile and interpolates
  * v_lo*(1-frac) + v_hi*frac at position p*(n-1) — the exact expression
  * `percentile`/DuckDB `quantile_cont` evaluate (the algebraically equal
  * v_lo + (v_hi-v_lo)*frac form differs in the last float bits).
  */
object Percentiles {

  /** One output row per key: `p<NN>` columns for each requested fraction. */
  def exact(df: DataFrame, key: String, value: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(key).orderBy("__v")
    val base = df.select(col(key), col(value).cast("double").as("__v"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(key)))
    val aggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      val pos = (col("__n") - 1) * p // 0-based fractional rank, double
      Seq(
        max(when(col("__rn") === floor(pos) + 1, col("__v"))).as(s"__lo$i"),
        max(when(col("__rn") === ceil(pos) + 1, col("__v"))).as(s"__hi$i"),
        max(pos - floor(pos)).as(s"__f$i"))
    }
    val outCols = col(key) +: ps.zipWithIndex.map { case ((name, _), i) =>
      (col(s"__lo$i") * (lit(1.0) - col(s"__f$i")) + col(s"__hi$i") * col(s"__f$i")).as(name)
    }
    base.groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
  }
}
