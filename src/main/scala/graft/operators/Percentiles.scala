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
  * formulation is all shuffle-parallel primitives:
  *  1. per-key counts (map-side-combined hash agg, |keys| rows) broadcast
  *     back onto the stream — so every row knows its key's n without a
  *     second window pass;
  *  2. one range-partitioned sort per key assigns ranks (row_number);
  *  3. rows not sitting at a requested rank are FILTERED OUT right after
  *     ranking — the final agg interpolates from ≤ 2·|ps| rows per key,
  *     not the full column;
  *  4. interpolation is v_lo*(1-frac) + v_hi*frac at position p*(n-1) —
  *     the exact expression `percentile`/DuckDB `quantile_cont` evaluate
  *     (the algebraically equal v_lo + (v_hi-v_lo)*frac form differs in
  *     the last float bits).
  */
object Percentiles {

  /** One output row per key: `p<NN>` columns for each requested fraction. */
  def exact(df: DataFrame, key: String, value: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val vals = df.select(col(key), col(value).cast("double").as("__v"))
    val counts = vals.groupBy(col(key)).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(key).orderBy("__v")
    val ranked = vals
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(counts), Seq(key))
    def pos(p: Double): Column = (col("__n") - 1) * p
    val needed = ps.map { case (_, p) =>
      col("__rn") === floor(pos(p)) + 1 || col("__rn") === ceil(pos(p)) + 1
    }.reduce(_ || _)
    val aggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      Seq(
        max(when(col("__rn") === floor(pos(p)) + 1, col("__v"))).as(s"__lo$i"),
        max(when(col("__rn") === ceil(pos(p)) + 1, col("__v"))).as(s"__hi$i"),
        max(pos(p) - floor(pos(p))).as(s"__f$i"))
    }
    val outCols = col(key) +: ps.zipWithIndex.map { case ((name, _), i) =>
      (col(s"__lo$i") * (lit(1.0) - col(s"__f$i")) + col(s"__hi$i") * col(s"__f$i")).as(name)
    }
    ranked.filter(needed)
      .groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
  }
}
