package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregates — the mergeable-partial-state building block for
  * 100 TB rollups: per-partition/per-group sketches are tiny, exact to
  * merge, and re-aggregatable to any coarser grouping without rescanning
  * the raw data.
  *
  * Built on Spark's native Datasketches HLL expressions (codegen'd,
  * partial-aggregatable). Approximate outputs are spec-verified for
  * tolerance and merge-consistency rather than hash-matched (no
  * cross-engine oracle for sketch internals).
  */
object Sketches {

  /** Per-group approximate distinct count (HyperLogLog++, rsd default 5%). */
  def approxDistinct(df: DataFrame, key: String, value: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(col(key))
      .agg(approx_count_distinct(col(value), rsd).as(s"approx_n_$value"))

  /** Per-group approximate distinct next to the exact two-phase distinct
    * and a relative-error check column — the oracle-gateable shape: the
    * exact count and the (deterministic) tolerance verdict hash-match a
    * SQL oracle, while the estimate itself stays engine-internal. */
  def approxDistinctChecked(df: DataFrame, key: String, value: String,
      rsd: Double = 0.05, tol: Double = 0.15): DataFrame =
    df.groupBy(col(key))
      .agg(
        count_distinct(col(value)).as(s"n_distinct_$value"),
        approx_count_distinct(col(value), rsd).as("__est"))
      .select(col(key), col(s"n_distinct_$value"),
        (abs(col("__est").cast("double") /
          col(s"n_distinct_$value").cast("double") - 1.0) <= tol).as("approx_ok"))

  /** Per-group HLL sketch blobs — the storable/mergeable form. */
  def hllSketches(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(col(key))
      .agg(hll_sketch_agg(col(value)).as("sketch"))

  /** Merge per-group sketches to one global estimate — proves the rollup
    * path: estimate(union(group sketches)) == estimate(direct sketch). */
  def hllMergeEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("merged_estimate"))

  /** Direct global estimate, for merge-consistency checks. */
  def hllDirectEstimate(df: DataFrame, value: String): DataFrame =
    df.agg(hll_sketch_estimate(hll_sketch_agg(col(value))).as("direct_estimate"))
}
