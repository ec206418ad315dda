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
