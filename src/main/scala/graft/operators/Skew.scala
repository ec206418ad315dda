package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot grouping keys.
  *
  * Plain algebraic aggregates (count/sum/min/max) don't need salting in
  * Spark — partial (map-side) aggregation already collapses hot keys
  * before the shuffle. Salting matters for HOLISTIC aggregates whose
  * partial state is proportional to group size (collect_set/collect_list,
  * exact percentiles): there, one hot key = one reducer holding the whole
  * group. These operators split each group over `salts` reducers and merge
  * the bounded partials in a second, cheap stage.
  */
object Skew {

  /** collect_set over skewed keys: stage 1 collects per (key, salt) — each
    * hot group spread over `salts` reducers — stage 2 merges the partial
    * sets (flatten + distinct, tiny relative to the raw group). The salt is
    * derived from a hash of the whole row's value column, so it needs no
    * extra entropy column and stays deterministic. */
  def saltedCollectSet(df: DataFrame, key: String, value: String,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(col(value)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("__partial")))))
        .as(s"${value}_set"))

  /** Exact distinct count over skewed keys via two-phase dedup: the first
    * stage partitions by (key, value) — cardinality-spread, no hot reducer
    * even when one key dominates — the second counts the dedup'd rows.
    * Same number of shuffles as count(DISTINCT) but skew-immune. */
  def distinctCountTwoPhase(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key))
      .agg(count(lit(1)).as(s"n_distinct_$value"))
}
