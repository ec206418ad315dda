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

  /** Salted inner equi-join for a skewed fact side: when one join key
    * dominates (the classic hot-customer / hot-item shape), a plain
    * shuffle join lands the whole hot key on ONE reducer. Here each fact
    * row draws a deterministic salt from a hash of the whole row (no
    * extra entropy column, repartition-stable), joining on (key, salt)
    * against the dim side replicated `salts` ways — the hot key spreads
    * over `salts` reducers at the cost of a `salts`× blow-up of the
    * (small) dim side. Result is row-identical to the plain inner join.
    *
    * This is the manual formulation of what AQE skew-join does at
    * runtime; it exists for the cases AQE cannot fix (skew inside a
    * single key, non-shuffle-join plans) and as the deterministic,
    * plannable variant. Broadcast beats both when the dim fits in
    * memory — salting targets the mid-size dim that does not. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"saltedJoin: salts=$salts")
    val factCols = fact.columns.map(c => col(c)).toSeq
    val salted = fact.withColumn("__salt",
      pmod(hash(factCols: _*), lit(salts)))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Gini coefficient of a count distribution — the scalar skew verdict
    * the X82 per-key report rolls up to: 0 = uniform keys, →1 = one key
    * holds everything. The libm-free sorted-rank identity
    * `G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)` with x ascending: both
    * Σ-terms are EXACT LONGS (tie permutations don't change Σ i·x, so
    * the rank window's tie order is irrelevant — deterministic without
    * a tiebreaker), and the single division is the only float op.
    * Overflow bound: Σ i·x ≤ n·total — fine to n·total < 2^63; beyond,
    * count-compress equal x first (rank arithmetic on (x, freq) pairs).
    * The rank window is keyless but runs over the ENTITY table (one row
    * per key), not the raw stream — |keys|-bounded, the q117 pattern. */
  def gini(counts: DataFrame, xCol: String, label: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    counts
      .select(col(xCol).cast("long").as("__x"))
      .withColumn("__i", row_number().over(Window.orderBy("__x")).cast("long"))
      .agg(count(lit(1)).as("n"), sum("__x").as("total"),
        sum(expr("__i * __x")).as("__s1"))
      .select(lit(label).as("metric"), col("n"), col("total"),
        ((lit(2L) * col("__s1") - (col("n") + lit(1L)) * col("total"))
          .cast("double") /
          (col("n") * col("total")).cast("double")).as("gini"))
  }
}
