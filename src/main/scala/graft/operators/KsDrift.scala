package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov drift per group — the
  * distribution-shift tripwire over a numeric column: for each source,
  * the KS statistic D = max_v |F_source(v) − F_rest(v)| between the
  * source's empirical CDF and the rest-of-corpus CDF. Complements the
  * X81 chi-square token drift (categorical) with the standard
  * continuous-distribution test, and unlike a bucketed PSI it is
  * binning-free.
  *
  * Exactness: ECDF differences are evaluated in INTEGER arithmetic —
  * D's numerator is `max |cum_s·(N−n_s) − cum_rest·n_s|` over observed
  * values (exact longs; the single final division to a double is the
  * only float op, so any engine replays it bit-for-bit). The integer
  * form holds while cum·N fits a long — N up to ~3·10^9 rows; beyond
  * that, per-shard pre-aggregation of the value grid (the same
  * count-compression X71's weighted percentiles use) keeps the counts
  * in range before the CDF pass.
  *
  * Shape: one (source, v) hash agg + one |v|-keyed global agg; the
  * evaluation grid is sources × distinct values via a broadcast cross
  * join; per-source cumulative sums ride a keyed window; the one
  * GLOBAL cumulative (over distinct values) is a single-partition
  * window over the |v|-row value table — value-cardinality bounded
  * (the q117 constant-bounded-window pattern), never corpus bounded. */
object KsDrift {

  /** Per-`keyCol` exact KS distance of `valCol` vs the rest of `df`.
    * Returns (key, n_key, n_rest, ks). */
  def perGroupVsRest(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val d = df.select(col(keyCol).as("__k"), col(valCol).cast("long").as("__v"))
    val svc = d.groupBy("__k", "__v").agg(count(lit(1)).as("c_sv"))
    val keys = d.groupBy("__k").agg(count(lit(1)).as("n_s"))
    val vals = d.groupBy("__v").agg(count(lit(1)).as("c_v"))
      .withColumn("cum_v",
        sum("c_v").over(Window.orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = keys.agg(sum("n_s").as("n_total"))
    val grid = keys.crossJoin(broadcast(vals.select("__v", "cum_v")))
      .join(svc, Seq("__k", "__v"), "left")
      .na.fill(0L, Seq("c_sv"))
      .withColumn("cum_a",
        sum("c_sv").over(Window.partitionBy("__k").orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
    grid
      .select(col("__k"), col("n_s"), (col("n_total") - col("n_s")).as("n_r"),
        abs(col("cum_a") * (col("n_total") - col("n_s")) -
          (col("cum_v") - col("cum_a")) * col("n_s")).as("num"))
      .groupBy(col("__k").as(keyCol))
      .agg(min("n_s").as(s"n_$keyCol"), min("n_r").as("n_rest"),
        max("num").as("__dnum"))
      .select(col(keyCol), col(s"n_$keyCol"), col("n_rest"),
        (col("__dnum").cast("double") /
          (col(s"n_$keyCol") * col("n_rest")).cast("double")).as("ks"))
  }
}
