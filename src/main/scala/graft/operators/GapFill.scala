package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar gap-fill with linear interpolation — time-series resampling:
  * a daily metric with missing days (dropped partitions, source outages)
  * re-gridded onto the full per-key calendar, interior gaps filled by
  * linear interpolation between the nearest observed neighbors. The
  * standard prep before any windowed/trend computation that assumes a
  * dense time axis.
  *
  * Shape: per-key calendar synthesis is one `sequence(min_day, max_day)`
  * expression off a per-key min/max agg (two rows of state per key, the
  * span NEVER materializes on the driver), exploded and left-joined to
  * the observed days — the join key is (key, day), partial-aggregated
  * and co-partitioned. Neighbor lookup is the classic pair of
  * IGNORE-NULLS window edges (`last` over the preceding frame, `first`
  * over the following), one keyed window pass each way.
  *
  * Interpolation is exact-operand arithmetic: integer day offsets and
  * long counts enter ONE double expression
  * `prev + ((next − prev) · d) / gap` — identical in any IEEE engine.
  * The calendar spans each key's OBSERVED min..max, so every gap is
  * interior and both neighbors exist (no extrapolation policy to
  * drift). */
object GapFill {

  /** `daily`: (key, day: date, n: long) with possible missing days.
    * Returns the dense calendar per key: (key, day, n_filled: double,
    * is_interpolated). */
  def linearDaily(daily: DataFrame, keyCol: String): DataFrame = {
    val cal = daily.groupBy(col(keyCol))
      .agg(min("day").as("__d0"), max("day").as("__d1"))
      .select(col(keyCol),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    val joined = cal.join(daily, Seq(keyCol, "day"), "left")
    val wPrev = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(1, Window.unboundedFollowing)
    // per-column conditional IGNORE-NULLS edges: a calendar row's
    // (day, n) STRUCT is never null even when n is, so the observed
    // guard must sit inside each windowed column (same frame + same
    // guard ⇒ the (day, n) pair stays consistent)
    def obs(c: String) = when(col("n").isNotNull, col(c))
    val pn = last(obs("n"), ignoreNulls = true).over(wPrev)
    val pd = last(obs("day"), ignoreNulls = true).over(wPrev)
    val xn = first(obs("n"), ignoreNulls = true).over(wNext)
    val xd = first(obs("day"), ignoreNulls = true).over(wNext)
    joined
      .withColumn("__pn", pn).withColumn("__pd", pd)
      .withColumn("__xn", xn).withColumn("__xd", xd)
      .select(col(keyCol), col("day"),
        when(col("n").isNotNull, col("n").cast("double"))
          .otherwise(
            col("__pn").cast("double") +
              ((col("__xn") - col("__pn")) *
                datediff(col("day"), col("__pd"))).cast("double") /
              datediff(col("__xd"), col("__pd")).cast("double"))
          .as("n_filled"),
        col("n").isNull.as("is_interpolated"))
  }
}
