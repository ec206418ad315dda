package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window volume anomaly detection — the ingest tripwire a
  * pipeline reads before trusting a day's data: each (key, day) count
  * scored against the mean/stddev of its trailing 7 OBSERVED days.
  *
  * Determinism contract: the window sums are exact longs (n and n² —
  * n² caps a single day's count at ~3·10^9 before a long overflows;
  * above that, pre-scale the counts), and the z computation is ONE
  * double expression chain — mean = s/7, var = (ss − s²/7)/7,
  * z = (n − mean)/sqrt(var) — whose ops (± × ÷ sqrt) are all
  * correctly-rounded IEEE, so any engine replays it bit-for-bit.
  *
  * ROWS frame, not RANGE: gap days SHIFT the window rather than
  * shrinking it (a missing day is itself an anomaly — the day-count
  * drop shows up as the next day's inflated z, and the X78/X121
  * reconciliation family owns missing-partition detection). Only warm
  * windows (7 trailing rows) emit. The window partitions by key: state
  * per partition is one row per day — never the raw events, so the
  * |keys|-bounded parallelism is a non-issue at any corpus size. */
object Anomaly {

  /** `daily`: pre-aggregated (key, day, n) — or use [[trailingZScores]]
    * to fold from raw events. Emits (key, day, n, mean7, z, is_anomaly)
    * for warm windows, |z| > `sigma` flagged. */
  def trailingZScoresDaily(daily: DataFrame, keyCol: String,
      sigma: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("day").rowsBetween(-7, -1)
    val s = sum("n").over(w)
    val ss = sum(col("n") * col("n")).over(w)
    val c = count("n").over(w)
    val mean = s.cast("double") / lit(7.0)
    val variance =
      (ss.cast("double") - s.cast("double") * s.cast("double") / lit(7.0)) / lit(7.0)
    daily
      .select(col(keyCol), col("day"), col("n"), c.as("__c"),
        mean.as("mean7"),
        when(variance > lit(0.0),
          (col("n").cast("double") - mean) / sqrt(variance))
          .otherwise(lit(0.0)).as("z"))
      .where(col("__c") === 7)
      .drop("__c")
      .withColumn("is_anomaly", abs(col("z")) > lit(sigma))
  }

  /** Fold raw events (tsCol timestamps) to daily counts per `keyCol`,
    * then score — one map-side-combinable agg plus the keyed window. */
  def trailingZScores(events: DataFrame, keyCol: String, tsCol: String,
      sigma: Double = 2.0): DataFrame =
    trailingZScoresDaily(
      events.groupBy(col(keyCol),
        date_trunc("DAY", col(tsCol)).cast("date").as("day"))
        .agg(count(lit(1)).as("n")),
      keyCol, sigma)
}
