package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially time-decayed counts with a power-of-two half-life —
  * the freshness/trending weight a recency-aware training mix or
  * popularity ranking applies to event streams (an event one half-life
  * old counts half of a fresh one).
  *
  * Engine-exactness is the design constraint, and it falls out of
  * binary floating point: the decay weight 2^−h is EXACTLY
  * representable, integer counts below 2^53 are exact doubles, and
  * `cnt / 2^h` (built as `(1L << h)` — never libm `pow`, and never
  * `exp(−λ·age)`, whose last-ulp behavior differs across engines)
  * divides two exact operands, so every TERM is identical in any IEEE
  * engine. The per-key reduction folds the ≤ 53 half-life buckets in
  * ascending-h order (collect → sort → fold, the dot-kernel
  * discipline), so the sum is bit-reproducible too. Buckets older than
  * 52 half-lives (weight < 3e−16 of fresh) are dropped as exact zero in
  * both engines — documented truncation, not drift.
  *
  * Scale shape: two hash aggs — (key, day) counts map-side off the
  * scan, then (key, half-life-bucket) sums — and a per-key fold over a
  * CONSTANT-bounded (≤ 53 element) array. No overflow at any count
  * (terms are doubles scaled down, never scaled-up longs), no
  * partitionless window, nothing driver-side. */
object Decay {

  private val MaxHl = 52

  /** Per-`key`: (key, n_events, decayed_count) where decayed_count =
    * Σ_buckets count(bucket) · 2^−h, h = whole `halfLifeDays`-day
    * half-lives between the bucket's day and the corpus max day. */
  def decayedCounts(df: DataFrame, key: String, tsCol: String,
      halfLifeDays: Int = 7): DataFrame =
    decayedFromDayCounts(dayCounts(df, key, tsCol), key, halfLifeDays)

  /** The compact (key, day, count) reduction of an event stream — the
    * STATE a streaming maintenance pass carries between batches
    * ([[graft.streaming.EventStreams]] face): bounded by
    * keys × active days regardless of event volume, and mergeable by
    * re-aggregation. Columns: (__k, __d, __c). */
  def dayCounts(df: DataFrame, key: String, tsCol: String): DataFrame =
    df.select(col(key).as("__k"),
        expr(s"unix_micros($tsCol) div ${86400L * 1000000L}").as("__d"))
      .groupBy("__k", "__d").agg(count(lit(1)).as("__c"))

  /** Decayed scores from a (__k, __d, __c) day-count table. */
  def decayedFromDayCounts(perDay: DataFrame, key: String,
      halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays >= 1, s"decayedCounts: halfLifeDays=$halfLifeDays")
    val stats = perDay.agg(max(col("__d")).as("__maxd"))
    val byHl = perDay.crossJoin(broadcast(stats))
      .withColumn("__hl", expr(s"(__maxd - __d) div $halfLifeDays"))
      .groupBy("__k", "__hl").agg(sum(col("__c")).as("__cnt"))
    byHl.groupBy(col("__k").as(key))
      .agg(sum(col("__cnt")).as("n_events"),
        aggregate(
          array_sort(collect_list(
            when(col("__hl") <= MaxHl, struct(col("__hl"), col("__cnt"))))),
          lit(0.0),
          (acc, x) => {
            // shiftleft(Column, Column): the DSL helper only takes a
            // literal shift, the underlying expression takes two
            import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
            val twoToH = exprColumn(
              org.apache.spark.sql.catalyst.expressions.ShiftLeft(
                columnExpr(lit(1L)),
                columnExpr(x.getField("__hl").cast("int"))))
            acc + x.getField("__cnt").cast("double") / twoToH.cast("double")
          })
          .as("decayed_count"))
  }
}
