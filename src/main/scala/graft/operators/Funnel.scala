package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) and cohort-retention analytics over an
  * event log — the two standard product-analytics derivations.
  *
  * Funnel: for each key, the earliest time it completed step 1, then
  * step 2 AFTER step 1, then step 3 AFTER step 2 … Expressed as one
  * hash aggregate per step over conditional `min`s with a join back —
  * every stage is partial-aggregatable (the shuffle carries one
  * candidate timestamp per key per step, never events), no window sort.
  * With S steps that is S tiny aggregates over one cached projection of
  * the log — at 100 TB the log is scanned once per step but reduced
  * map-side to |keys| rows; the alternative single-window formulation
  * sorts every key's full history in one task per key.
  *
  * Retention: cohort = the period of a key's first event; the matrix
  * counts keys active again k periods later. Two aggregates (first-seen,
  * then distinct key-period pairs joined to it) — both hash-partitioned
  * on the key, the second reusing the first's exchange.
  */
object Funnel {

  /** Per-key earliest completion times of `steps` in order. Output: one
    * row per key reaching step 1, with `t1..tS` timestamps (NULL once the
    * funnel stalls) and `steps_completed`. `stepFilter(i)` names the
    * event predicate of step i (e.g. event_type = 'view'). */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty)
    val base = events.select(
      Seq(col(keyCol), col(tsCol).as("__ts")) ++
        steps.zipWithIndex.map { case (p, i) => p.as(s"__is$i") }: _*)
    // step 1: unconditional earliest matching event per key
    var acc = base.where(col("__is0"))
      .groupBy(col(keyCol)).agg(min(col("__ts")).as("t1"))
    // step i+1: earliest matching event strictly after the key's t_i
    steps.indices.drop(1).foreach { i =>
      val next = base.where(col(s"__is$i"))
        .join(acc.select(col(keyCol), col(s"t$i")), Seq(keyCol))
        .where(col("__ts") > col(s"t$i"))
        .groupBy(col(keyCol)).agg(min(col("__ts")).as(s"t${i + 1}"))
      acc = acc.join(next, Seq(keyCol), "left")
    }
    val completed = steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("steps_completed", completed.cast("long"))
  }

  /** Cohort retention matrix: keys bucketed by the `period` (e.g. week)
    * of their first event; `offset` counts periods since the cohort
    * period; cell = distinct keys from that cohort active at that
    * offset. `period` maps a timestamp column to a sortable period
    * start (e.g. `date_trunc("week", _)`). */
  def retention(events: DataFrame, keyCol: String, tsCol: String,
      period: Column => Column): DataFrame = {
    val act = events
      .select(col(keyCol), period(col(tsCol)).cast("date").as("__p"))
      .distinct()
    val first = act.groupBy(col(keyCol)).agg(min(col("__p")).as("cohort"))
    act.join(first, Seq(keyCol))
      .groupBy(col("cohort"),
        (datediff(col("__p"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(count_distinct(col(keyCol)).as("n_active"))
  }
}
