package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): group each key's events into
  * sessions separated by more than `gapSeconds` of event-time silence.
  *
  * One window pass over (key, ts) — a single hash-partition shuffle, the
  * same cost shape as any per-key ordered scan. The streaming twin (custom
  * state over `flatMapGroupsWithState`) lives in
  * `graft.streaming.EventStreams`; its closed sessions must equal this
  * batch result (asserted in specs).
  */
object Sessionize {

  /** Every input event tagged with its `session_seq` (1-based per key)
    * — the per-event form session-scoped operators (X137 co-visitation)
    * compose on; [[sessions]] folds it to one row per session. */
  def tagSessions(events: DataFrame, key: String, ts: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(ts), 1).over(w)
    val isNew = when(prev.isNull ||
      (unix_micros(col(ts)) - unix_micros(prev)) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    events
      .withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(run))
      .drop("__new")
  }

  /** (key, session_seq, session_start, session_end, n_events) per session. */
  def sessions(events: DataFrame, key: String, ts: String,
      gapSeconds: Long): DataFrame = {
    tagSessions(events, key, ts, gapSeconds)
      .groupBy(col(key), col("session_seq"))
      .agg(
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
