package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the events stream (SURVEY §2.10 extensions):
  * watermarked tumbling/sliding windows, native session windows, and a
  * custom sessionization state machine via `flatMapGroupsWithState`.
  *
  * Scale notes: all three are key-partitioned stateful ops — state lives
  * in the state store (RocksDB-backed on a real cluster), watermarks bound
  * state size, and nothing touches the driver. The custom state op keeps
  * exactly one fixed-size record per open (user) session.
  */
object EventStreams {

  final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionAccum(startMicros: Long, endMicros: Long, n: Long)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Streaming exactly-once dedup on a key: duplicate event_ids arriving
    * in any later micro-batch are dropped; the watermark bounds how long
    * each key is remembered (state eviction — without it the key set
    * grows forever at corpus scale). */
  def dedupStream(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id")

  /** Content dedup with state bounded by the watermark horizon
    * (`dropDuplicatesWithinWatermark`): duplicates whose event times
    * fall within `watermarkDelay` of each other collapse to the first
    * arrival, and — unlike [[dedupStream]], which keeps every key until
    * ITS OWN event-time watermark expiry — a key that recurs after the
    * watermark has passed its first sighting is ADMITTED AGAIN. That
    * re-admission is the point: on an unbounded corpus stream "drop
    * re-crawls of the last N minutes" keeps state O(recent window)
    * regardless of corpus age — the streaming analogue of the
    * batch-vs-recent-history incremental dedup (X57). */
  def dedupWithinWatermark(rows: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermarkDelay: String = "10 minutes"): DataFrame =
    rows.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked sliding-window counts per event type. */
  def windowedCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
      windowLen: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("max_value"))

  /** Gap-based session aggregation with the built-in session_window. */
  def sessionWindowCounts(events: DataFrame, gap: String = "5 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Watermarked stream-stream interval join: each purchase event joins
    * the same user's click events from the preceding `windowSeconds` —
    * the streaming twin of `operators.RangeJoin.priorWindowJoin`
    * (spec-asserted equal on the same data).
    *
    * Both sides carry watermarks and the join condition bounds event time
    * in BOTH directions, so the state store can evict: a buffered click
    * is droppable once the watermark passes click.ts + window; a buffered
    * purchase once it passes purchase.ts. Without those bounds a
    * stream-stream join buffers forever — the failure mode that matters
    * at 100 TB/day. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      windowSeconds: Long = 3600, watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("p_event_id"), col("user_id").as("p_user_id"),
        col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    p.join(c, expr(
      s"""p_user_id = c_user_id AND
          c_ts >= p_ts - INTERVAL $windowSeconds SECONDS AND
          c_ts < p_ts"""))
      .select(col("p_event_id").as("event_id"), col("p_user_id").as("user_id"),
        col("p_ts").as("ts"), col("c_ts"), col("c_value"))
  }

  /** Custom sessionization state machine: one fixed-size state record per
    * open session, closed sessions emitted either when a same-batch event
    * arrives past the gap or when the event-time timeout (watermark past
    * session end + gap) fires. Closed-session output equals
    * `operators.Sessionize.sessions` on the same data (spec-asserted). */
  def sessionize(events: Dataset[EventRow], gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L

    def micros(t: Timestamp): Long = t.getTime * 1000L
    def stamp(us: Long): Timestamp = new Timestamp(us / 1000L)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAccum, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[EventRow], state: GroupState[SessionAccum]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, stamp(s.startMicros), stamp(s.endMicros), s.n))
          } else {
            val sorted = it.map(e => micros(e.ts)).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.endMicros <= gapMicros =>
                  open = Some(s.copy(endMicros = math.max(s.endMicros, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(userId, stamp(s.startMicros), stamp(s.endMicros), s.n)
                  open = Some(SessionAccum(t, t, 1))
                case None =>
                  open = Some(SessionAccum(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close once the watermark passes the gap after session end
              state.setTimeoutTimestamp(
                math.max(s.endMicros / 1000L + gapSeconds * 1000L,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming SCD1 (latest state per key) — the streaming twin of
    * `operators.Temporal.latestSnapshot`: one fixed-size state record per
    * key holds the running max under (ts, event_id); each micro-batch
    * re-emits the keys it touched with their current latest row, so late
    * or replayed events can only CONFIRM the stored state, never regress
    * it (spec-asserted against the batch operator on the same data).
    *
    * Update-mode `mapGroupsWithState`: state store growth is one record
    * per distinct key — the bounded-dimension shape (users, devices), not
    * per-event state. */
  def latestState(events: Dataset[EventRow]): Dataset[EventRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EventRow, EventRow](GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[EventRow], state: GroupState[EventRow]) =>
          def key(e: EventRow): (Long, Long) = (e.ts.getTime, e.event_id)
          val best = (state.getOption.iterator ++ it)
            .maxBy(key)(Ordering.Tuple2[Long, Long])
          state.update(best)
          best
      }
  }
}
