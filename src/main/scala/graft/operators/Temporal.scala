package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal (slowly-changing-dimension) operators.
  *
  * An ETL pipeline that lands a change log (CDC stream, scrape history,
  * daily snapshots) needs two standard derivations:
  *   - SCD type 2: compress the log into validity intervals
  *     [valid_from, valid_to) per key, one row per distinct consecutive
  *     state, the open interval flagged current;
  *   - latest-state snapshot: the last row per key (SCD type 1) — that
  *     one is just `Dedup.keepFirst` under reversed order.
  *
  * Plan shape: one hash-partition exchange on the key, then both windows
  * (change detection and interval close) run in the SAME sort within each
  * partition — Catalyst plans consecutive windows over one
  * (partition, order) as a single Sort + two Window nodes, no second
  * shuffle. At 100 TB this is the minimum cost of any per-key ordered
  * derivation; per-key state is O(1) (lag/lead buffers), so skewed keys
  * spill the sort, not the operator.
  */
object Temporal {

  /** Build SCD2 validity intervals from a change log.
    *
    * @param df       change log
    * @param keyCol   entity key
    * @param stateCol the tracked attribute; consecutive equal values
    *                 collapse into one interval
    * @param tsCol    event time
    * @param tieCols  deterministic tiebreak within equal timestamps
    *
    * Output: (key, state, valid_from, valid_to, version, is_current) —
    * `valid_to` NULL on the open interval, `version` 1-based per key. */
  def scd2(df: DataFrame, keyCol: String, stateCol: String, tsCol: String,
      tieCols: Seq[String]): DataFrame = {
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCol).orderBy(order: _*)
    // a row opens an interval iff its state differs from the previous row's
    df.withColumn("__prev", lag(col(stateCol), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col(stateCol))
      .select(
        col(keyCol),
        col(stateCol).as("state"),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(w).as("valid_to"),
        row_number().over(w).cast("long").as("version"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Apply a CDC change log (MERGE semantics): reduce upserts and
    * deletes to the final snapshot, with PARTIAL upserts — a null payload
    * column on an upsert means "no change", so each surviving column
    * carries its last non-null write after the key's last delete.
    *
    * One hash aggregate does everything (no per-key sort, no window):
    * per payload column the aggregate tracks `max_by` value and seq over
    * the column's non-null upserts, alongside the key's last delete seq
    * and last upsert seq; the post-projection nulls any column whose
    * last write predates the last delete, and the key survives iff some
    * upsert follows the last delete. Every aggregate is
    * partial-aggregatable, so the exchange carries one candidate row per
    * (map task, key) — the log itself never shuffles. At 100 TB this is
    * the same cost envelope as [[latestSnapshot]] regardless of how many
    * columns the merge tracks.
    *
    * @param df       change log
    * @param keyCol   entity key
    * @param seqCol   total-order change sequence (CDC LSN); must be
    *                 non-null and unique per key, values >= 0
    * @param isDelete predicate marking delete records
    * @param payload  tracked columns (partial-update semantics each) */
  def applyChanges(df: DataFrame, keyCol: String, seqCol: String,
      isDelete: Column, payload: Seq[String]): DataFrame = {
    val ups = !isDelete
    val noDel = lit(-1L) // sentinel below any real seq
    val aggs =
      max(when(isDelete, col(seqCol))).as("__last_del") +:
        max(when(ups, col(seqCol))).as("__last_up") +:
        payload.flatMap { c =>
          val written = ups && col(c).isNotNull
          Seq(
            max_by(col(c), when(written, col(seqCol))).as(s"__v_$c"),
            max(when(written, col(seqCol))).as(s"__o_$c"))
        }
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.drop(1): _*)
      .where(col("__last_up") > coalesce(col("__last_del"), noDel))
      .select(col(keyCol) +: payload.map(c =>
        when(col(s"__o_$c") > coalesce(col("__last_del"), noDel),
          col(s"__v_$c")).as(c)): _*)
  }

  /** Latest state per key (SCD type 1): the last log row under
    * (ts, tieCols) — a `max_by` hash aggregate, so the shuffle carries one
    * candidate per key from each map task, never the log. */
  def latestSnapshot(df: DataFrame, keyCol: String, tsCol: String,
      tieCols: Seq[String]): DataFrame = {
    val payload = df.columns.toSeq.filterNot(_ == keyCol)
    val order = struct((col(tsCol) +: tieCols.map(col)): _*)
    df.groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col): _*), order).as("__last"))
      .select(df.columns.toSeq.map(c =>
        if (c == keyCol) col(c) else col("__last").getField(c).as(c)): _*)
  }

  /** Snapshot diff — the dataset-versioning audit between two corpus
    * snapshots: one full outer join on the key classifies every id as
    * added / removed / changed / unchanged (content compared by md5, so
    * the join carries a fixed-width digest, not the documents). The
    * shuffle is one exchange per side keyed by id; at equal bucketing
    * of both snapshots it degrades to a zero-shuffle sort-merge.
    *
    * Presence is tracked by an explicit flag, not the digest's
    * nullability: a row present with NULL content must classify by
    * presence (md5(NULL) is NULL and would masquerade as absent), and
    * the changed-comparison is null-safe (`<=>`), so NULL vs non-NULL
    * content is "changed" and NULL vs NULL "unchanged".
    *
    * Precondition: `idCol` is unique within each snapshot — duplicate
    * ids fan out through the full-outer join (one output row per
    * cross-pair), as in any keyed diff. */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    val l = a.select(col(idCol).as("id"), lit(1).as("__pa"),
      md5(col(contentCol)).as("__ha"))
    val r = b.select(col(idCol).as("id"), lit(1).as("__pb"),
      md5(col(contentCol)).as("__hb"))
    l.join(r, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__pa").isNull, "added")
          .when(col("__pb").isNull, "removed")
          .when(!(col("__ha") <=> col("__hb")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** CDC net-effect compaction (log compaction): collapse each key's
    * I/U/D change sequence to the single operation a downstream
    * consumer needs — the standard pre-merge shrink before an X61
    * applyChanges (a key touched 10 000 times in the window still
    * produces ONE merge row).
    *
    * Net rules from (first op, last op) per key, in (ts, seq) order:
    *   - last = D, first = I → `absent` (created and deleted inside the
    *     window: nothing to apply downstream);
    *   - last = D, first ≠ I → `D`;
    *   - last ≠ D, first = I → `I` carrying the LAST value;
    *   - otherwise             → `U` carrying the LAST value.
    *
    * One keyed aggregate: first/last ride `min_by`/`max_by` over the
    * (ts, seq) struct — map-side combinable, no window, no sort; the
    * whole log shrinks to |keys| rows in a single exchange. */
  def cdcCompact(log: DataFrame, keyCol: String, opCol: String,
      tsCol: String, seqCol: String, valCol: String): DataFrame = {
    val ord = struct(col(tsCol), col(seqCol))
    log
      .groupBy(col(keyCol))
      .agg(
        min_by(col(opCol), ord).as("__first_op"),
        max_by(col(opCol), ord).as("__last_op"),
        max_by(col(valCol), ord).as("last_value"),
        count(lit(1)).as("n_changes"))
      .select(col(keyCol),
        when(col("__last_op") === "D",
          when(col("__first_op") === "I", lit("absent")).otherwise(lit("D")))
          .when(col("__first_op") === "I", lit("I"))
          .otherwise(lit("U")).as("net_op"),
        when(col("__last_op") === "D", lit(null))
          .otherwise(col("last_value")).as("last_value"),
        col("n_changes"))
      .where(col("net_op") =!= "absent")
  }
}
