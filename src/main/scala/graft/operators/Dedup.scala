package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference dedups with pandas `drop_duplicates(subset=[key])`
  * (reference: Airflow-docker/dags/spotify-airflow-pipeline.py:108,130),
  * whose keep-first semantics depend on input order. Spark's
  * `dropDuplicates` picks a nondeterministic victim, so the deterministic
  * equivalent is a row_number window over an explicit tiebreak ordering
  * (SURVEY.md §2.8 W2).
  *
  * Scale notes (100 TB): the window costs one hash-partition shuffle on
  * `keys` — same cost as any distributed dedup. Skewed keys should be
  * pre-salted by the caller or left to AQE skew handling; no driver-side
  * state, no collect.
  */
object Dedup {

  /** Keep exactly one row per key, the first under `order` (ascending,
    * plain columns — not SortOrder). Deterministic when `order` is total
    * within each key.
    *
    * Implemented as a `min_by` hash aggregate rather than a row_number
    * window: min_by is partial-aggregatable, so each map task folds its
    * rows down to one candidate per key BEFORE the exchange — the shuffle
    * carries |keys| rows, not the whole input, and nothing is sorted. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val payload = df.columns.toSeq.filterNot(keys.contains)
    // all columns are keys → "first per key" degenerates to distinct
    // (min_by over an empty struct would be malformed)
    if (payload.isEmpty) return df.distinct()
    df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(payload.map(col): _*), struct(order: _*)).as("__first"))
      .select(df.columns.toSeq.map(c =>
        // getField, not col("__first."+c): a payload name containing dots
        // ("a.b") must resolve as one field, not a nested path
        if (keys.contains(c)) col(c) else col("__first").getField(c).as(c)): _*)
  }

  /** Exact duplicate groups by content hash of `textCol`: one output row per
    * distinct content, with the group size and the smallest id as keeper.
    * Single hash-agg shuffle; mergeable partial aggregates. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper_id"))

  /** Incremental (batch-vs-history) dedup: the daily-ingest shape — the
    * new batch dedups against everything already ACCEPTED without ever
    * touching the historical corpus itself, only its fingerprint table
    * (one md5 per accepted document, the running state a pipeline
    * persists between runs).
    *
    * Returns the batch rows that survive, `fingerprint` appended (the
    * rows whose fingerprints the caller appends to the history table).
    * Two steps, both batch-sized: keep-first inside the batch (min_by
    * hash agg — a batch can carry internal dups), then a left-anti join
    * against the fingerprint table. At 100 TB-of-history the anti join
    * shuffles |batch| + |history fingerprints| hashes — never documents;
    * a small batch against a huge history is exactly the shape Spark's
    * broadcast/shuffled-hash anti join handles. */
  def incrementalNew(batch: DataFrame, idCol: String, textCol: String,
      historyFingerprints: DataFrame): DataFrame = {
    val hist = historyFingerprints.select(col("fingerprint")).distinct()
    keepFirst(batch.withColumn("fingerprint", md5(col(textCol))),
        keys = Seq("fingerprint"), order = Seq(col(idCol)))
      .join(hist, Seq("fingerprint"), "left_anti")
  }

  /** [[incrementalNew]] against a PRE-STAGED bucketed fingerprint table
    * ([[DedupIndex]] — X57's production ingest face). Two deliberate
    * differences from the ad-hoc path: the index's rows are trusted
    * distinct ([[fingerprints]] writes the table, so no re-distinct
    * scan of 100 TB-of-history fingerprints per batch), and the anti
    * join is merge-hinted — a broadcast anti would put a
    * BroadcastExchange over the index side, which at real history
    * sizes is the one side that must NOT move. With the table bucketed
    * on `fingerprint` the scan already satisfies the join's
    * distribution, and the batch side's keep-first aggregate exchange
    * doubles as its join exchange: the whole probe plans with ZERO
    * index-side shuffle (Round15Spec asserts it). */
  def incrementalNewIndexed(batch: DataFrame, idCol: String, textCol: String,
      fingerprintIndex: DataFrame): DataFrame =
    keepFirst(batch.withColumn("fingerprint", md5(col(textCol))),
        keys = Seq("fingerprint"), order = Seq(col(idCol)))
      .join(fingerprintIndex.select(col("fingerprint")).hint("merge"),
        Seq("fingerprint"), "left_anti")

  /** The fingerprint-table side of [[incrementalNew]]: one `fingerprint`
    * row per distinct accepted content. */
  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("fingerprint")).distinct()
}
