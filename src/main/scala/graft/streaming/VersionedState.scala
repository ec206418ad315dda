package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Batch-id-versioned streaming state — the one re-delivery-idempotence
  * protocol every stateful ingest in [[CorpusStreams]] shares.
  *
  * Protocol: the step for micro-batch N reads state version `v=N−1`,
  * merges the batch's contribution, and overwrites `v=N`. A
  * re-delivered batch (same Structured Streaming batch id after a
  * restart) recomputes the SAME version from the SAME predecessor —
  * idempotence comes from the versioning, not from the sink, so any
  * at-least-once sink composes to exactly-once state. State size is
  * whatever the merge bounds it to (keys × days, O(k) summaries, parked
  * rows) — never history.
  *
  * At scale each version is a parquet table partitioned like any other;
  * the merge is one keyed exchange over (state ∪ batch), where state is
  * the compact summary, not the stream history.
  */
object VersionedState {

  def path(stateDir: String, id: Long): String = s"$stateDir/v=$id"

  /** State version `v=id`, if it has been committed. */
  def read(spark: SparkSession, stateDir: String, id: Long): Option[DataFrame] = {
    val p = path(stateDir, id)
    if (new java.io.File(p).exists()) Some(spark.read.parquet(p)) else None
  }

  /** Overwrite `v=id` with `df` and return the committed version
    * (re-read from disk, so downstream plans scan the compact state
    * file instead of re-deriving the merge lineage). */
  def commit(df: DataFrame, stateDir: String, id: Long): DataFrame = {
    df.write.mode("overwrite").parquet(path(stateDir, id))
    df.sparkSession.read.parquet(path(stateDir, id))
  }

  /** The generic merge step: union `v=id−1` (column-aligned to the new
    * rows' schema) with the batch's rows, reduce with `reduce`, commit
    * as `v=id`. */
  def merge(newRows: DataFrame, stateDir: String, id: Long)(
      reduce: DataFrame => DataFrame): DataFrame = {
    val spark = newRows.sparkSession
    val unioned = read(spark, stateDir, id - 1) match {
      case Some(prev) =>
        prev.select(newRows.columns.map(col).toIndexedSeq: _*)
          .unionByName(newRows)
      case None => newRows
    }
    commit(reduce(unioned), stateDir, id)
  }

  /** The commonest reduce — additive counters keyed by `keys`. */
  def mergeCounts(newRows: DataFrame, keys: Seq[String], cntCol: String,
      stateDir: String, id: Long): DataFrame =
    merge(newRows, stateDir, id)(
      _.groupBy(keys.map(col).toIndexedSeq: _*).agg(sum(cntCol).as(cntCol)))

  /** The shared writer shell: update-mode AvailableNow foreachBatch.
    * Checkpointing/output are left to the caller via the returned
    * writer — call `.start()` to run. */
  def ingest(src: DataFrame)(
      step: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    src.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch(step)
}
