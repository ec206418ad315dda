package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.{Decay, NearDup}

/** Streaming faces of the corpus-pipeline operators.
  *
  * The ingest-time near-dup gate runs per micro-batch via
  * `foreachBatch`: shingle-hash joins against a STATIC index are not
  * expressible as a continuous streaming join (two aggregations + a
  * join on a derived key), and per-batch semantics are exactly what
  * ingest wants — every arriving snapshot is verdicted against the
  * index as of its arrival. This is the standard Structured Streaming
  * composition pattern for reusing a batch operator (same shape as
  * StreamingLoader.loadSongs).
  */
object CorpusStreams {

  /** Wire the X91 incremental near-dup verdicts onto a document stream:
    * each micro-batch is probed against `index` (shingle-hash equi-join,
    * no self-join, no history rescan) and the per-doc verdicts are
    * handed to `sink`. Checkpointing/trigger/output are left to the
    * caller via the returned writer — call `.start()` to run.
    *
    * At scale the index side is the bucketed-by-hash snapshot, so each
    * micro-batch join is shuffle-free on the index; stream state is
    * EMPTY (the batch is verdicted and released — state lives in the
    * index table, not the stream). */
  def nearDupIngest(docs: DataFrame, index: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.5)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(NearDup.incrementalDedupVerdicts(
          batch, index, idCol, textCol, n, threshold), id)
      }

  /** Incrementally-maintained half-life-decayed counts (X127, the
    * streaming face of [[graft.operators.Decay]]): each micro-batch
    * reduces to its (key, day) counts and MERGES into a state table
    * that is bounded by keys × active days regardless of event volume —
    * no history rescan, the X80-style maintenance shape. State is
    * versioned BY BATCH ID (`state_dir/v=<batchId>` reads v=batchId−1),
    * so a re-delivered batch recomputes the same version from the same
    * predecessor instead of double-counting — idempotence under
    * exactly-once replay comes from the versioning, not from the sink.
    * `sink` receives the decayed scores derived from the merged state
    * (the identical fold the batch operator runs — parity is by shared
    * code, and spec-asserted across arbitrary batch boundaries). */
  def decayedIngest(events: DataFrame, key: String, tsCol: String,
      halfLifeDays: Int, stateDir: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val newCounts = Decay.dayCounts(batch, key, tsCol)
        val prevPath = s"$stateDir/v=${id - 1}"
        val merged = (if (new java.io.File(prevPath).exists())
            spark.read.parquet(prevPath).unionByName(newCounts)
          else newCounts)
          .groupBy("__k", "__d")
          .agg(org.apache.spark.sql.functions.sum("__c").as("__c"))
        merged.write.mode("overwrite").parquet(s"$stateDir/v=$id")
        sink(Decay.decayedFromDayCounts(
          spark.read.parquet(s"$stateDir/v=$id"), key, halfLifeDays), id)
      }
}
