package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.NearDup

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
}
