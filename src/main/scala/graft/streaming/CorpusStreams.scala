package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.operators.{Anomaly, Decay, NearDup, Sketches}

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

  /** Streaming heavy hitters (X135, the streaming face of
    * [[graft.operators.Sketches.heavyHitters]]): state is a
    * Misra–Gries summary — ≤k (item, counter) rows + the running total
    * — merged per micro-batch with the SAME PODS'12 reduction the batch
    * aggregate applies (counter-wise sum, subtract the (k+1)-largest,
    * drop ≤0), so state stays O(k) forever regardless of stream volume
    * and vocabulary. The guarantee survives composition: after ANY
    * batch boundaries, every item with total count > n/k is in the
    * state, and each counter undercounts by at most n/k — `sink`
    * receives (item, cnt_lower, n_total) and applies its own
    * threshold. Versioned by batch id (v=N reads v=N−1) exactly like
    * [[decayedIngest]]: re-delivered batches recompute, never
    * double-count. The (k+1)-largest cut is one ≤(k+1)-row
    * TakeOrdered to the driver — control-plane, the BPE-scalar
    * pattern. */
  def heavyHitterIngest(items: DataFrame, itemCol: String, k: Int,
      stateDir: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    items.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
        val spark = batch.sparkSession
        val summary = batch
          .select(col(itemCol).cast("string").as("item"))
          .agg(exprColumn(graft.functions.MisraGriesAgg(
              columnExpr(col("item")), k, emitCounts = true)
            .toAggregateExpression()).as("s"),
            count(lit(1)).as("n"))
          .select(explode_outer(col("s")).as("e"), col("n"))
          .select(coalesce(col("e.item"), lit("")).as("item"),
            coalesce(col("e.cnt"), lit(0L)).as("cnt"), col("n"))
          .where(col("cnt") > 0)
        val prevPath = s"$stateDir/v=${id - 1}"
        val prev = if (new java.io.File(prevPath).exists())
            Some(spark.read.parquet(prevPath)) else None
        val unioned = prev match {
          case Some(p) => p.select("item", "cnt", "n").unionByName(summary)
          case None => summary
        }
        val summed = unioned.groupBy("item")
          .agg(sum("cnt").as("cnt"))
        // every row of a version carries the same n — read one, not sum
        // (the "" sentinel row below guarantees a version is never empty)
        val nPrev = prev.map(_.select("n").head.getLong(0)).getOrElse(0L)
        val nBatch = batch.count()
        val n = nPrev + nBatch
        val top = summed.orderBy(desc("cnt"), col("item")).limit(k + 1)
          .collect()
        val reduced =
          if (top.length > k) {
            val cut = top(k).getAs[Long]("cnt")
            summed.select(col("item"), (col("cnt") - lit(cut)).as("cnt"))
              .where(col("cnt") > 0)
          } else summed
        val sentinel = spark.range(1)
          .select(lit("").as("item"), lit(0L).as("cnt"))
        reduced.where(col("item") =!= "").unionByName(sentinel)
          .withColumn("n", lit(n))
          .write.mode("overwrite").parquet(s"$stateDir/v=$id")
        sink(spark.read.parquet(s"$stateDir/v=$id")
          .where(col("cnt") > 0)
          .select(col("item"), col("cnt").as("cnt_lower"),
            col("n").as("n_total")), id)
      }

  /** Streaming trailing-window anomaly scores (X144, the streaming face
    * of [[graft.operators.Anomaly]]): state is the SAME (key, day,
    * count) table the X127 decay ingest maintains — bounded by keys ×
    * active days, merged per batch, versioned for re-delivery
    * idempotence — and each batch re-scores it through the IDENTICAL
    * batch window code, so streaming == batch is by shared code, not
    * reimplementation. The tripwire this buys: the day a batch lands,
    * its z-score is already current. */
  def anomalyIngest(events: DataFrame, key: String, tsCol: String,
      stateDir: String, sigma: Double = 2.0)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import org.apache.spark.sql.functions._
        val spark = batch.sparkSession
        val newCounts = Decay.dayCounts(batch, key, tsCol)
        val prevPath = s"$stateDir/v=${id - 1}"
        val merged = (if (new java.io.File(prevPath).exists())
            spark.read.parquet(prevPath).unionByName(newCounts)
          else newCounts)
          .groupBy("__k", "__d")
          .agg(sum("__c").as("__c"))
        merged.write.mode("overwrite").parquet(s"$stateDir/v=$id")
        val daily = spark.read.parquet(s"$stateDir/v=$id")
          .select(col("__k").as(key),
            expr("date_add(date '1970-01-01', cast(__d AS int))").as("day"),
            col("__c").as("n"))
        sink(Anomaly.trailingZScoresDaily(daily, key, sigma), id)
      }

  /** Streaming sliding-window distinct (X145, the streaming face of
    * X138): state is the per-day KMV sketch table — O(k) per active
    * day regardless of batch volume — merged per batch with the X126
    * sketch algebra (`slice(array_sort(array_union), 1, k)` per
    * same-day pair), versioned like every ingest here. Each batch
    * re-derives the sliding answer from the merged state through the
    * SAME batch code ([[Sketches.slidingFromDailySketches]]). */
  def slidingDistinctIngest(events: DataFrame, keyCol: String,
      tsCol: String, k: Int, windowDays: Int, stateDir: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import org.apache.spark.sql.functions._
        val spark = batch.sparkSession
        val newDaily = Sketches.kmvDailySketches(batch, keyCol, tsCol, k)
        val prevPath = s"$stateDir/v=${id - 1}"
        val merged = (if (new java.io.File(prevPath).exists())
            spark.read.parquet(prevPath).unionByName(newDaily)
          else newDaily)
          .groupBy("day")
          .agg(slice(array_sort(array_distinct(flatten(
            collect_list(col("sk"))))), 1, k).as("sk"))
        merged.write.mode("overwrite").parquet(s"$stateDir/v=$id")
        sink(Sketches.slidingFromDailySketches(
          spark.read.parquet(s"$stateDir/v=$id"), k, windowDays), id)
      }

  /** Late-arriving dimension handling (X161): the classic streaming-ETL
    * pattern a naive stream-dimension join silently corrupts — a fact
    * whose dimension row hasn't landed yet must be PARKED, not dropped
    * and not null-joined, and re-probed on every subsequent batch
    * against the CURRENT dimension snapshot (dimensions are re-read per
    * batch, so late dim arrivals resolve parked facts without any
    * reprocessing of resolved history).
    *
    * State = the parked-facts table, versioned by batch id like every
    * ingest here (re-delivery recomputes, never double-emits); its size
    * is bounded by genuinely-unresolvable facts, not history. Each
    * batch: one union of (park, new), one equi-join against the dim
    * snapshot (broadcast when the dim is small), one anti-join for the
    * new park. `sink` receives the batch's RESOLVED rows. */
  def lateDimIngest(facts: DataFrame, dimPath: String, key: String,
      stateDir: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    facts.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import org.apache.spark.sql.functions._
        val spark = batch.sparkSession
        val dim = spark.read.parquet(dimPath)
        val prevPath = s"$stateDir/v=${id - 1}"
        val todo = (if (new java.io.File(prevPath).exists())
            spark.read.parquet(prevPath).unionByName(batch)
          else batch)
        val resolved = todo.join(dim, Seq(key))
        todo.join(dim.select(key), Seq(key), "left_anti")
          .write.mode("overwrite").parquet(s"$stateDir/v=$id")
        sink(resolved, id)
      }
}
