package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key ordered event
  * streams — the ORDERED complement of [[CoVisit]] (which counts
  * unordered within-session co-occurrence): here (A→B) and (B→A) are
  * different cells, which is what journey analysis, next-event
  * prediction priors, and anomalous-sequence detection actually need.
  *
  * One keyed window pass derives each event's predecessor (lag over
  * (orderCols) within key — per-key history is never collected), then
  * one map-side-combinable hash agg counts (src, dst) cells. The
  * probability column is the exact-ratio device used throughout this
  * engine (X97/X137): p_ppm = n·1,000,000 div rowTotal — integer
  * division, engine-portable, no float summation order to disagree on.
  * Row totals ride a window over the |types|²-bounded transition table,
  * not the raw stream.
  *
  * Scale: the stream shuffles once by key (the lag window), the
  * transition table once by (src, dst); both aggs partial. State is
  * |types|² rows regardless of corpus size.
  */
object Markov {

  /** Transition counts + exact-ratio probabilities (parts-per-million)
    * from per-`key` event sequences ordered by `orderCols`. Output:
    * (src, dst, n, p_ppm), one row per observed transition cell. */
  def transitions(events: DataFrame, key: String, typeCol: String,
      orderCols: Seq[Column]): DataFrame =
    fromCounts(cellCounts(events, key, typeCol, orderCols))

  /** The raw (src, dst, n) cell counts — the re-aggregatable core the
    * streaming face maintains incrementally (additive under union, so
    * shard-by-shard / batch-by-batch counting composes losslessly). */
  def cellCounts(events: DataFrame, key: String, typeCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val seq = Window.partitionBy(key).orderBy(orderCols: _*)
    events
      .withColumn("__src", lag(col(typeCol), 1).over(seq))
      .where(col("__src").isNotNull)
      .groupBy(col("__src").as("src"), col(typeCol).as("dst"))
      .agg(count(lit(1)).as("n"))
  }

  /** p_ppm derivation over a (src, dst, n) cell table — shared by the
    * batch operator and the streaming face, so parity is by shared
    * code, not reimplementation. */
  def fromCounts(cells: DataFrame): DataFrame =
    cells.withColumn("p_ppm",
      expr("n * 1000000 div sum(n) over (partition by src)").cast("long"))
}
