package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join via band bucketing.
  *
  * A naive `l.join(r, key && rts.between(lts - w, lts))` plans as a
  * nested-loop per key group; instead we coarsen time into buckets of the
  * window width, equi-join on (key, bucket) — each left row probes its own
  * and the previous bucket — and apply the exact range predicate after.
  * The join is then a plain hash-partitioned equi-join: shuffle O(|L|+|R|),
  * per-pair work bounded by genuine time-proximity, which is the property
  * that still holds at 100 TB (band width tunes the bucket fan-out).
  */
object RangeJoin {

  /** Pairs (left row, right row) with the same `key` and
    * rightTs in [leftTs - windowSeconds, leftTs). Right payload columns are
    * carried in a struct `range_match`; left columns pass through. */
  def priorWindowJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowSeconds: Long,
      payload: Seq[String]): DataFrame = {
    val w = windowSeconds * 1000000L // micros
    val l = left.withColumn("__lb",
      explode(array(expr(s"unix_micros($leftTs) div $w") - 1,
        expr(s"unix_micros($leftTs) div $w"))))
    val r = right
      .withColumn("__rb", expr(s"unix_micros($rightTs) div $w"))
      .select(col(key).as("__rk"), col(rightTs).as("__rts"), col("__rb"),
        struct(payload.map(col): _*).as("range_match"))
    l.join(r, l(key) === r("__rk") && col("__lb") === col("__rb") &&
        col("__rts") >= (l(leftTs) - expr(s"INTERVAL $windowSeconds SECONDS")) &&
        col("__rts") < l(leftTs))
      .drop("__lb", "__rb", "__rk", "__rts")
  }
}
