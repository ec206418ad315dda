package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the time-series join Spark lacks as a
  * built-in operator.
  *
  * Implementation is the scalable union+window form, NOT an inequality
  * join: tag both sides, union, then one window pass per key ordered by
  * (ts, side, tiebreak) carrying the last non-null right payload forward.
  * Cost = ONE hash-partition shuffle on the key + a per-partition sort —
  * O((|L|+|R|) log) overall, versus the O(|L|·|R|) nested-loop an
  * inequality join degenerates to. At 100 TB the key-partitioned sort is
  * exactly what a range/sort-merge engine would do; skewed keys fall back
  * to AQE skew splitting.
  *
  * Semantics: for each left row, the right row with the greatest
  * `rightTs` <= left ts (ties on rightTs broken by greatest `tieBreak`),
  * or null payload if none precedes it.
  */
object AsOfJoin {

  /** Left as-of join. `payload` = right columns to carry (must include
    * rightTs if wanted in the output). Returns all left columns plus
    * `asof` — a struct of the matched right payload (null if no match). */
  def asOfLeft(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: String): DataFrame = {
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      col(tieBreak).cast("long").as("__tb"),
      struct(payload.map(col): _*).as("__r"))
    val rType = r.schema("__r").dataType
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      lit(null).cast(rType).as("__r"),
      struct(left.columns.toIndexedSeq.map(col): _*).as("__l"))
    val lType = l.schema("__l").dataType
    val u = l.unionByName(r.withColumn("__l", lit(null).cast(lType)))
    // at equal ts the right row sorts first (side 0 < 1) => inclusive "<="
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__asof").as("asof"))
  }
}
