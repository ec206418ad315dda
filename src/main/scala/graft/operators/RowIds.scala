package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graftsql.internalDf
import org.apache.spark.sql.types.LongType

/** Contiguous global row numbering under a total order — the shard/offset
  * assignment step of a training pipeline (examples need stable, dense
  * ordinals for curriculum order, resumable data loaders, split manifests).
  *
  * `monotonically_increasing_id` is neither dense nor order-stable, and a
  * `row_number()` window with no partition key collapses the whole dataset
  * onto ONE task — the classic 100 TB cliff. The scalable formulation is
  * two-phase: range-partition + local sort (Spark's `orderBy`), then count
  * rows per partition, broadcast the partition offsets, and emit
  * offset + local position per partition. That is exactly what RDD
  * `zipWithIndex` implements (one count job over all partitions but the
  * last, then a lazy per-partition map) — this is the one operator family
  * where dropping to the RDD API is the honest design: the per-partition
  * ordinal is imperative state no Catalyst expression models.
  *
  * The RDD hop stays INTERNAL: `queryExecution.toRdd` feeds zipWithIndex
  * UnsafeRows directly and the id is appended via a reused JoinedRow, so
  * no element ever round-trips through an external `Row` (the naive
  * `df.rdd` + `Row.fromSeq` formulation converts every value twice —
  * real money at 100 TB row counts); the scan over the returned
  * DataFrame re-projects to UnsafeRow per partition, which is the same
  * copy the old path paid anyway.
  *
  * Cost: the sort exchange + two passes over the sorted output (count,
  * emit). Determinism requires `order` to be a total order (include a
  * unique id as the last key).
  */
object RowIds {

  /** `df` plus a dense 0-based `seq` column assigned in `order`. */
  def contiguousIds(df: DataFrame, order: Seq[Column],
      idName: String = "seq"): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val outSchema = sorted.schema.add(idName, LongType, nullable = false)
    val withIds = sorted.queryExecution.toRdd.zipWithIndex()
      .mapPartitions { it =>
        // reused wrappers are safe: the downstream RDD scan projects each
        // row to its own UnsafeRow before anything buffers it
        val joined = new JoinedRow
        val idRow = new GenericInternalRow(1)
        it.map { case (r, i) =>
          idRow.setLong(0, i)
          joined(r, idRow): org.apache.spark.sql.catalyst.InternalRow
        }
      }
    internalDf(df.sparkSession, withIds, outSchema)
  }
}
