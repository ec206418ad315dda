package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftsql.internalDf
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Grouped running totals WITHOUT a per-group single-task window — the
  * admission-cut primitive of a token-budget / quota pass ("admit
  * documents in deterministic order until each source's running token
  * total reaches N").
  *
  * `Window.partitionBy(group).orderBy(order)` with an unbounded
  * running SUM sorts and folds each group's ENTIRE stream through ONE
  * task — at 100 TB with a heavy-tailed source mix (one crawl domain =
  * a large corpus fraction, the realistic case) that is the classic
  * scale cliff, the prefix-SUM twin of the partitionless `row_number()`
  * that [[RowIds.contiguousIds]] exists to refuse. The scalable
  * formulation is the same two-phase device applied to a sum instead
  * of a count:
  *
  *  1. '''Range-partition + local sort''' on (group ++ order) —
  *     Spark's `orderBy`, so a dominant group SPANS partitions instead
  *     of collapsing onto one; groups are contiguous runs within and
  *     across partitions.
  *  2. '''Per-(partition, group) partial sums''' — one pass over the
  *     sorted partitions (`runJob`, the `zipWithIndex` count-job
  *     shape); because groups are contiguous, a partition holds at
  *     most (its distinct groups) entries, so the driver sees
  *     O(partitions + groups) rows, never data.
  *  3. '''Broadcast prefix offsets''' — for each (partition, group),
  *     the sum of the same group's partials in earlier partitions.
  *  4. '''Local emission''' — each partition streams its rows once,
  *     accumulating from its broadcast offset; the running total is
  *     appended via a reused `JoinedRow` (no external-Row round-trip,
  *     the [[RowIds]] rule).
  *
  * Cost: the sort exchange + two passes over the sorted output
  * (partials, emit) — the second pass reuses the sort's shuffle files.
  * Determinism requires (group ++ order) to be a TOTAL order (include
  * a unique id as the last key). NULL `value`s count as 0.
  */
object PrefixSum {

  /** Hard cap on phase-1 partial entries (≤ partitions + distinct
    * groups − 1, since groups are contiguous runs under the range
    * sort). Phase 2 materializes O(entries) driver state and broadcasts
    * it, so a HIGH-CARDINALITY group key (a per-row id, a raw hash)
    * would melt the driver silently — every legitimate caller keys by a
    * bounded dimension (source, stratum, level). Past this bound the
    * operator refuses loudly (checked executor-side per partition
    * BEFORE the collect, then globally): such a key needs a different
    * formulation, not a bigger driver. */
  val MaxDriverEntries: Int = 1 << 20

  /** `df` plus `cumName` = running total of `valueCol` (must be LONG)
    * within each `groupCols` key, ordered by `order` inside the group.
    * Row set and all input columns pass through unchanged.
    *
    * The input is pinned ([[graft.Caching.tracked]]) before the sort:
    * a range exchange runs a SAMPLING job over its child before the
    * shuffle itself, so an unpinned upstream chain (q82's five curation
    * stages, q191's BPE-lut join) would execute twice. The pinned slice
    * is the narrow (group, order, value) projection the callers pass,
    * not the corpus. */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], valueCol: String,
      cumName: String = "cum",
      maxEntries: Int = MaxDriverEntries): DataFrame = {
    require(!df.columns.contains(cumName),
      s"groupedRunningSum: output column '$cumName' already exists in the " +
      "input — pick a fresh name (a silent duplicate-name schema helps nobody)")
    val pinned = graft.Caching.tracked(df)
    val sorted = pinned.orderBy((groupCols.map(col) ++ order): _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val gTypes: Array[DataType] = gIdx.map(schema(_).dataType)
    val vIdx = schema.fieldIndex(valueCol)
    require(schema(vIdx).dataType == LongType,
      s"groupedRunningSum: $valueCol must be LONG, got ${schema(vIdx).dataType}")
    // group keys ride value equality in the task loop AND as driver map
    // keys — binary/nested types equal by reference there, which would
    // silently fork groups; float/double sort -0.0 and 0.0 as EQUAL
    // (interleaved runs) while boxed equals forks them, so a key can
    // recur in non-contiguous runs and phase 2's last-offset-wins map
    // would silently drop the earlier run's sum; refuse both loudly
    groupCols.zip(gTypes).foreach { case (c, dt) =>
      import org.apache.spark.sql.types._
      val valueEqual = dt match {
        case StringType | BooleanType | ByteType | ShortType | IntegerType |
             LongType | DateType | TimestampType | TimestampNTZType => true
        case _: DecimalType => true
        case _ => false
      }
      require(valueEqual,
        s"groupedRunningSum: unsupported group key type $dt for '$c' " +
        "(atomic non-binary, non-floating group keys only — float keys' " +
        "±0.0/NaN sort-vs-equals divergence forks runs)")
    }

    // copied (driver-safe) group key of the current row — UTF8Strings
    // are cloned off the reused UnsafeRow buffer
    def copyKey(r: InternalRow): List[Any] =
      gIdx.indices.iterator.map { i =>
        if (r.isNullAt(gIdx(i))) null
        else r.get(gIdx(i), gTypes(i)) match {
          case s: UTF8String => s.copy()
          case other => other
        }
      }.toList
    // allocation-free group-change check against the current copied key
    def keyMatches(r: InternalRow, k: List[Any]): Boolean = {
      var i = 0; var ks = k
      while (i < gIdx.length) {
        val v = if (r.isNullAt(gIdx(i))) null else r.get(gIdx(i), gTypes(i))
        val kv = ks.head
        if (v == null) { if (kv != null) return false }
        else if (kv == null || !v.equals(kv)) return false
        i += 1; ks = ks.tail
      }
      true
    }
    def valueAt(r: InternalRow): Long = if (r.isNullAt(vIdx)) 0L else r.getLong(vIdx)

    val rdd = sorted.queryExecution.toRdd
    val sc = df.sparkSession.sparkContext
    val maxE = maxEntries
    // phase 1: per-partition partial sums, one entry per contiguous group run
    val partials: Array[Seq[(List[Any], Long)]] = sc.runJob(rdd,
      (it: Iterator[InternalRow]) => {
        val out = scala.collection.mutable.ArrayBuffer.empty[(List[Any], Long)]
        var cur: List[Any] = null
        var started = false
        var sum = 0L
        it.foreach { r =>
          if (!started || !keyMatches(r, cur)) {
            if (started) out += ((cur, sum))
            // a single partition past the GLOBAL bound proves the key is
            // high-cardinality — fail here, before the collect ships a
            // data-sized buffer to the driver
            if (out.size >= maxE) throw new IllegalStateException(
              s"groupedRunningSum: > $maxE group runs in one " +
              s"partition (group key ${groupCols.mkString(",")} is " +
              "high-cardinality; this operator keys by bounded dimensions " +
              "only — see PrefixSum.MaxDriverEntries)")
            cur = copyKey(r); sum = 0L; started = true
          }
          sum += valueAt(r)
        }
        if (started) out += ((cur, sum))
        out.toSeq
      })
    // group-cardinality guard: phase 2 holds O(entries) driver state and
    // broadcasts it — refuse loudly rather than melt the driver
    val nEntries = partials.iterator.map(_.size.toLong).sum
    require(nEntries <= maxE,
      s"groupedRunningSum: $nEntries (partition, group) partial entries " +
      s"exceed maxEntries=$maxE — group key " +
      s"${groupCols.mkString(",")} is too high-cardinality for the " +
      "broadcast-offset formulation")
    // phase 2 (driver, O(partitions + groups)): prefix offsets per
    // (partition, group) — the sum of the same group's earlier partials
    val running = scala.collection.mutable.HashMap.empty[List[Any], Long]
    val offsets: Array[Map[List[Any], Long]] = partials.map { ps =>
      ps.map { case (k, s) =>
        val off = running.getOrElse(k, 0L)
        running(k) = off + s
        k -> off
      }.toMap
    }
    val bc = sc.broadcast(offsets)
    // phase 3: local emission — offset + local running sum per partition
    val withCum = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bc.value(pid)
      val joined = new JoinedRow
      val cumRow = new GenericInternalRow(1)
      var cur: List[Any] = null
      var started = false
      var acc = 0L
      it.map { r =>
        if (!started || !keyMatches(r, cur)) {
          cur = copyKey(r); acc = off.getOrElse(cur, 0L); started = true
        }
        acc += valueAt(r)
        cumRow.setLong(0, acc)
        joined(r, cumRow): InternalRow
      }
    }
    val outSchema: StructType = schema.add(cumName, LongType, nullable = false)
    internalDf(df.sparkSession, withCum, outSchema)
  }

  /** Dense 1-based per-group rank under `order` — `row_number().over(
    * Window.partitionBy(group))` WITHOUT the per-group single-task
    * window: the prefix-COUNT face of the same device, i.e.
    * [[groupedRunningSum]] over a ones column. Same determinism
    * contract (the order must be total within the group). */
  def groupedRank(df: DataFrame, groupCols: Seq[String],
      order: Seq[Column], rankName: String = "rank"): DataFrame = {
    require(!df.columns.contains("__psum_one"),
      "groupedRank: input already carries the internal __psum_one column")
    groupedRunningSum(df.withColumn("__psum_one",
        org.apache.spark.sql.functions.lit(1L)),
        groupCols, order, "__psum_one", rankName)
      .drop("__psum_one")
  }
}
