package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows no other row strictly
  * dominates, for a maximize-`x` / minimize-`y` objective pair — the
  * multi-objective selection a curation run uses to trade quality
  * against cost (keep documents on the quality-vs-token-count frontier;
  * everything below it is beaten on both axes by something kept).
  *
  * Dominance: b dominates a iff b.x ≥ a.x ∧ b.y ≤ a.y ∧ (b.x > a.x ∨
  * b.y < a.y). Identical points do not dominate each other — all ties
  * on the frontier are kept.
  *
  * Scale shape — the skyline algebra, not a window: the frontier of a
  * union is the frontier of the union of per-part frontiers (dominance
  * is transitive and set-determined), so each partition reduces itself
  * to its LOCAL frontier with one sort + linear scan (expected frontier
  * size on non-adversarial data is O(log n) per partition), and only
  * those survivors — not the corpus — reach the single final-merge
  * task. The alternative partitionless cummin window would drag every
  * row through one task; this shape ships ~log-sized partials, the same
  * partial/final split as an aggregate. The result is a pure function
  * of the row SET, so partitioning cannot change it (spec-asserted).
  *
  * The expected O(log n) survivor count is NOT assumed (round 14): a
  * near-anti-chain input (quality ≈ monotone in cost) makes every row
  * a local survivor, and feeding O(n) rows to one merge task is the
  * cliff this operator exists to avoid. The merge is therefore
  * BOUNDED: local survivors are counted (they are persisted anyway for
  * the merge), and while the count exceeds `mergeBound` the operator
  * TREE-MERGES — repartition the survivors `fanIn`-ways narrower and
  * re-run the local frontier, each level a full barrier that can only
  * shrink the set — until the bound holds, partitions stop shrinking,
  * or a level fails to shrink the survivor COUNT (the set is a
  * near-anti-chain; further fan-in cannot help, so the loop breaks
  * instead of burning barriers). On a true anti-chain the frontier IS
  * the input: no algorithm feeds it through less than its own size,
  * and the final single-partition merge then pulls all n survivors
  * through one task — the tree levels bound every INTERMEDIATE task by
  * partition width, but that last merge is O(n) in one task in the
  * worst case (the price of a global frontier; the bound only caps
  * when it engages). */
object Skyline {

  /** Frontier rows of `df` under (maximize `xCol`, minimize `yCol`),
    * original columns preserved. */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String,
      mergeBound: Long = 1L << 20, fanIn: Int = 8): DataFrame =
    paretoFrontierStats(df, xCol, yCol, mergeBound, fanIn)._1

  /** [[paretoFrontier]] plus the number of tree-merge levels the
    * survivor bound engaged (0 = direct merge) — spec-visible so the
    * fallback is pinned by a test, not a scaladoc claim. */
  private[graft] def paretoFrontierStats(df: DataFrame, xCol: String,
      yCol: String, mergeBound: Long, fanIn: Int): (DataFrame, Int) = {
    val spark = df.sparkSession
    val schema = df.schema
    val xi = schema.fieldIndex(xCol)
    val yi = schema.fieldIndex(yCol)
    def num(r: Row, i: Int): Double = r.get(i) match {
      case n: java.lang.Number => n.doubleValue()
      case other => sys.error(s"paretoFrontier: non-numeric value $other")
    }
    // local frontier: sort by (x desc, y asc); a row survives iff its y
    // is strictly below every strictly-better-x row's best y, and not
    // beaten by an equal-x row with smaller y (the scan keeps exact ties)
    def localFrontier(it: Iterator[Row]): Iterator[Row] = {
      val rows = it.toArray
      val sorted = rows.sortBy(r => (-num(r, xi), num(r, yi)))
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var bestY = Double.PositiveInfinity  // best y among strictly-better x
      var groupX = Double.NaN
      var groupMinY = Double.PositiveInfinity
      sorted.foreach { r =>
        val x = num(r, xi); val y = num(r, yi)
        if (x != groupX) {                 // entering a new x group
          if (!groupX.isNaN) bestY = math.min(bestY, groupMinY)
          groupX = x; groupMinY = y
        }
        // dominated by higher-x (y >= bestY) or by equal-x smaller-y
        if (y < bestY && y <= groupMinY) out += r
        groupMinY = math.min(groupMinY, y)
      }
      out.iterator
    }
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    // persisted (scope-TRACKED, the Caching contract: the returned plan
    // reads the survivor set, so callers/harnesses own the release)
    // because the survivor count (the bound check) and the merge both
    // read it; survivors are expected-log-sized, and on the adversarial
    // inputs where they aren't, counting is exactly the point
    var cur = graft.Caching.tracked(df.mapPartitions(localFrontier _))
    var n = cur.count()
    var levels = 0
    // stop when a level fails to SHRINK the survivor count: the set is a
    // near-anti-chain and further fan-in only adds barriers, not bound
    var lastN = Long.MaxValue
    while (n > mergeBound && cur.rdd.getNumPartitions > 1 && n < lastN) {
      lastN = n
      val narrower = math.max(1, cur.rdd.getNumPartitions / math.max(2, fanIn))
      val next = graft.Caching.tracked(
        cur.repartition(narrower).mapPartitions(localFrontier _))
      n = next.count()
      cur.unpersist()
      cur = next
      levels += 1
    }
    // final merge over the (bounded) union of surviving local frontiers;
    // a single-partition survivor set already IS its own local frontier
    if (cur.rdd.getNumPartitions <= 1) (cur, levels)
    else (cur.repartition(1).mapPartitions(localFrontier _), levels)
  }
}
