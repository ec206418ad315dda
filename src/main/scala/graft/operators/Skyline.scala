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
  * of the row SET, so partitioning cannot change it (spec-asserted). */
object Skyline {

  /** Frontier rows of `df` under (maximize `xCol`, minimize `yCol`),
    * original columns preserved. */
  def paretoFrontier(df: DataFrame, xCol: String, yCol: String): DataFrame = {
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
    val locals = df.mapPartitions(localFrontier _)
    // final merge over the (small) union of local frontiers
    locals.repartition(1).mapPartitions(localFrontier _)
  }
}
