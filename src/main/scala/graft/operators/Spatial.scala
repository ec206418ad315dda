package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D radius self-join via grid-cell banding — the spatial member of
  * the banded-join family (time buckets: [[RangeJoin]], hamming blocks:
  * [[NearDup.hammingPairs]], prefix shingles: [[SetSimJoin]]).
  *
  * A naive `a.join(b, distSq <= r*r)` is a theta join (cartesian at any
  * scale). Instead the plane is cut into radius-sized grid cells: any
  * pair within distance r lies in the same or an adjacent cell, so the
  * probe side explodes to its 3×3 cell neighborhood, the build side
  * keeps its own cell, and the join is a plain hash-partitioned
  * equi-join on the cell key with the EXACT integer distance predicate
  * applied after. Each point lives in exactly one build cell, so every
  * qualifying pair is emitted exactly once — no post-dedup.
  *
  * Scale: shuffle O(9·|P|) probe + O(|P|) build rows of (id, x, y)
  * each — constant width, never payload; per-cell work is bounded by
  * genuine point density (cell area = r², so a cell holds ~ρ·r²
  * points and per-pair work tracks real proximity, the property that
  * holds at 100 TB). Density skew (a hot cell) is the same valve as
  * every banded join here: cap or salt the hot cell key — documented,
  * not silently applied.
  */
object Spatial {

  /** Pairs (id_a < id_b, dist_sq) of `points` rows whose integer
    * coordinates lie within `radius` in L2 — dist_sq = (xa−xb)² +
    * (ya−yb)² ≤ radius², exact BIGINT arithmetic end-to-end (no float
    * in the predicate or the output, so a SQL oracle replays it
    * bit-for-bit). Coordinates may be ANY sign: cell keys use true
    * floor division (see [[cellKey]]), so cells never merge across the
    * axes — round 11 fix; truncating `div` silently dropped
    * within-radius pairs near the origin for negative coords. */
  def radiusSelfJoin(points: DataFrame, id: String, x: String, y: String,
      radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    val p = points.select(
      col(id).cast("long").as("__id"),
      col(x).cast("long").as("__x"),
      col(y).cast("long").as("__y"))
    val dsq = (col("__x") - col("__bx")) * (col("__x") - col("__bx")) +
      (col("__y") - col("__by")) * (col("__y") - col("__by"))
    probeSide(p, radius).join(buildSide(p, radius), Seq("__cx", "__cy"))
      .where(col("__id") < col("__bid") && dsq <= lit(radius * radius))
      .select(col("__id").as("id_a"), col("__bid").as("id_b"),
        dsq.cast("long").as("dist_sq"))
  }

  /** Cross-TABLE radius join — the incremental shape of
    * [[radiusSelfJoin]]: every (left, right) pair within `radius`,
    * emitted once with ids normalized id_a < id_b (ids must be unique
    * across BOTH tables). Left explodes to its 3×3 cell neighborhood,
    * right keeps its one cell, so each qualifying pair meets in
    * exactly one (cell, offset) — no post-dedup. The ingest shape:
    * left = an arriving batch of points, right = the committed point
    * index. */
  def radiusCrossJoin(left: DataFrame, right: DataFrame, id: String,
      x: String, y: String, radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    def norm(df: DataFrame) = df.select(
      col(id).cast("long").as("__id"),
      col(x).cast("long").as("__x"),
      col(y).cast("long").as("__y"))
    val dsq = (col("__x") - col("__bx")) * (col("__x") - col("__bx")) +
      (col("__y") - col("__by")) * (col("__y") - col("__by"))
    probeSide(norm(left), radius).join(buildSide(norm(right), radius),
        Seq("__cx", "__cy"))
      .where(col("__id") =!= col("__bid") && dsq <= lit(radius * radius))
      .select(least(col("__id"), col("__bid")).as("id_a"),
        greatest(col("__id"), col("__bid")).as("id_b"),
        dsq.cast("long").as("dist_sq"))
  }

  /** Floor-division cell key: `(v − pmod(v, r)) div r` equals
    * floor(v/r) for any sign of v (pmod is non-negative for positive
    * r), where a plain `div` truncates toward zero and would merge the
    * cells straddling each axis — silently dropping within-radius
    * pairs for negative coordinates. Integer-exact end-to-end. */
  private def cellKey(v: String, radius: Long) =
    expr(s"($v - pmod($v, $radius)) div $radius")

  private def buildSide(p: DataFrame, radius: Long): DataFrame =
    p.select(
      col("__id").as("__bid"), col("__x").as("__bx"), col("__y").as("__by"),
      cellKey("__x", radius).as("__cx"),
      cellKey("__y", radius).as("__cy"))

  private def probeSide(p: DataFrame, radius: Long): DataFrame =
    p.withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("__id"), col("__x"), col("__y"),
        (cellKey("__x", radius) + col("__dx")).as("__cx"),
        (cellKey("__y", radius) + col("__dy")).as("__cy"))
}
