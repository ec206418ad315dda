package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling — the graph-density filter a curation pipeline
  * runs after building the kNN graph: nodes that survive the k-core sit
  * in dense semantic neighborhoods (topical clusters worth
  * oversampling), early-peeled nodes are weakly-connected outliers. A
  * full k-core decomposition iterates to a data-dependent fixpoint; the
  * pipeline form is FIXED-ROUND peeling (removal round = a coarse
  * coreness rank, exactly like X77's fixed PageRank iterations), which
  * keeps the job count bounded and the result oracle-replayable.
  *
  * Per round: one two-sided semi-join of the bidirected edge table
  * against the alive set + one degree agg + one anti-join — all hash
  * equi-joins on node ids; at kNN-graph degree ≤ 2k the per-round edge
  * volume only shrinks. Lineage is cut per round (localCheckpoint, the
  * X77 discipline) so round i never replays rounds 1..i−1. */
object KCore {

  /** Peel `rounds` rounds toward the `k`-core. `nodes`: (vec_id);
    * `edges`: undirected (vec_a, vec_b). Returns one row per node:
    * (vec_id, removed_round — NULL if alive after `rounds`,
    * final_deg — degree within the surviving set, NULL if removed). */
  def peel(nodes: DataFrame, edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val bid = graft.Caching.tracked(
      edges.select(col("vec_a").as("src"), col("vec_b").as("dst"))
        .unionByName(edges.select(col("vec_b").as("src"), col("vec_a").as("dst"))))
    var state = nodes.select(col("vec_id"),
      lit(null).cast("long").as("removed_round"))
    for (r <- 1 to rounds) {
      val alive = state.where(col("removed_round").isNull).select("vec_id")
      val deg = bid
        .join(alive.withColumnRenamed("vec_id", "src"), Seq("src"))
        .join(alive.withColumnRenamed("vec_id", "dst"), Seq("dst"))
        .groupBy(col("src").as("vec_id")).agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select("vec_id")
        .withColumn("__keep", lit(true))
      state = state.join(keep, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("removed_round").isNotNull, col("removed_round"))
            .when(col("__keep").isNull, lit(r.toLong))
            .otherwise(lit(null).cast("long")).as("removed_round"))
        .localCheckpoint(eager = false)
    }
    val alive = state.where(col("removed_round").isNull).select("vec_id")
    val finalDeg = bid
      .join(alive.withColumnRenamed("vec_id", "src"), Seq("src"))
      .join(alive.withColumnRenamed("vec_id", "dst"), Seq("dst"))
      .groupBy(col("src").as("vec_id")).agg(count(lit(1)).as("deg"))
    state.join(finalDeg, Seq("vec_id"), "left")
      .select(col("vec_id"), col("removed_round"),
        when(col("removed_round").isNull, coalesce(col("deg"), lit(0L)))
          .as("final_deg"))
  }
}
