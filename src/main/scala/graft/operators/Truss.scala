package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-truss peeling — the EDGE-grain density filter next to
  * [[KCore]]'s node grain: an edge survives the k-truss iff it closes
  * ≥ k−2 triangles among surviving edges, so the truss keeps only
  * cohesive-community edges and drops bridges/hub spokes that k-core
  * (a pure degree test) cannot distinguish — the standard community
  * backbone for graph-based curation. As with [[KCore.peel]] and the
  * X77 PageRank discipline, the pipeline form is FIXED-ROUND peeling
  * (removal round = coarse trussness rank): the job count stays
  * bounded and every round is oracle-replayable.
  *
  * Per round, support counting is the X123 oriented-wedge shape: edges
  * oriented low→high id, wedge self-join on the lower endpoint,
  * closing-edge equi-join — each triangle a<b<c materializes exactly
  * once, then fans out to its three edges for one hash-agg count. All
  * plain equi-joins; wedge fan-out is Σ deg²-bounded (≤ (2k)²·n on a
  * mutual-kNN graph), per-round edge volume only shrinks, and lineage
  * is cut per round (localCheckpoint) so round i never replays rounds
  * 1..i−1.
  */
object Truss {

  /** Peel `rounds` rounds toward the `k`-truss. `edges`: undirected
    * unique pairs (vec_a, vec_b), any orientation. Returns one row per
    * input edge: (vec_a < vec_b, removed_round — NULL if alive after
    * `rounds`, final_support — triangle count within the surviving
    * edge set, NULL if removed). */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3 && rounds >= 1)
    val e0 = edges.select(
      least(col("vec_a"), col("vec_b")).as("vec_a"),
      greatest(col("vec_a"), col("vec_b")).as("vec_b"))

    def support(alive: DataFrame): DataFrame = {
      val e = alive.select("vec_a", "vec_b")
      val tri = e.as("x")
        .join(e.as("y"), col("x.vec_a") === col("y.vec_a") &&
          col("x.vec_b") < col("y.vec_b"))
        .select(col("x.vec_a").as("a"), col("x.vec_b").as("b"),
          col("y.vec_b").as("c"))
        .join(e.as("z"), col("z.vec_a") === col("b") &&
          col("z.vec_b") === col("c"))
        .select("a", "b", "c")
      tri.select(col("a").as("vec_a"), col("b").as("vec_b"))
        .unionByName(tri.select(col("a").as("vec_a"), col("c").as("vec_b")))
        .unionByName(tri.select(col("b").as("vec_a"), col("c").as("vec_b")))
        .groupBy("vec_a", "vec_b").agg(count(lit(1)).as("__sup"))
    }

    var state = e0.withColumn("removed_round", lit(null).cast("long"))
    for (r <- 1 to rounds) {
      val alive = state.where(col("removed_round").isNull)
      state = state
        .join(support(alive), Seq("vec_a", "vec_b"), "left")
        .select(col("vec_a"), col("vec_b"),
          when(col("removed_round").isNotNull, col("removed_round"))
            .when(coalesce(col("__sup"), lit(0L)) < k - 2, lit(r.toLong))
            .otherwise(lit(null).cast("long")).as("removed_round"))
        .localCheckpoint(eager = false)
    }
    val aliveF = state.where(col("removed_round").isNull)
    state.join(support(aliveF), Seq("vec_a", "vec_b"), "left")
      .select(col("vec_a"), col("vec_b"), col("removed_round"),
        when(col("removed_round").isNull, coalesce(col("__sup"), lit(0L)))
          .as("final_support"))
  }
}
