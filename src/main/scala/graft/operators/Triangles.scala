package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting and local clustering coefficients over an
  * undirected edge list — the cohesion diagnostic graph-based curation
  * reads off the mutual-kNN graph ([[AnnSearch.mutualKnnGraph]]): a
  * node whose neighborhood closes into triangles sits inside a dense
  * topical cluster; coefficient ≈ 0 flags hub-adjacent or bridge
  * vectors whose neighbors are unrelated to each other.
  *
  * Algorithm: orient every edge low-id → high-id, join oriented edges
  * on their source to enumerate wedges (a→b, a→c with b<c), then
  * equi-join the wedge's closing pair against the oriented edge list —
  * each triangle a<b<c is found exactly once, as wedge (a; b,c) closed
  * by edge (b,c). Per-node counts explode each triangle to its three
  * corners; the coefficient divides by deg·(deg−1)/2.
  *
  * Scale shape: two hash equi-joins and two hash aggs — no cartesian
  * corner; wedge fan-out is Σ deg(v)² over ORIENTED degrees. On a
  * mutual-kNN graph the degree is capped by k, so the wedge table is
  * ≤ k²·n rows. (On power-law graphs the standard refinement is to
  * orient by degree instead of id, which bounds oriented degree by
  * O(√|E|); id orientation keeps the oracle trivially replayable and
  * is exact either way.) */
object Triangles {

  /** Per-node (vec_id, degree, n_triangles, clustering_coeff) for every
    * node with degree ≥ 1; `edges` is undirected as (vec_a, vec_b),
    * each unordered pair once. */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val e = edges.select(
      least(col("vec_a"), col("vec_b")).as("lo"),
      greatest(col("vec_a"), col("vec_b")).as("hi"))
    val wedges = e.as("x").join(e.as("y"),
        col("x.lo") === col("y.lo") && col("x.hi") < col("y.hi"))
      .select(col("x.lo").as("a"), col("x.hi").as("b"), col("y.hi").as("c"))
    val tris = wedges.join(e,
      wedges("b") === e("lo") && wedges("c") === e("hi"))
    val perNode = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(explode(array(col("lo"), col("hi"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("vec_id"), "left")
      .select(col("vec_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
            coalesce(col("n_triangles"), lit(0L)).cast("double") * 2.0 /
              (col("degree") * (col("degree") - 1)).cast("double"))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }
}
