package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan '07
  * "Near linear time algorithm to detect community structures in
  * large-scale networks") over an undirected edge list — the clustering
  * a graph-based curation pass runs on the mutual-kNN graph
  * ([[AnnSearch.mutualKnnGraph]]) to find topic communities for
  * pruning, balancing, or diversity sampling.
  *
  * Deterministic, engine-exact variant: all-integer state, SYNCHRONOUS
  * rounds (every node updates from the previous round's labels — the
  * async/random-order variant of the paper is irreproducible by
  * design), new label = the most frequent label among neighbors with
  * ties broken by MIN label, isolated nodes keep their own label. With
  * a fixed round count the full trajectory is a pure function of the
  * edge list, so a DuckDB oracle replays it round for round. (Label
  * propagation differs from connected components ([[NearDup.dupGroups]])
  * exactly in the frequency vote: a sparse bridge between two dense
  * communities does NOT merge them, while CC would.)
  *
  * Scale shape: each round is one edge⋈label hash join (shuffle keyed
  * on node id, the same partitioning every round) + two
  * partial-aggregatable hash aggs ((node,label) counts, then per-node
  * argmax) + a left join back to the node set. Nothing driver-side,
  * state is one label per node, and the plan depth is `rounds` (small,
  * fixed) so no checkpointing is needed.
  */
object Communities {

  /** Run `rounds` synchronous label-propagation rounds. `nodes` must
    * have a `vec_id` column; `edges` is undirected as (vec_a, vec_b).
    * Output: (vec_id, community, n_members). */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"labelPropagation: rounds=$rounds")
    import org.apache.spark.storage.StorageLevel
    // Materialization discipline (the dupGroups pattern): the edge list
    // is often an EXPENSIVE derivation (the mutual-kNN block-grid
    // pass), and every round references it plus the previous round's
    // labels twice — left lazy, the plan re-derives the whole prefix
    // per reference, compounding per round (measured 11 s vs 2 s at
    // sf0.1). So: both directions in ONE explode pass (a union's two
    // branches each re-evaluate the subtree when the persist
    // materializes), persist it, and persist + eagerly settle each
    // round's labels before unpersisting the previous round's.
    val bidir = graft.Caching.tracked(edges.select(explode(array(
        struct(col("vec_a").as("src"), col("vec_b").as("dst")),
        struct(col("vec_b").as("src"), col("vec_a").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst")))
    var labels = graft.Caching.tracked(
      nodes.select(col("vec_id"), col("vec_id").as("lbl")))
    (0 until rounds).foreach { _ =>
      val votes = bidir
        .join(labels.withColumnRenamed("vec_id", "src"), Seq("src"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max_by(col("lbl"), struct(col("cnt"), negate(col("lbl"))))
          .as("nlbl"))
        .withColumnRenamed("dst", "vec_id")
      // lazy persist: the final action materializes each level exactly
      // once bottom-up — the cache breaks the double-reference blowup
      // without a per-round driver sync (rounds here, unlike the
      // convergence loop in dupGroups, need no driver decision). All
      // `rounds` label levels are resident together; each is one
      // (id, label) row per node, MEMORY_AND_DISK.
      labels = graft.Caching.tracked(labels.join(votes, Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("nlbl"), col("lbl")).as("lbl")))
    }
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("n_members"))
    labels.join(sizes, Seq("lbl"))
      .select(col("vec_id"), col("lbl").as("community"), col("n_members"))
  }
}
