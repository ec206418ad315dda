package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank in integer fixed-point arithmetic — the iterative
  * propagate-join-aggregate (Pregel-on-DataFrame) pattern, deterministic
  * enough for a SQL oracle to replay bit-for-bit.
  *
  * Every quantity is a scaled long (SCALE = 10^12): an edge (s → d, w)
  * sends `rank(s)·w div W(s)` (W = s's total out-weight), and
  * `rank' = (15·(SCALE div N)) div 100 + (85·inflow) div 100` — all
  * truncating integer division and associative long sums, so the result
  * is independent of partitioning, merge order, and engine (a float
  * PageRank's per-node `sum(double)` would differ run to run). Rounding
  * mass loss per node per iteration is < 2 units of 10^-12 — far below
  * any ranking-relevant scale.
  *
  * Scale shape: each of the fixed `iters` rounds is ONE equi-join of the
  * edge table with the |V|-row rank table (broadcast when small,
  * shuffle-partitioned by src at web scale — the same exchange is
  * reusable every round since edges never change) and one map-side
  * combinable sum per dst. Nodes with no inbound edges keep receiving
  * only the teleport term via the left join from the node list. Dangling
  * mass (nodes without out-edges) is dropped, not redistributed — at
  * token-graph density there are none; documented rather than hidden.
  */
object PageRank {

  val Scale = 1000000000000L // 10^12 fixed-point

  /** Node-count threshold below which the rank table is broadcast each
    * round (~16 bytes/row → ≤ ~64 MB at 4M nodes, inside a sane
    * executor broadcast budget). Above it, the shuffle-join path runs. */
  val BroadcastNodeLimit = 4L * 1024 * 1024

  /** `edges`: (src, dst, w) with positive long weights. Returns
    * (node, rank_scaled) after `iters` rounds, every node from either
    * endpoint present.
    *
    * Per-round shape: ONE equi-join + ONE aggregate, nothing else. Two
    * tricks keep it that way:
    *  - zero-weight self-loops: the persisted edge table is augmented
    *    with (s, s, 0) per source, so every node — including those with
    *    zero inflow this round — appears among the aggregate's keys
    *    (dst ∪ srcs = the full node set), and the per-round "resurrect
    *    missing nodes" left join disappears. A zero edge contributes
    *    `rank·0 div outw = 0` to an integer sum: results are identical.
    *  - teleport and damping are folded into the aggregate's output
    *    projection (`teleport + (d·Σc) div 100`), not a separate pass.
    *
    * TWO physical strategies, picked by |V| (the same stats-based choice
    * Spark makes between broadcast and shuffle joins):
    *  - |V| ≤ [[BroadcastNodeLimit]]: the edge table is hash-partitioned
    *    by DST once and persisted; each round broadcasts the |V|-row
    *    rank table into the join and the per-dst aggregate reuses the
    *    cached dst-partitioning — ZERO exchanges per round, so a round
    *    is ONE single-stage job (the per-round `localCheckpoint` that
    *    cuts the broadcast lineage is that job; without it round i's
    *    broadcast build would recompute rounds 1..i-1). Measured at
    *    local[32]/sf0.1 this is the difference between ~30 stage
    *    barriers and ~10 tiny jobs (9.7 s → ~2 s); on a cluster it is
    *    the classic "partition the big side once, ship the small side"
    *    iteration.
    *  - otherwise: edge table partitioned by SRC; each round exchanges
    *    the rank table into the join and the aggregate exchanges by dst
    *    — the two irreducible shuffles of Pregel-style propagation at
    *    web scale, with a lineage checkpoint every 5 rounds. */
  def weighted(edges: DataFrame, iters: Int = 10, damping: Int = 85): DataFrame = {
    require(iters >= 1 && damping >= 0 && damping <= 100)
    val spark = edges.sparkSession
    val shuffleN = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
    // out-weight per src, computed BEFORE augmentation (w=0 rows must
    // not alter a source's total out-weight)
    val out = e.groupBy("src").agg(sum("w").as("outw"))
    // |V| for the strategy choice, from the RAW edge stream (one job —
    // the augmented table's partitioning depends on the choice)
    val nNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().count()
    require(nNodes > 0, "PageRank.weighted: empty edge table")
    val teleport = (100L - damping) * (Scale / nNodes) / 100L
    val small = nNodes <= BroadcastNodeLimit
    val ewAug = graft.Caching.tracked(e.join(out, Seq("src"))
      .unionByName(out.select(col("src"), col("src").as("dst"),
        lit(0L).as("w"), col("outw")))
      .repartition(shuffleN, if (small) col("dst") else col("src")))
    // dst ∪ self-loop srcs = the FULL node set, so the initial uniform
    // rank vector derives from the augmented table too — round 1's
    // first access fills the cache, and the edge-derivation plan (often
    // an expensive tokenize/aggregate pipeline) never runs once per
    // consumer
    var ranks = ewAug.select(col("dst").as("node")).distinct()
      .select(col("node"), lit(Scale / nNodes).as("rank_scaled"))
    for (i <- 1 to iters) {
      val rsrc = ranks.withColumnRenamed("node", "src")
      ranks = ewAug
        .join(if (small) broadcast(rsrc) else rsrc, Seq("src"))
        // `div`, not `/`: truncating integer division (== DuckDB `//`
        // on positives), NOT the double division `/` would produce
        .select(col("dst"), expr("(rank_scaled * w) div outw").as("c"))
        .groupBy("dst")
        .agg((lit(teleport) +
          expr(s"($damping * sum(c)) div 100")).as("rank_scaled"))
        .withColumnRenamed("dst", "node")
      // bound lineage growth (same pattern as NearDup.dupGroups). In
      // broadcast mode EVERY round checkpoints — the round IS the
      // checkpoint job, and the next broadcast build reads it instead
      // of replaying the chain. In shuffle mode only every 5th round:
      // each localCheckpoint is a full materialization job, and a
      // 5-round plan is still trivially optimizable — at tiny SF this
      // halves the per-round job-floor count, at scale it halves the
      // checkpoint I/O.
      if (i < iters && (small || i % 5 == 0))
        ranks = ranks.localCheckpoint(eager = false)
    }
    ranks
  }
}
