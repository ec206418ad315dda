package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Consistent-hash shard assignment — the placement function whose whole
  * point is the REBALANCING bill: adding one shard to an n-shard modulo
  * scheme moves ~(n)/(n+1) of all keys (q53's hash-mod is the right tool
  * only for FIXED fan-out), while a consistent ring with virtual nodes
  * moves ~1/(n+1). A 100 TB corpus resharding onto new capacity pays
  * that difference in cross-node traffic.
  *
  * Ring arithmetic is the repo's standard 56-bit md5 integer space:
  * vnode positions hash `shard:replica`, a key is owned by the first
  * vnode clockwise (min position ≥ key, wrapping to the global minimum)
  * — every comparison is exact long order, so the assignment (and the
  * movement matrix under a topology change) is engine-exact.
  *
  * Shape: the vnode table is shards×replicas rows — control-plane tiny,
  * broadcast into the key scan; successor search is an argmin over the
  * broadcast table per key (a ≤|vnodes| fold, constant per key). At
  * larger rings the sorted-vnode binary search replaces the fold; the
  * broadcast stays, the scan stays one pass. */
object ConsistentHash {

  private def ringPos(c: org.apache.spark.sql.Column) = TextFunctions.md5Hash56(c)

  /** Assign each `keyCol` to its ring owner under `shards` and under
    * `shards+1`, with `replicas` vnodes per shard. Returns the movement
    * matrix: (shard_before, shard_after, n_keys) — the minimal-movement
    * property shows as an almost-diagonal matrix whose off-diagonal
    * mass is ~1/(shards+1), all off-diagonal targets the NEW shard. */
  def rebalanceMatrix(df: DataFrame, keyCol: String, shards: Int,
      replicas: Int = 16): DataFrame = {
    require(shards >= 1 && replicas >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    def vnodes(n: Int) = (0 until n).flatMap(s => (0 until replicas)
      .map(r => (s.toLong, s"$s:$r"))).toDF("shard", "vn")
      .select(col("shard"), ringPos(col("vn")).as("pos"))
    def owner(vn: DataFrame, p: String) = {
      // successor with wraparound: min pos ≥ key, else global min pos
      val ge = min(when(col("pos") >= col("__h"), struct(col("pos"), col("shard"))))
      val any = min(struct(col("pos"), col("shard")))
      df.select(col(keyCol), ringPos(col(keyCol).cast("string")).as("__h"))
        .crossJoin(broadcast(vn))
        .groupBy(col(keyCol), col("__h"))
        .agg(coalesce(ge, any).getField("shard").as(p))
    }
    owner(vnodes(shards), "shard_before")
      .join(owner(vnodes(shards + 1), "shard_after"), Seq(keyCol, "__h"))
      .groupBy("shard_before", "shard_after")
      .agg(count(lit(1)).as("n_keys"))
  }
}
