package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Similarity search over embedding columns (array<float>).
  *
  * Two tiers:
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    Query set joins the corpus (broadcast the smaller side), per-pair
  *    kernel is codegen'd, top-k per query via window. Cost O(|Q|·|C|·d):
  *    right for small query batches or reranking.
  *  - `ivfTopK`: inverted-file index — corpus is bucketed by nearest
  *    centroid once (one shuffle), queries probe only `nProbe` buckets.
  *    Cost O(|Q|·(k_c·d + |C|/k_c·nProbe·d)): the 100 TB path. Recall <1
  *    by construction; verified against brute force in tests.
  */
object AnnSearch {

  /** Exact top-k neighbors for each query vector.
    * queries: (query_id, q: array<float>), corpus: (vec_id, embedding). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("sim", Vectors.cosine(col("q"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "sim")
  }

  /** Deterministic centroid pick: the `numCentroids` lowest-id vectors.
    * A production index would k-means these; the IVF structure (assign,
    * invert, probe) is identical and that is what's under test. */
  def centroids(corpus: DataFrame, numCentroids: Int): DataFrame =
    corpus.orderBy("vec_id").limit(numCentroids)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))

  /** Assign every corpus vector to its nearest centroid (broadcast the
    * centroid table — it is tiny by construction). One pass, one shuffle
    * if the result is persisted bucketed by centroid_id. */
  def assign(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val scored = corpus.crossJoin(broadcast(cents))
      .withColumn("csim", Vectors.cosine(col("cvec"), col("embedding")))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("csim"), asc("centroid_id"))
    scored.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** IVF approximate top-k: probe the nProbe nearest centroids per query,
    * exact cosine within the probed buckets only. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCentroids: Int, nProbe: Int): DataFrame = {
    val cents = centroids(corpus, numCentroids)
    val inverted = assign(corpus, cents)
    // per query: nProbe nearest centroids
    val qc = queries.crossJoin(broadcast(cents))
      .withColumn("csim", Vectors.cosine(col("q"), col("cvec")))
    val wq = Window.partitionBy(col("query_id")).orderBy(desc("csim"), asc("centroid_id"))
    val probes = qc.withColumn("r", row_number().over(wq)).filter(col("r") <= nProbe)
      .select(col("query_id"), col("q"), col("centroid_id"))
    // search only the probed buckets
    val scored = probes.join(inverted, Seq("centroid_id"))
      .withColumn("sim", Vectors.cosine(col("q"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("query_id", "vec_id", "rnk", "sim")
  }

  /** All near-duplicate embedding pairs by cosine ≥ threshold. All-pairs
    * at dim-table size; at corpus scale route through ivf/LSH buckets
    * first (same verify-after-candidates shape as NearDup.minhashLshPairs).
    */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", Vectors.cosine(col("ea"), col("eb")))
      .filter(col("cos_sim") >= threshold)
      .select("vec_a", "vec_b", "cos_sim")
  }
}
