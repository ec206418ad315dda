package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Deterministic k-center greedy coreset selection (farthest-point
  * traversal, Gonzalez '85; the diversity-selection shape of Sener &
  * Savarese '18 "Active Learning for CNNs: A Core-Set Approach") — pick
  * `k` corpus vectors that maximize mutual dissimilarity, then assign
  * every vector to its nearest chosen center. The companion to k-means
  * ([[KMeansExact]]): k-means picks DENSE prototypes, k-center picks
  * SPREAD-OUT ones — the subset a diverse fine-tune slice or an eval
  * probe set wants.
  *
  * Engine-exact by construction, so a DuckDB oracle replays the whole
  * greedy trajectory bit-for-bit:
  *   - seed = lowest vec_id (no RNG);
  *   - each round adds the vector whose MAX cosine to the chosen set is
  *     smallest (`max` over doubles is reduction-order-independent;
  *     cosine is the shared sequential-fold dot/norm kernel), tie-break
  *     vec_id ASC;
  *   - final coverage = cosine argmax over the chosen set with
  *     (csim DESC, center_id ASC) tie-break — the [[KMeansExact]]
  *     assignment idiom.
  *
  * Scale shape: each greedy round is ONE scan of the corpus against a
  * ≤k-row broadcast literal (k·dim doubles) reduced by a TakeOrdered
  * limit-1 — no shuffle wider than one row reaches the driver, and the
  * only driver state is the chosen list (control plane, like MLlib's
  * KMeans centers). Rounds are inherently sequential (greedy argmin
  * depends on the previous pick), so `k` bounds the job count; lineage
  * never grows because every round's plan starts from the scan. At
  * 100 TB each round is a single map-reduce over the embedding column —
  * the same cost profile as one k-means assignment pass.
  */
object Coreset {

  /** Greedy-select `k` centers from `corpus` (vec_id, embedding), then
    * assign every vector to its nearest center. Output:
    * (vec_id, center_id, csim, sel_rank) where `sel_rank` is the
    * 1-based greedy pick order for chosen vectors and null otherwise,
    * and `csim` is cosine(center, vec). */
  def kCenterGreedy(corpus: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"kCenterGreedy: k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    // the greedy trajectory scans this working set k+1 times by
    // construction — pin the casted+normed projection once (the ivfTopK
    // pinned-working-set rationale; Bench sweeps it after the query)
    val c = graft.Caching.tracked(corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(Vectors.dot(col("e"), col("e")))))

    // Greedy farthest-point trajectory; chosen is k×dim driver state.
    var chosen: Seq[(Long, Array[Double])] = c
      .orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("e")).as[(Long, Array[Double])]
      .collect().toSeq
    (1 until k).foreach { _ =>
      val picked = chosen.map(_._1)
      val next = maxSimToChosen(c, chosen)
        .where(!col("vec_id").isin(picked: _*))
        .orderBy(col("maxsim"), col("vec_id"))
        .limit(1)
        .select(col("vec_id"), col("e")).as[(Long, Array[Double])]
        .collect()
      chosen = chosen ++ next // corpus smaller than k ⇒ next is empty
    }

    val ranks = chosen.map(_._1).zipWithIndex
      .map { case (id, i) => (id, i + 1) }
      .toDF("vec_id", "sel_rank")
    // chosen is driver state → final assignment is the KMeansExact
    // static unroll (greatest over k codegen'd score structs): no
    // crossJoin row expansion, no per-vector groupBy exchange
    val scores = KMeansExact.centScores(chosen)
    val best = if (scores.length == 1) scores.head else greatest(scores: _*)
    c.select(col("vec_id"), best.getField("cid").as("center_id"),
        best.getField("csim").as("csim"))
      .join(broadcast(ranks), Seq("vec_id"), "left")
      .select(col("vec_id"), col("center_id"), col("csim"), col("sel_rank"))
  }

  /** One scan: per corpus vector, the max cosine to the chosen set —
    * `greatest` over the statically-unrolled per-center cosines (max
    * over doubles = struct-free greatest; NaN ordering identical), no
    * crossJoin, no re-group. */
  private def maxSimToChosen(
      c: DataFrame, chosen: Seq[(Long, Array[Double])]): DataFrame = {
    val sims = KMeansExact.centScores(chosen).map(_.getField("csim"))
    val m = if (sims.length == 1) sims.head else greatest(sims: _*)
    c.select(col("vec_id"), m.as("maxsim"), col("e"))
  }
}
