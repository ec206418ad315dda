package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Deterministic Lloyd k-means over an embedding corpus — the codebook
  * trainer an IVF/PQ indexing pass runs before it can bucket anything.
  *
  * Unlike the float-mean refinement inside [[AnnSearch.centroids]]
  * (MLlib-style, deterministic only up to float-sum ordering — fine for
  * bucket quality, useless for an exactness gate), every step here is
  * engine-exact and layout-independent, so a DuckDB oracle replays the
  * whole training bit-for-bit:
  *   - seeds = the `k` lowest vec_ids (no RNG);
  *   - assignment = cosine argmax with (csim DESC, centroid_id ASC)
  *     tie-break — csim itself is the sequential-fold dot/norm kernel
  *     every gated similarity operator shares, identical in both
  *     engines, so even near-ties resolve identically;
  *   - centroid update = per-dimension mean from floor-scaled long sums
  *     (`floor(v·1e9)` summed associatively via
  *     [[graft.functions.LongVecSumAgg]], then `(ss/1e9)/n` in
  *     correctly-rounded double ops) — the X106 fixed-point-moments
  *     trick, so the mean does not depend on reduction order;
  *   - empty clusters drop out of the next round in both engines (no
  *     row from the agg ⇒ no centroid).
  *
  * Scale shape: each round is ONE broadcast-assignment scan (k×dim
  * centroid literals into the corpus) + ONE partial-aggregatable
  * fixed-width sum agg; the only driver state is the k×dim centroid
  * table (control plane, like MLlib's centers). Rounds are
  * driver-synced by nature — k-means is a synchronous fixed-point — so
  * iters bounds the job count, and lineage never grows (each round's
  * plan starts from the scan, not the previous round's plan). */
object KMeansExact {

  /** Train `iters` Lloyd rounds, return the final assignment:
    * (vec_id, centroid_id, csim). corpus: (vec_id, embedding). */
  def lloyd(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    assign(prep(corpus), trainCentroids(corpus, k, iters))
      .select(col("vec_id"), col("cid").as("centroid_id"), col("csim"))

  /** The prepped corpus lloyd/silhouette score against: normalized
    * doubles + the floor-scaled long vector the exact mean sums. */
  private def prep(corpus: DataFrame): DataFrame = corpus
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    .withColumn("nrm", sqrt(Vectors.dot(col("e"), col("e"))))
    .withColumn("s1",
      expr("transform(e, x -> cast(floor(x * 1000000000.0) AS bigint))"))

  /** The training loop alone: final k×dim centroid table (control-plane
    * driver state, exactly MLlib's centers shape). */
  def trainCentroids(corpus: DataFrame, k: Int,
      iters: Int): Seq[(Long, Array[Double])] = {
    require(k >= 1 && iters >= 0, s"trainCentroids: k=$k iters=$iters")
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    import graft.functions.LongVecSumAgg
    val c = prep(corpus)
    var cents: Seq[(Long, Array[Double])] = corpus
      .orderBy("vec_id").limit(k)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq
    (0 until iters).foreach { _ =>
      cents = assign(c, cents)
        .groupBy(col("cid"))
        .agg(exprColumn(LongVecSumAgg(columnExpr(col("s1")))
            .toAggregateExpression()).as("ss"),
          count(lit(1)).as("n"))
        .collect().toSeq
        .map { r: Row =>
          val n = r.getAs[Long]("n").toDouble
          (r.getAs[Long]("cid"),
            r.getSeq[Long](r.fieldIndex("ss")).map(s => (s.toDouble / 1e9) / n).toArray)
        }
        .sortBy(_._1)
    }
    cents
  }

  /** Simplified (centroid-based) silhouette per cluster: with cosine
    * distance a = 1−sim(own centroid), b = 1−sim(runner-up centroid),
    * s = (b−a)/b ∈ [0, 1) (b ≥ a by argmax; b = 0 ⇒ s = 0) — the
    * O(n·k) clustering-quality diagnostic (full silhouette is O(n²),
    * unusable at corpus scale; the centroid form is the standard
    * approximation). Per-vector s floor-scales to a long BEFORE the
    * per-cluster mean, so the reduction is an exact integer sum
    * (reduction-order-independent — the X106 fixed-point-moments trick)
    * and the DuckDB twin replays training AND scoring bit-for-bit.
    *
    * Shape: one broadcast k×dim scan over the corpus, a per-vector
    * 8-struct sorted fold (bounded by k, no window), one hash agg. */
  def silhouette(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    // simplified silhouette is undefined without a runner-up centroid;
    // k=1 would make element_at(t2, 2) null and silently null every row
    require(k >= 2, s"silhouette requires k >= 2, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = trainCentroids(corpus, k, iters)
    // ascending (csim, −cid) sort: last = assignment argmax with the
    // (csim DESC, cid ASC) tie-break, second-last = runner-up — the
    // k score structs are STATIC expressions ([[centScores]]), so the
    // top-2 is one array_sort+slice per row: no crossJoin expansion,
    // no per-vector groupBy exchange (sort order and values identical
    // to the former collect_list formulation)
    val top2 = prep(corpus)
      .select(col("vec_id"),
        slice(array_sort(array(centScores(cents): _*)), -2, 2).as("t2"))
    val a = lit(1.0) - element_at(col("t2"), 2).getField("csim")
    val b = lit(1.0) - element_at(col("t2"), 1).getField("csim")
    top2
      .select(element_at(col("t2"), 2).getField("cid").as("centroid_id"),
        when(b > lit(0.0), floor(((b - a) / b) * lit(1.0e9)))
          .otherwise(lit(0L)).as("s_scaled"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), sum("s_scaled").as("__ss"))
      .select(col("centroid_id"), col("n"),
        ((col("__ss").cast("double") / lit(1.0e9)) / col("n").cast("double"))
          .as("sil_avg"))
      .orderBy("centroid_id")
  }

  /** Per-centroid (csim, −cid, cid) score structs as STATIC expressions
    * over the prepped row — the centroid table is driver state, so each
    * centroid unrolls to a codegen'd [[Vectors.dot]] against literals:
    * no crossJoin row expansion, no per-vector groupBy exchange (the
    * round-6 shape exchanged n·k rows per training round to re-group
    * what was computable in the row). The driver-side norm replays the
    * engine's kernel exactly: sequential in-order fold + sqrt, the same
    * IEEE op sequence [[graft.functions.DotProduct]] evaluates. */
  private[operators] def centScores(cents: Seq[(Long, Array[Double])]): Seq[Column] =
    cents.map { case (cid, vec) =>
      var s = 0.0
      var i = 0
      while (i < vec.length) { s += vec(i) * vec(i); i += 1 }
      val ncv = math.sqrt(s)
      val cvec = array(vec.toSeq.map(lit): _*)
      struct(
        (Vectors.dot(cvec, col("e")) / (lit(ncv) * col("nrm"))).as("csim"),
        lit(-cid).as("nc"), lit(cid).as("cid"))
    }

  /** Cosine-argmax assignment of the prepped corpus against literal
    * centroids; tie-break (csim DESC, cid ASC) = struct max over the
    * (csim, −cid) order — `greatest` over the unrolled score structs,
    * fully codegen'd, one projection, no exchange. */
  private def assign(c: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    val scores = centScores(cents)
    val best = if (scores.length == 1) scores.head else greatest(scores: _*)
    c.select(col("vec_id"), best.getField("cid").as("cid"),
      best.getField("csim").as("csim"), col("s1"))
  }
}
