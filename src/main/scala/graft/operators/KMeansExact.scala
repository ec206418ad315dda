package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
  def lloyd(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0, s"lloyd: k=$k iters=$iters")
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    import graft.functions.LongVecSumAgg
    val c = corpus
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(Vectors.dot(col("e"), col("e"))))
      .withColumn("s1",
        expr("transform(e, x -> cast(floor(x * 1000000000.0) AS bigint))"))
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
    assign(c, cents)
      .select(col("vec_id"), col("cid").as("centroid_id"), col("csim"))
  }

  /** Cosine-argmax assignment of the prepped corpus against literal
    * centroids; tie-break (csim DESC, cid ASC) via the max_by struct
    * idiom the IVF assigner uses. */
  private def assign(c: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    val spark = c.sparkSession
    import spark.implicits._
    val ce = broadcast(cents.toDF("cid", "cvec")
      .withColumn("ncv", sqrt(Vectors.dot(col("cvec"), col("cvec")))))
    c.crossJoin(ce)
      .withColumn("csim",
        Vectors.dot(col("cvec"), col("e")) / (col("ncv") * col("nrm")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cid"), col("csim"), col("s1")),
        struct(col("csim"), negate(col("cid")))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cid"),
        col("best.csim").as("csim"), col("best.s1").as("s1"))
  }
}
