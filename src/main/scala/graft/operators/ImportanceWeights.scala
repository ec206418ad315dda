package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style hashed-n-gram importance weights for data selection
  * (Xie et al. 2023, "Data Selection for Language Modeling via
  * Importance Resampling"): score every raw document by how much its
  * hashed unigram profile resembles a small high-quality TARGET set
  * versus the raw pool, then resample the raw pool by that score.
  *
  * Deviation from the paper, chosen for engine-exactness: the paper
  * sums per-token LOG likelihood ratios; `log` is libm-dependent (not
  * IEEE-correctly-rounded), so two engines can disagree in the last ulp
  * and a fixed-point gate would flap. We instead sum per-token
  * FIXED-POINT likelihood ratios
  * `floor(1e9 · (ct+1)(Nr+B) / ((cr+1)(Nt+B)))` — add-one-smoothed
  * bucket ratios whose arithmetic is exact in both engines (long
  * products below 2^53, one correctly-rounded double division and
  * multiplication, exact floor) — and the per-document reduction is a
  * plain long sum. Ranking by mean linear ratio and by mean log ratio
  * agree on the dominant (near-1-bucket-dominated) documents; the
  * monotone calibration differs, which a resampler absorbs in its
  * temperature.
  *
  * Scale shape: one token-level hash-agg over the corpus (map-side
  * combine, B=`buckets` distinct keys), the bucket-weight table is
  * O(B) and BROADCAST back into the token stream, and the per-doc
  * score is a second hash-agg — no shuffle carries more than the token
  * stream, nothing is quadratic, no driver-side data. At 100 TB the
  * bucket table is still `buckets` rows.
  */
object ImportanceWeights {

  /** Per-document importance scores for the NON-target (raw) slice of
    * `docs`. Output: (doc_id, n_tokens, score_fp, avg_ratio) where
    * `score_fp` is the exact long sum of fixed-point per-token ratios
    * and `avg_ratio` = score_fp / n_tokens / 1e9 (the resampling key).
    *
    * @param isTarget per-row predicate marking the high-quality target
    *                 slice (eval-like set, curated seed corpus, ...)
    */
  def hashedRatioScores(docs: DataFrame, isTarget: Column, idCol: String,
      textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"hashedRatioScores: buckets=$buckets")
    val b = lit(buckets.toLong)
    val toks = docs
      .select(col(idCol), isTarget.as("tgt"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col(idCol), col("tgt"),
        pmod(TextFunctions.md5Hash56(col("tok")), b).as("bkt"))
    // one corpus pass: per-bucket target/raw occurrence counts
    val counts = toks.groupBy("bkt").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    // totals fold over the O(B) bucket table, not the token stream
    val totals = counts.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    // fixed-point add-one-smoothed ratio per bucket; every product stays
    // a long and fits a double exactly (see scaladoc), so the floor is
    // bit-identical across engines
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("bkt"),
        ((col("ct") + lit(1L)) * (col("nr") + b)).cast("double").as("num"),
        ((col("cr") + lit(1L)) * (col("nt") + b)).cast("double").as("den"))
      .select(col("bkt"),
        floor(col("num") / col("den") * lit(1e9)).cast("long").as("w"))
    toks.filter(!col("tgt"))
      .join(broadcast(weights), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("w").as("score_fp"))
      .select(col(idCol), col("n_tokens"), col("score_fp"),
        (col("score_fp").cast("double") / col("n_tokens").cast("double")
          / lit(1e9)).as("avg_ratio"))
  }
}
