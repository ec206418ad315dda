package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling operators for training-data pipelines.
  *
  * Production corpus sampling cannot use `df.sample()`: its RNG draws
  * depend on partition layout and seed plumbing, so a rerun, a
  * repartition, or a grown corpus silently changes the sample. Here
  * membership is a pure function of row content — `md5Hash56(id)` against
  * a rate threshold — so the sample is reproducible across runs, engines
  * (the same predicate runs in any SQL dialect), and corpus growth: a
  * document's membership never changes when other documents appear.
  *
  * Scale shape: a narrow filter on a codegen'd hash — no shuffle, no
  * state, prunes at full scan speed; downstream stages see only the kept
  * fraction.
  */
object Sampling {

  private val Denom = 1000000L // rate resolution 1e-6

  // round(), not a truncating cast: rate*1e6 is rarely exactly
  // representable (0.29 → 289999.999…), and DuckDB's CAST(AS BIGINT)
  // rounds while Spark's cast truncates — a truncating threshold would
  // systematically under-sample AND disagree with the oracle for any
  // rate that isn't integer-exact. A null id hashes to bucket 0 (kept
  // whenever rate > 0), so rate=1.0 is a true identity — null-id rows
  // are never silently dropped.
  private def keep(idCol: Column, rate: Column): Column =
    coalesce(pmod(TextFunctions.md5Hash56(idCol.cast("string")), lit(Denom)), lit(0L)) <
      round(rate * Denom).cast("long")

  /** Uniform deterministic sample: keep ~`rate` of rows by id hash. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate=$rate")
    df.filter(keep(col(idCol), lit(rate)))
  }

  /** Stratified deterministic sample: per-stratum keep rates (e.g.
    * down-sample dominant languages, keep all of rare ones), unlisted
    * strata fall back to `defaultRate`. The per-row decision is still a
    * pure hash-threshold on the id, so strata rates can be retuned
    * without disturbing which rows of an unchanged stratum survive. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate=$r"))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(keep(col(idCol), rate))
  }

  /** Weighted deterministic (importance) sample: each row kept with
    * probability `min(weight, cap) / cap` for an integer weight column —
    * e.g. weight = token count with cap 512 keeps long documents surely
    * and short ones proportionally, the standard length-proportional
    * draw when sampling a token budget rather than a document count.
    *
    * ENTIRELY integer arithmetic so any SQL engine reproduces the exact
    * kept set: keep iff `h56(id) < (2^56 / cap) * min(weight, cap)`.
    * `cap` must divide 2^56 (a power of two ≤ 2^56) so the threshold is
    * exact — weight = cap then yields threshold 2^56 > every hash,
    * a true keep-everything. Same no-shuffle codegen'd-filter shape as
    * the uniform sampler; a null id hashes to bucket 0 (always kept when
    * weight > 0), a null/negative weight drops the row explicitly. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
      cap: Long): DataFrame = {
    require(cap > 0 && (cap & (cap - 1)) == 0 && cap <= (1L << 56),
      s"cap must be a power of two in [1, 2^56], got $cap")
    val unit = (1L << 56) / cap
    val w = least(coalesce(weight.cast("long"), lit(0L)), lit(cap))
    df.filter(
      coalesce(TextFunctions.md5Hash56(col(idCol).cast("string")), lit(0L)) <
        lit(unit) * w)
  }
}
