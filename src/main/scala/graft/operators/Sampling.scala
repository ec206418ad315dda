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

  private def keep(idCol: Column, rate: Column): Column =
    pmod(TextFunctions.md5Hash56(idCol.cast("string")), lit(Denom)) <
      (rate * Denom).cast("long")

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
}
