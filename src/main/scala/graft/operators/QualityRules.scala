package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Published rule-based document filters — the C4 heuristics (Raffel et
  * al. 2020 §2.2) and the Gopher quality rules (Rae et al. 2021 §A1.1)
  * — as one per-document report: each rule's verdict as its own column
  * plus the conjunctive keep flag, so a curation run can read per-rule
  * rejection rates (the way the papers report ablations) instead of a
  * single opaque boolean.
  *
  * Thresholds follow the papers where the corpus makes them meaningful
  * (mean word length in [3,10], ≥80% words with an alphabetic
  * character, ≤10% symbol-bearing words, ≥2 distinct Gopher stopwords,
  * no "lorem ipsum"/"{", terminal punctuation) with the word-count
  * floor lowered to these ~100-token synthetic docs (50, vs Gopher's
  * 50–100k band which it shares).
  *
  * Shape: a pure per-row projection — no shuffle, no state; the word
  * array is built once and every rule reads it. The fraction rules use
  * one interpreted higher-order `filter` each over a ~100-element
  * array; at 100 TB this is embarrassingly parallel map work.
  */
object QualityRules {

  /** The eight Gopher stopwords ("the, be, to, of, and, that, have,
    * with"); presence of ≥2 distinct ones is the Gopher stopword rule. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule report: (id, n_words, mean_word_len, frac_alpha,
    * frac_symbol, stop_hits, r_* flags as 0/1 longs, keep). */
  def report(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val words = TextFunctions.tokens(col(textCol))
    val nWords = size(words).cast("long")
    val meanWl = aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") / nWords.cast("double")
    val fracAlpha =
      size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("double") /
        nWords.cast("double")
    val fracSymbol =
      size(filter(words, w => w.contains("#") || w.contains("...")))
        .cast("double") / nWords.cast("double")
    val stopHits = gopherStopwords
      .map(s => when(array_contains(words, s), 1L).otherwise(0L))
      .reduceLeft(_ + _)
    val endsPunct = expr(s"right($textCol, 1)").isin(".", "!", "?", "\"")
    val hasLorem = lower(col(textCol)).contains("lorem ipsum")
    val hasBrace = col(textCol).contains("{")
    def flag(c: Column): Column = when(c, 1L).otherwise(0L)
    val rWordCount = nWords.between(minWords, maxWords)
    val rMeanWl = meanWl >= 3.0 && meanWl <= 10.0
    val rAlpha = fracAlpha >= 0.8
    val rSymbol = fracSymbol <= 0.1
    val rStop = stopHits >= 2L
    val rPunct = endsPunct
    val rLorem = !hasLorem
    val rBrace = !hasBrace
    docs.select(col(idCol), nWords.as("n_words"),
      meanWl.as("mean_word_len"), fracAlpha.as("frac_alpha"),
      fracSymbol.as("frac_symbol"), stopHits.as("stop_hits"),
      flag(rWordCount).as("r_word_count"), flag(rMeanWl).as("r_mean_wl"),
      flag(rAlpha).as("r_alpha"), flag(rSymbol).as("r_symbol"),
      flag(rStop).as("r_stopwords"), flag(rPunct).as("r_end_punct"),
      flag(rLorem).as("r_no_lorem"), flag(rBrace).as("r_no_brace"),
      flag(rWordCount && rMeanWl && rAlpha && rSymbol && rStop && rPunct
        && rLorem && rBrace).as("keep"))
  }
}
