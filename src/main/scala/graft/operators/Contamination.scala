package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark/eval-set decontamination: find (and drop) training documents
  * that share word n-grams with a held-out evaluation set — the standard
  * leakage guard an LLM training-data pipeline runs before a corpus ships.
  *
  * Scale design (100 TB corpus, eval sets are small by nature):
  *  - both sides reduce to distinct (doc, 56-bit shingle-hash) streams via
  *    the single-pass [[graft.functions.NGramShingles]] expression — the
  *    corpus side is a pure scan + explode, never materialized;
  *  - the eval side collapses to a DISTINCT hash set (thousands of
  *    benchmark items × ~100 shingles ≈ well under broadcast thresholds),
  *    so the contamination probe is a broadcast hash join running
  *    map-side inside the corpus scan — NO corpus-sized shuffle to find
  *    the matches;
  *  - the only exchange is the per-document count aggregate over matched
  *    rows (tiny: contaminated docs only), or the final anti-join in
  *    [[decontaminate]], which Spark plans as broadcast anti as well.
  */
object Contamination {

  /** Distinct hashed word n-gram shingles: (doc_id, h). */
  private def hashedShingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    NearDup.shingles(docs, idCol, textCol, n)
      .select(col("doc_id"), TextFunctions.md5Hash56(col("shingle")).as("h"))

  /** Per-document overlap report: corpus docs sharing ≥1 word n-gram with
    * the eval set, with the count of distinct shared n-grams (the triage
    * signal — 1 shared 5-gram may be idiom, 50 is a verbatim leak). */
  def overlapReport(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val evalHashes = hashedShingles(evalSet, idCol, textCol, n)
      .select("h").distinct()
    hashedShingles(corpus, idCol, textCol, n)
      .join(broadcast(evalHashes), Seq("h"))
      // shingles are distinct per doc and eval hashes are distinct, so
      // count(*) IS the distinct-shared-shingle count
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_ngrams"))
  }

  /** The cleaned corpus: every row of `corpus` whose text shares no word
    * n-gram with `evalSet`. Broadcast anti-join on the flagged id set. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val flagged = overlapReport(corpus, evalSet, idCol, textCol, n)
      .select(col("doc_id").as("__contaminated_id"))
    corpus.join(broadcast(flagged),
      col(idCol) === col("__contaminated_id"), "left_anti")
  }
}
