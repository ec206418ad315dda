package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy-match join — record linkage between a clean master table
  * and a dirty feed (typo'd names, OCR'd ids, crawl titles) where
  * equality join misses and an all-pairs edit-distance scan is O(n·m).
  *
  * The standard production shape:
  *   1. BLOCKING: both sides key by a cheap deterministic blocking
  *      function (prefix slices + length band here); only same-block
  *      pairs are candidates. This is the quadratic-killer — candidate
  *      count is Σ|blockA|·|blockB|, tunable by block granularity, and
  *      the join is a plain hash equi-join on the block key, shuffled
  *      by block (or broadcast when one side is a small master list).
  *      The recall contract is explicit: edits INSIDE the blocking
  *      slice lose the pair (documented, spec-pinned) — the usual fix
  *      at scale is a second pass with a rotated blocking key.
  *   2. VERIFY: `levenshtein(a, b) ≤ maxDist` on candidates only —
  *      Spark's codegen'd Levenshtein with the early-exit threshold
  *      form (bounded O(maxDist·len) instead of O(len²) per pair).
  *
  * Both engines implement textbook Levenshtein, so the distances — and
  * the DuckDB twin — agree exactly (the threshold form returns −1 above
  * the budget; kept rows carry the exact distance either way). */
object FuzzyJoin {

  /** Join `a`(id, name) to `b`(id, name) on same-block candidates with
    * edit distance ≤ `maxDist`. Blocking key: (substring(name, blockAt,
    * blockLen), length(name) div lenBand) — prefix slice + length band.
    * Output: (a_id, b_id, a_name, b_name, dist), one row per matched
    * candidate pair. */
  def blockedLevenshteinJoin(a: DataFrame, b: DataFrame, maxDist: Int,
      blockAt: Int = 1, blockLen: Int = 4, lenBand: Int = 4): DataFrame = {
    require(maxDist >= 0 && blockLen > 0 && lenBand > 0)
    def blocked(df: DataFrame, p: String) = df.select(
      col("id").as(s"${p}_id"), col("name").as(s"${p}_name"),
      substring(col("name"), blockAt, blockLen).as("__blk"),
      expr(s"length(name) div $lenBand").as("__lb"))
    blocked(a, "a")
      .join(blocked(b, "b"), Seq("__blk", "__lb"))
      .withColumn("dist",
        levenshtein(col("a_name"), col("b_name"), maxDist + 1).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select("a_id", "b_id", "a_name", "b_name", "dist")
  }
}
