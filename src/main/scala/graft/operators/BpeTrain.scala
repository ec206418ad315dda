package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training — the step a training-data
  * pipeline runs BEFORE tokenizing 100 TB: learn the merge table from the
  * corpus itself (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units"). Two alphabets behind one loop:
  * [[train]] (character atoms, the classic variant) and [[trainBytes]]
  * (UTF-8-byte atoms as hex symbols — the GPT-2/SentencePiece-style
  * closed alphabet the engine's tokenizer family gates on since
  * round 7).
  *
  * Scale shape, which is what makes word-type-table BPE the distributed
  * algorithm of choice:
  *   - the corpus is touched EXACTLY ONCE — a wordcount scan + hash agg
  *     reduces 100 TB of text to the word-TYPE table (vocabulary), whose
  *     cardinality is corpus-sublinear (Heaps' law);
  *   - every merge round runs on that type table: one pair-explode +
  *     partial-aggregatable hash agg (the shuffle carries |distinct
  *     pairs| rows), then a pure-expression merge application;
  *   - per-round driver sync is ONE (left, right, count) scalar triple —
  *     the same control-plane envelope as PageRank's convergence check;
  *   - lineage is bounded by an eager localCheckpoint per round, so round
  *     N's plan does not re-derive rounds 1..N-1.
  *
  * The merge pick is deterministic: max count, ties broken by (left,
  * right) ascending — so the whole training run is layout-independent
  * and replayable by any SQL engine (see the q103 oracle, which unrolls
  * the rounds as CTEs and reproduces the merges bit-for-bit).
  */
object BpeTrain {

  /** One learned merge: `left`+`right` fused after round `round`, having
    * been the most frequent adjacent pair with weighted count `weight`. */
  case class Merge(round: Int, left: String, right: String, weight: Long)

  /** Train `rounds` merges over the space-tokenized `textCol` corpus
    * with CHARACTER atoms (the classic Sennrich'16 variant). Returns
    * the merge table (driver-side scalars — they are the learned model)
    * and the final word-type table (`syms` array<string>, `wc` long)
    * with all merges applied, for vocabulary statistics. */
  def train(df: DataFrame, textCol: String, rounds: Int): (Seq[Merge], DataFrame) =
    trainWith(df, textCol, rounds, w => split(w, ""))

  /** BYTE-level training (the GPT-2/SentencePiece-style alphabet): each
    * word decomposes into its UTF-8 bytes, represented as 2-hex-digit
    * symbols ("61", "C3"...), and merges fuse byte sequences — so a
    * merged symbol is the hex of a byte string, `length(sym)/2` is its
    * REAL byte width, and the learned vocabulary is closed over any
    * input (every byte is an atom; no OOV characters, multi-byte
    * code points merge like any other byte pair). The hex encoding is
    * what makes the model replayable by a SQL twin: both engines emit
    * identical uppercase hex for identical UTF-8 bytes, and the merge
    * rounds are the same deterministic argmax as [[train]]. */
  def trainBytes(df: DataFrame, textCol: String, rounds: Int): (Seq[Merge], DataFrame) =
    trainWith(df, textCol, rounds,
      w => regexp_extract_all(hex(w), lit(".."), lit(0)))

  /** The shared training loop: `atomize` maps a word to its initial
    * symbol array; everything downstream (pair counting, argmax, merge
    * application) is alphabet-agnostic. */
  private def trainWith(df: DataFrame, textCol: String, rounds: Int,
      atomize: Column => Column): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    var cur = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wc"))
      .select(atomize(col("word")).as("syms"), col("wc"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = cur
        .select(col("wc"), explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("wc").as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word is a single symbol
      else {
        val (l, rt, n) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += Merge(r, l, rt, n)
        cur = cur.select(applyMerge(col("syms"), l, rt).as("syms"), col("wc"))
          .localCheckpoint()
        r += 1
      }
    }
    (merges.toList, cur)
  }

  /** Adjacent symbol pairs as array<struct<l, r>> — zip of the
    * one-shifted prefixes, pure expression work. */
  private def pairsOf(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Greedy left-to-right non-overlapping application of merge (l, r) as
    * an array fold: a freshly merged tail equals l+r, which can never
    * equal l (r is non-empty), so the fold cannot re-consume its own
    * output — it is exactly the scan-and-skip application. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      typedLit(Seq.empty[String]),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))
}
