package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}

import graft.functions.WinnowFingerprints

/** Winnowing document fingerprints and the overlap detector built on
  * them — the local-similarity complement of the whole-document near-dup
  * family: MinHash/SimHash ([[NearDup]]) score GLOBAL set similarity,
  * winnowing guarantees detection of any shared LOCAL run of
  * ≥ `w + k − 1` tokens (quotation, template expansion, partial
  * plagiarism) while keeping only ~1/w of the gram hashes.
  *
  * Scale shape: fingerprint selection is a per-row expression
  * ([[graft.functions.WinnowFingerprints]] — no shuffle); the overlap
  * join shuffles only the SELECTED fingerprints (~n_tokens/w per doc),
  * groups by fingerprint value, and pairs documents bucket-local with
  * a document-frequency cap on the bucket size — the same hot-key
  * guard as the shingle near-dup path ([[NearDup]]): a boilerplate
  * fingerprint shared by 10^6 documents must cap, not pair
  * quadratically.
  */
object Winnow {

  /** Distinct selected fingerprints per document:
    * (id, pos, fp) — `pos` is the k-gram position, ascending. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame =
    docs.select(col(idCol),
        explode(winnow(col(textCol), k, w)).as("s"))
      .select(col(idCol), col("s.pos").as("pos"), col("s.fp").as("fp"))

  /** Document pairs sharing at least `minShared` distinct winnowed
    * fingerprint VALUES: (doc_a, doc_b, n_shared). `dfCap` drops
    * fingerprints selected by more than that many documents before
    * pairing (hot boilerplate guard). */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, minShared: Long = 2,
      dfCap: Int = Int.MaxValue): DataFrame = {
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("doc"), col("fp")).distinct()
    val capped =
      if (dfCap == Int.MaxValue) fps
      else {
        val hot = fps.groupBy("fp").agg(count(lit(1)).as("df"))
          .where(col("df") > dfCap).select("fp")
        fps.join(hot, Seq("fp"), "left_anti")
      }
    capped.as("a")
      .join(capped.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** The selection expression as a column: array<struct<pos,fp>>. */
  def winnow(text: Column, k: Int, w: Int): Column =
    exprColumn(WinnowFingerprints(columnExpr(text), k, w))
}
