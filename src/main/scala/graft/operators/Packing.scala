package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sequence packing: assign documents to fixed token-budget
  * bins (the "pack documents into context windows" step of a training
  * pipeline, where a bin becomes one training sequence).
  *
  * Packing is inherently sequential *within an ordering*, so the scalable
  * formulation shards first: documents are spread over `shards` hash
  * shards, deterministically ordered inside each (content-stable hash,
  * then id), and bin = floor(exclusive-prefix-token-sum / budget). A
  * document that straddles a boundary belongs to the bin where it starts
  * (training-side truncation/continuation handles the tail — the
  * first-fit-with-overflow policy packed corpora actually use).
  *
  * Scale design (100 TB):
  *  - the only exchange is the per-shard window sort; shard count scales
  *    with the cluster, so no global sort and no single-partition window
  *    ever materializes;
  *  - the prefix sum is a running aggregate over an already-sorted
  *    partition — one pass, no per-bin state;
  *  - determinism: ordering keys are md5-derived (engine-portable), so
  *    the same corpus packs identically across runs, engines, and
  *    repartitioning — bin membership is reproducible lineage metadata,
  *    not an artifact of task scheduling.
  */
object Packing {

  /** Per-document bin assignment: (idCol, n_tok, shard, bin).
    *
    * @param nTokens token-count column (e.g. `TextFunctions.tokenCount`)
    * @param budget  tokens per bin (context length)
    * @param shards  independent packing streams (≥ cluster parallelism)
    */
  def pack(docs: DataFrame, idCol: String, nTokens: Column,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val h = TextFunctions.md5Hash56(col(idCol).cast("string"))
    val w = Window.partitionBy("shard").orderBy("__h", idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), nTokens.as("n_tok"), h.as("__h"),
        pmod(h, lit(shards.toLong)).as("shard"))
      .withColumn("__prefix", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", floor(col("__prefix") / lit(budget)))
      .drop("__h", "__prefix")
  }
}
