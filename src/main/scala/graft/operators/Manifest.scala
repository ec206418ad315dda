package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Merkle-style corpus integrity manifest: deterministic shard
  * assignment (md5 hash-bucket of the id — the X29 split convention),
  * one content digest per shard over the SORTED member fingerprints,
  * and a root digest over the sorted shard digests. Two corpus copies
  * agree iff the root rows agree; a mismatch localizes to the shard
  * rows that differ — the cheap cross-site/cross-snapshot equality
  * check a 100 TB replication or migration job runs instead of a full
  * diff (the X78 snapshot diff is the expensive follow-up that names
  * the rows, run only on shards this manifest flags).
  *
  * Determinism: member digests are the X12 normalized-content md5s,
  * shard digests hash the members in SORTED order (hex strings, ASCII
  * collation — engine-portable), so the manifest is independent of
  * partitioning, arrival order, and engine. Scale shape: one hash-agg
  * keyed by shard (map-side combined), per-shard state bounded by
  * members/shard — `shards` scales with the corpus like any partition
  * count; the root fold is over `shards` rows (control plane).
  */
object Manifest {

  /** (shard, n_docs, shard_hash) per shard plus a root row
    * (shard = −1, total docs, root hash). */
  def corpusManifest(docs: DataFrame, idCol: String, textCol: String,
      shards: Int = 64): DataFrame =
    rollup(docs.select(
      pmod(TextFunctions.md5Hash56(col(idCol).cast("string")),
        lit(shards.toLong)).as("shard"),
      TextFunctions.fingerprint(col(textCol)).as("fp")))

  /** Manifest over ALREADY-SHARDED exact lines (the export-sink face,
    * [[graft.sources.Sinks.exportJsonl]]): member digests are md5 of
    * the VERBATIM line bytes — no content normalization, because here
    * the manifest guards a serialized artifact where every byte is
    * contractual — and the shard column is whatever assignment the
    * writer used, so a receiver recomputing this over the files it
    * read gets bit-equality iff nothing was lost or tampered. */
  def linesManifest(lines: DataFrame, shardCol: String,
      lineCol: String): DataFrame =
    rollup(lines.select(col(shardCol).cast("long").as("shard"),
      md5(col(lineCol).cast("binary")).as("fp")))

  /** Merkle rollup over an already-fingerprinted (shard, fp) table —
    * the entry point for callers that maintain member digests
    * themselves (e.g. the streaming export's versioned state). */
  def fromFingerprints(f: DataFrame): DataFrame = rollup(f)

  /** The shared Merkle rollup over a (shard, fp) stream: one shard-keyed
    * hash agg + a `shards`-row root fold. */
  private def rollup(f: DataFrame): DataFrame = {
    val per = f.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws("", array_sort(collect_list(col("fp"))))
          .cast("binary")).as("shard_hash"))
    val root = per.agg(
        sum(col("n_docs")).as("n_docs"),
        md5(concat_ws("",
            transform(
              array_sort(collect_list(struct(col("shard"), col("shard_hash")))),
              x => x.getField("shard_hash")))
          .cast("binary")).as("shard_hash"))
      .select(lit(-1L).as("shard"), col("n_docs"), col("shard_hash"))
    per.unionByName(root)
  }

  /** Shard-level diff of two corpus manifests: (shard, status,
    * n_docs_a, n_docs_b) with status ∈ {same, changed, only_a, only_b}
    * (root rows compared like any shard, as shard −1). This is the
    * CHEAP first stage of a cross-copy reconciliation: only `changed`
    * shards proceed to the row-level [[Temporal.snapshotDiff]] — at
    * 100 TB the manifests are `shards`-row tables, so the diff costs
    * nothing regardless of corpus size. */
  def manifestDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, shards: Int = 64): DataFrame = {
    val ma = corpusManifest(a, idCol, textCol, shards)
      .withColumnRenamed("n_docs", "n_docs_a")
      .withColumnRenamed("shard_hash", "__ha")
    val mb = corpusManifest(b, idCol, textCol, shards)
      .withColumnRenamed("n_docs", "n_docs_b")
      .withColumnRenamed("shard_hash", "__hb")
    ma.join(mb, Seq("shard"), "full_outer")
      .select(col("shard"),
        when(col("__ha").isNull, "only_b")
          .when(col("__hb").isNull, "only_a")
          .when(col("__ha") === col("__hb"), "same")
          .otherwise("changed").as("status"),
        col("n_docs_a"), col("n_docs_b"))
  }
}
