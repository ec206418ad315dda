package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution ingest (X214, round 11): a corpus whose files were
  * written across a schema change — the Glue-Crawler leg of the
  * reference exists precisely because production landing zones drift
  * (a producer adds a column mid-corpus; the old files are never
  * rewritten). The engine face is Spark's `mergeSchema` parquet read:
  * the union-by-name of every file footer's schema, with a file's
  * missing columns read as NULL — the exact semantics of DuckDB's
  * `read_parquet(..., union_by_name = true)`, which is what makes an
  * oracle row possible (the q220 oracle replays epoch membership from
  * the source table, no file archaeology needed).
  *
  * Scale shape: schema merging reads FOOTERS, not data — one metadata
  * pass over the file listing, distributed by Spark's parquet reader;
  * the per-row cost of a drifted read is identical to a homogeneous
  * one (missing columns materialize as null vectors, no row rewrite).
  * A 100 TB landing zone with five historical schemas reads exactly
  * like one with one schema plus a footer-union step bounded by file
  * count.
  */
object SchemaDrift {

  // one staged corpus per (spark app, source dir) — the q120-drain /
  // q49-eval-fixture precedent: the staging write is a fixed ingest
  // cost paid once (the harness's untimed warmup), not per invocation
  private val staged =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Stage the two-epoch drifted orders corpus under a temp dir and
    * return its path (memoized). Epoch 1 — files written BEFORE the
    * drift — carries (o_orderkey, o_custkey, o_orderstatus,
    * o_totalprice); epoch 2 adds `o_orderpriority`. Epoch membership
    * is o_orderkey parity (even = pre-drift), so any engine can replay
    * which rows predate the column without reading the files. */
  def stageOrdersDrift(spark: SparkSession, dir: String): String =
    staged.computeIfAbsent((spark.sparkContext.applicationId, dir), { _ =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-schema-drift").toString
      val o = graft.Tables.load(spark, dir, "orders")
      val base = o.select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice")
      base.where(pmod(col("o_orderkey"), lit(2)) === 0)
        .write.mode("overwrite").parquet(s"$out/epoch=1")
      o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        .where(pmod(col("o_orderkey"), lit(2)) === 1)
        .write.mode("overwrite").parquet(s"$out/epoch=2")
      out
    })

  /** Read a drifted parquet corpus with explicit union-by-name
    * semantics: every file's columns by NAME, a file's missing columns
    * as NULL. `mergeSchema` is opt-in per read (the session default
    * leaves homogeneous scans free of the footer-union step). */
  def readMerged(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read
      .option("mergeSchema", "true")
      .option("recursiveFileLookup", "true")
      .parquet(corpusDir)
}
