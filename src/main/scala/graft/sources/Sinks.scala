package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.TextFunctions

/** Transformed-layer sinks and readers (SURVEY §2.1 S5/S8, §2.3 D5).
  *
  * The reference writes header CSV per table under
  * `transformed_data/{album,artist,songs}/` (spotify-airflow-pipeline
  * .py:111-113,132-134,160-162,221-261) and loads it with
  * NULL_IF=('NULL','null'), EMPTY_FIELD_AS_NULL, optional quotes
  * (spotify-analysis.sql:14-20).
  *
  * The engine writes a CSV twin (byte-compatible semantics) plus parquet
  * as the native format, partitioned by scrape_date where the column
  * exists — partition pruning then serves the date-windowed queries
  * (Q1/Q4) without touching cold days. At 100 TB the parquet twin is the
  * only sane scan target; CSV exists for reference parity.
  */
object Sinks {

  def writeCsv(df: DataFrame, outDir: String, mode: String = "append"): Unit =
    df.write.mode(mode)
      .option("header", "true")
      .option("nullValue", "NULL") // D5: nulls round-trip as 'NULL'
      .option("quote", "\"")
      .csv(outDir)

  def writeParquet(df: DataFrame, outDir: String, mode: String = "append",
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(outDir)
  }

  /** Bucketed + sorted managed table: co-locates join/agg keys at write
    * time so repeated joins on `bucketCols` run shuffle-free (the scan is
    * already hash-distributed and sorted the way SortMergeJoin wants it).
    * The write-once-shuffle-never pattern that pays for itself the second
    * time a 100 TB fact table is joined on its key. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      numBuckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Training-corpus sharding: deterministic shard = stable 56-bit hash of
    * the id, mod numShards — every shard is a pseudo-random, reproducible
    * sample of the corpus (what a training loader wants), the assignment
    * survives repartitioning and corpus growth, and a re-run writes
    * byte-identical shard membership. One directory per shard via
    * partitionBy; the pre-write repartition on the shard column makes it
    * one output file per shard rather than numShards × input-partitions
    * fragments. */
  def writeSharded(df: DataFrame, outDir: String, idCol: String,
      numShards: Int, mode: String = "overwrite"): Unit =
    df.withColumn("__shard",
        pmod(TextFunctions.md5Hash56(col(idCol).cast("string")), lit(numShards.toLong)))
      .repartition(numShards, col("__shard"))
      .write.mode(mode)
      .partitionBy("__shard")
      .parquet(outDir)

  /** End-to-end JSONL export (X170): the real serializer behind the
    * q178 canonical assembly — every row becomes one `to_json` line
    * (field order = schema order, so the bytes are deterministic),
    * lines hash-shard by `idCol` exactly like [[writeSharded]]
    * (pseudo-random reproducible membership), each shard writes as a
    * real `__shard=N/` JSONL text file with lines in sorted order
    * (byte-identical re-runs), and a Merkle manifest
    * ([[graft.operators.Manifest.linesManifest]]) lands beside the
    * data under `_manifest` — an underscore path, so readers listing
    * the export dir never see it, while `spark.read.parquet` on the
    * explicit path does. Returns the committed manifest.
    *
    * The receiving side re-derives the manifest from the files it
    * read ([[jsonlManifest]]) and compares: equal roots ⟺ the copy is
    * byte-perfect; a mismatch localizes to the shard rows that differ
    * — the export/import integrity contract a 100 TB corpus handoff
    * needs (manifest is `shards+1` rows; nothing else is re-read).
    *
    * Scale shape: one exchange (the shard repartition) + per-shard
    * local sort; the manifest is one more shard-keyed agg over the
    * same lines.
    *
    * 100 TB hardening (round 8): a shard is a DIRECTORY, not a file.
    * `maxLinesPerFile > 0` caps each data file — rows rank within
    * their shard (a shard-keyed window on the already-shard-partitioned
    * exchange, no extra shuffle) and every `__file=M/` group lands as
    * its own bounded file inside the `__shard=N/` dir, so file size is
    * capped EXACTLY regardless of shard skew. The manifest algebra is
    * untouched — digests are per-shard over the line multiset, so the
    * file split is invisible to verification, and a tamper inside any
    * one sub-file still localizes to (that shard, root)
    * (NestExportSpec). `compression` ("gzip" | "zstd" | …) flows to
    * the text writer; readers and the receiver-side recompute are
    * extension-transparent. Shard-count rule at scale: pick
    * `numShards` ≈ corpus_bytes / (64 MB × expected files per shard)
    * and let `maxLinesPerFile` bound the file, NOT the shard — shard
    * count is the unit of verification granularity (and of the
    * manifest's control-plane size), file count is the unit of
    * parallel I/O; the two scale independently. */
  def exportJsonl(df: DataFrame, outDir: String, idCol: String,
      numShards: Int, mode: String = "overwrite",
      maxLinesPerFile: Long = 0L,
      compression: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val lines = df
      .withColumn("__line", to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
      .withColumn("__shard",
        pmod(TextFunctions.md5Hash56(col(idCol).cast("string")),
          lit(numShards.toLong)))
      .select(col("__line"), col("__shard"))
    val parted = lines.repartition(numShards, col("__shard"))
    val (placed, partCols) =
      if (maxLinesPerFile <= 0L)
        (parted.sortWithinPartitions("__line"), Seq("__shard"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__shard").orderBy("__line")
        (parted
          // integral floor division (`div`), not double division + cast:
          // the cap arithmetic stays exact by construction at any count
          .withColumn("__rn", row_number().over(w).cast("long"))
          .withColumn("__file", expr(s"(__rn - 1L) div ${maxLinesPerFile}L"))
          .drop("__rn")
          .sortWithinPartitions("__line"),
          Seq("__shard", "__file"))
      }
    val writer = placed.write.mode(mode).partitionBy(partCols: _*)
    compression.fold(writer)(c => writer.option("compression", c)).text(outDir)
    // manifest from the FILES just written, not the in-memory plan —
    // the artifact guards what actually landed on disk
    val written = spark.read.text(outDir)
      .select(col("__shard").cast("long").as("__shard"), col("value"))
    graft.operators.Manifest.linesManifest(written, "__shard", "value")
      .write.mode(mode).parquet(s"$outDir/_manifest")
    spark.read.parquet(s"$outDir/_manifest")
  }

  /** Recompute the line manifest of a JSONL export from its files —
    * the receiver's half of the [[exportJsonl]] integrity contract. */
  def jsonlManifest(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Manifest.linesManifest(
      spark.read.text(dir)
        .select(col("__shard").cast("long").as("__shard"), col("value")),
      "__shard", "value")

  /** Range-clustered layout: range-partition on the cluster columns and
    * sort within each output file, so every parquet file (and row group)
    * covers a narrow, near-disjoint range of the cluster key. Scans with
    * predicates on those columns then skip whole files via footer
    * min/max stats — the data-skipping layout that turns a 100 TB
    * full-scan into reading a handful of files. (Linear clustering; for
    * multi-column predicate mixes, interleave a Z-value column and
    * cluster on that.) */
  def writeClustered(df: DataFrame, outDir: String, clusterCols: Seq[String],
      numFiles: Int, mode: String = "overwrite"): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode(mode).parquet(outDir)

  /** Z-ordered layout: range-cluster on the Morton interleave of TWO
    * keys, so file-level min/max stats stay narrow on BOTH — predicates
    * on either dimension skip files, where linear clustering helps only
    * its leading key. Same shuffle cost as `writeClustered` (one range
    * exchange + local sort); the z column is dropped from the files. */
  def writeZOrdered(df: DataFrame, outDir: String, colA: String, colB: String,
      numFiles: Int, mode: String = "overwrite"): Unit =
    df.withColumn("__z", graft.functions.ZOrder.zValue(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(mode).parquet(outDir)

  /** Post-read NULL_IF normalization: the reference declares a
    * TWO-token null set, NULL_IF=('NULL','null')
    * (spotify-analysis.sql:18), but Spark's CSV reader takes ONE
    * `nullValue` token. 'NULL' is handled at parse time
    * ([[csvOptions]]); the lowercase token is normalized here on
    * STRING columns — in non-string columns the token already fails
    * the typed parse and reads as NULL under PERMISSIVE mode, so the
    * two paths together reproduce the reference's semantics for
    * foreign (reference-produced) CSVs, not just self-written ones. */
  private def normalizeNullTokens(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toSeq.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        when(df(f.name) === "null", lit(null).cast("string"))
          .otherwise(df(f.name)).as(f.name)
      else df(f.name)
    }: _*)

  /** CSV reader with the reference's null/quote semantics (S8/D5). */
  def readCsv(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    normalizeNullTokens(csvOptions(spark.read).schema(schema).csv(dir))

  /** Schema inference over the NORMALIZED cell values (round 15): the
    * reader takes ONE nullValue token, so inferring directly over a
    * foreign CSV carrying the reference's second token ('null') would
    * see it as a string cell and degrade an otherwise-numeric column to
    * STRING — the reference crawler with NULL_IF=('NULL','null') infers
    * the numeric type. Parse all-string first, null BOTH tokens, then
    * run Spark's own `CSVInferSchema` type-promotion fold directly over
    * the normalized cells ([[org.apache.spark.sql.graftsql.inferCsvSchema]]).
    * One univocity parse + one codegen'd normalize projection + the
    * inference fold — the round-15 build implementation serialized the
    * normalized rows back to CSV text (`to_csv`) and re-parsed them just
    * to reach the inference fold, a full extra parse per call removed in
    * the optimization round (q227 ran it twice per execution). Inference
    * semantics are Spark's verbatim: the fold sees `null` exactly where
    * the two-token contract nulls a cell, everything else as the
    * original token text. */
  def inferCsvNormalizedSchema(spark: SparkSession, dir: String): StructType = {
    val raw = csvOptions(spark.read).csv(dir) // header only, all-string
    val names = raw.columns
    val n = names.length
    val cells = normalizeNullTokens(raw).queryExecution.toRdd
      .mapPartitions(_.map { ir =>
        Array.tabulate(n)(i =>
          if (ir.isNullAt(i)) null else ir.getUTF8String(i).toString)
      })
    org.apache.spark.sql.graftsql.inferCsvSchema(spark, cells, names, Map(
      "inferSchema" -> "true", "nullValue" -> "NULL", "quote" -> "\""))
  }

  /** The normalized-inference read: infer ([[inferCsvNormalizedSchema]]),
    * then read through the standard two-token contract ([[readCsv]]) —
    * value-identical to parsing the normalized cells under the inferred
    * types (a non-string token that fails its typed parse reads as NULL
    * under PERMISSIVE, which is exactly where the normalize pass nulls). */
  def inferCsvNormalized(spark: SparkSession, dir: String): DataFrame =
    readCsv(spark, dir, inferCsvNormalizedSchema(spark, dir))

  /** Glue-Crawler equivalent (S11): infer schema from the header CSVs and
    * register a catalog table over them (reference: README.md:5-7, the 3
    * spotify_{album,artist,songs} crawlers). Explicit DDL stays the
    * production path — inference exists for parity with crawler-built
    * tables. Inference runs over NORMALIZED cells ([[inferCsvNormalized]])
    * so both reference null tokens read as null BEFORE types are picked. */
  def crawlCsv(spark: SparkSession, dir: String, table: String,
      location: Option[String] = None): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table") // crawler re-run = replace
    val w = inferCsvNormalized(spark, dir).write.mode("overwrite")
    location.fold(w)(w.option("path", _)).saveAsTable(table)
  }

  def csvOptions(r: DataFrameReader): DataFrameReader =
    r.option("header", "true")
      .option("nullValue", "NULL")
      .option("emptyValue", "") // empty field → null via nullValue chain
      .option("quote", "\"")
}
