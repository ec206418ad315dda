package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated synthetic star schema (TESTDATA.md).
  *
  * Each table is a single parquet file; at cluster scale these would be
  * directories of row-group-sized parquet parts — the reader code is
  * identical. Column pruning + predicate pushdown reach the scan because
  * callers express everything declaratively on the returned DataFrame.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Catalog-style resolution: `spark.read.parquet` re-reads the footer
  // (schema inference) and re-lists the path on every call — per-QUERY
  // driver latency a real engine pays once at table registration. Cache
  // the resolved plan per (session, dir, table); logical plans are
  // immutable, so reuse across queries is safe. (Files changing under a
  // live session need an explicit `invalidate`, same as Spark's own
  // catalog REFRESH TABLE.)
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def invalidate(): Unit = resolved.clear()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    resolved.computeIfAbsent((System.identityHashCode(spark), dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's TimestampType
      // (micros) cannot represent. Sessions set
      // spark.sql.legacy.parquet.nanosAsLong=true so the column arrives as
      // nano-epoch Long; normalize to TimestampType here (values are
      // micro-aligned so `div 1000` is lossless).
      df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
        case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case None    => df
      }
    })

  /** Register every table as a temp view so `spark.sql` parity queries and
    * the DuckDB oracle share one naming scheme. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
