package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  // Outer map is weak-keyed by the session itself (reference identity):
  // entries — and the cached plans bound to that session — die with it,
  // and a new session can never collide with a stopped one's cache.
  private val resolved =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def invalidate(): Unit = resolved.synchronized(resolved.clear())

  private def sessionCache(spark: SparkSession) = resolved.synchronized {
    var m = resolved.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
      resolved.put(spark, m)
    }
    m
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    sessionCache(spark).computeIfAbsent((dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's TimestampType
      // (micros) cannot represent. Sessions set
      // spark.sql.legacy.parquet.nanosAsLong=true so the column arrives as
      // nano-epoch Long; normalize to TimestampType here (values are
      // micro-aligned so `div 1000` is lossless).
      df.schema.find(_.name == "ts").map(_.dataType) match {
        case Some(LongType) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // Driver generations vary in the parquet logical type: naive
        // timestamp[us] arrives as TIMESTAMP_NTZ. The cast to
        // TimestampType is a lossless identity on the stored micros
        // ONLY under a UTC session timezone (any other zone would
        // silently shift the instants), so the invariant is enforced
        // here at the API boundary rather than assumed from the
        // in-repo entry points that all set it. Keeps every downstream
        // operator (unix_micros, window lag, interval arith) on the one
        // timestamp type the engine standardizes on.
        case Some(TimestampNTZType) =>
          require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
            "Tables.load requires spark.sql.session.timeZone=UTC: the " +
              "TIMESTAMP_NTZ→TimestampType normalization is only a " +
              "lossless identity under UTC")
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    })

  /** Register every table as a temp view so `spark.sql` parity queries and
    * the DuckDB oracle share one naming scheme. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Rewrite every table under `destDir` as multi-file parquet,
    * `partitions` files per table. The driver-generated local-SF files
    * are single-row-group parquet, which caps Spark's scan parallelism
    * at ONE task per table regardless of cores (a row group is the
    * minimum split unit) — a layout artifact of the small test files,
    * not of the engine: at cluster scale tables arrive as directories
    * of row-group-sized parts, and any real deployment controls its own
    * layout via ingest/compaction. Staging once (untimed, like the JIT
    * warmup) lets every scan stage fan out across the cores the box
    * actually has. Byte-identical data, order-insensitive queries. */
  /** The row-heavy tables whose scan stages are worth fanning out; the
    * dimensions stay single-file (multi-file scans of tiny tables only
    * add task-scheduling overhead — measured, see Bench scaladoc). */
  private val bigTables = Set("lineitem", "orders", "events", "documents", "embeddings")

  def stageLayout(spark: SparkSession, srcDir: String, destDir: String,
      partitions: Int): Unit =
    names.foreach { n =>
      val parts = if (bigTables(n)) partitions else 1
      load(spark, srcDir, n).repartition(parts)
        .write.mode("overwrite").parquet(s"$destDir/$n.parquet")
    }

  /** Pin every table hot in the block-manager cache (Spark's CACHE TABLE),
    * re-sliced to `partitions` so cached scans parallelize even when the
    * on-disk file is a single row group (the local-SF layout). Subsequent
    * `load` calls resolve to the hot copy. Benchmark/serving-session
    * feature — at 100 TB you'd pin dimensions, not facts. */
  def hotCache(spark: SparkSession, dir: String, partitions: Int): Unit =
    names.foreach { n =>
      val hot = load(spark, dir, n).repartition(partitions)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      hot.count() // materialize now, not on first query
      sessionCache(spark).put((dir, n), hot)
    }
}
