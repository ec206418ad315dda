package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sinks

/** Staged, bucketed ingest-dedup indexes — the X57/X91 PRODUCTION face.
  *
  * The incremental dedup probes (exact fingerprints, q75; shingle-hash
  * near-dup, q107/q120) join every arriving batch against the
  * already-accepted corpus's index table. At 100 TB that index is the
  * big side and it is touched by EVERY ingest batch, so the
  * write-once-shuffle-never trade is exactly right: materialize it
  * bucketed on the probe key (`Sinks.writeBucketed` — hash-distributed
  * and sorted at write time), and every subsequent ingest join reads it
  * with `HashPartitioning` already satisfied — the ONLY Exchange in the
  * probe subtree is the small batch side's (Round15Spec plan-asserts
  * no Exchange above the index-side scan). Compare the unstaged shape,
  * which re-exchanges the full index per batch.
  *
  * Staging protocol is the repo's fixture convention (q120 drain, q80
  * probes): built once per (app, sf dir, kind), the build cost exposed
  * via [[stageSecs]] and emitted by Bench as the separate
  * `dedup_index_sec` field — ingest-side fixed cost a real deployment
  * pays once per index snapshot, amortized over every batch probed
  * against it (BENCHING.md rule 6). Bucket count 32 = the session's
  * shuffle parallelism; a cluster deployment sizes buckets to
  * executor-count × a small factor instead.
  */
object DedupIndex {

  /** Bucket count for staged index tables (= local shuffle partitions,
    * so co-partitioned plans line up 1:1 with batch-side exchanges). */
  val NumBuckets = 32

  // (applicationId, sf dir, kind) -> (table name, build seconds)
  private val staged =
    new ConcurrentHashMap[(String, String, String), (String, Double)]()

  /** Wall seconds each staged index took to build, keyed `kind:dir`.
    * Empty until an indexed dedup query has run in this app. */
  def stageSecs: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    staged.asScala.map { case ((_, d, k), v) => s"$k:$d" -> v._2 }.toMap
  }

  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  // (applicationId, sf dir, kind) -> append done (memoized once per app)
  private val appendedOnce =
    new ConcurrentHashMap[(String, String, String), java.lang.Boolean]()

  /** INCREMENTAL index maintenance (X228): append `rows` (same schema
    * and bucket spec as the staged `kind` table) into the index IN
    * PLACE — an accepted batch's fingerprints join the table without a
    * snapshot rebuild. A bucketed append writes `NumBuckets` more
    * files hash-clustered by the SAME spec, so subsequent probes still
    * read the table exchange-free; each bucket simply spans more files
    * (and the scan can no longer assume per-bucket sort order — an SMJ
    * probe adds a local Sort, never an Exchange; periodic compaction
    * rewrites the table, the standard LSM trade). `rows` is eagerly
    * localCheckpointed first so the append's write plan reads executor
    * blocks rather than the very table it appends to (a production
    * ingest writes accepted fingerprints from the probe output as a
    * separate job — same decoupling). Memoized once per (app, dir,
    * kind): bench min-of-N re-runs must not grow the index. Cost lands
    * in [[stageSecs]] under `kind.append`. */
  def appendOnce(spark: SparkSession, dir: String, kind: String,
      bucketCols: Seq[String])(rows: => DataFrame): Unit = {
    appendedOnce.computeIfAbsent(
      (spark.sparkContext.applicationId, dir, kind), _ => {
        val key = (spark.sparkContext.applicationId, dir, kind)
        val prior = staged.get(key)
        require(prior != null,
          s"appendOnce: index '$kind' for $dir is not staged in this app — " +
          "stage via index() before maintaining it")
        val t0 = System.nanoTime()
        val pinned = rows.localCheckpoint(true)
        pinned.write.mode("append")
          .bucketBy(NumBuckets, bucketCols.head, bucketCols.tail: _*)
          .sortBy(bucketCols.head, bucketCols.tail: _*)
          .format("parquet")
          .saveAsTable(prior._1)
        pinned.unpersist()
        staged.put((spark.sparkContext.applicationId, dir, s"$kind.append"),
          (prior._1, (System.nanoTime() - t0) / 1e9))
        java.lang.Boolean.TRUE
      })
    ()
  }

  private val generation = new java.util.concurrent.atomic.AtomicInteger(0)

  /** LSM-style COMPACTION — X228's third verb (stage → append* →
    * compact): rewrite the maintained table (base staging plus every
    * appended delta) into a fresh snapshot with ONE file per non-empty
    * bucket, and repoint `kind` at it — subsequent [[index]] lookups
    * and probes read the compacted table transparently. The pre-write
    * `repartition(NumBuckets, bucketCols)` aligns with the bucket
    * hash (both are Murmur3 pmod NumBuckets), so each task holds
    * exactly its bucket and writes exactly one file; the bucketed
    * sortBy write also restores the per-bucket FILE sort the append
    * path gave up. The planner elides the SMJ probe's index-side Sort
    * only under `spark.sql.legacy.bucketedTableScan.outputOrdering`
    * (proving one-file-per-bucket needs a planning-time listing, so
    * Spark stopped declaring scan ordering by default — SPARK-32859);
    * Round15Spec pins both behaviors. Values are identical by
    * construction — a
    * compaction that changed a probe result would be a bug, and the
    * Round15Spec gate re-runs the probe against the compacted
    * snapshot. The old table is dropped from the catalog. Cost lands
    * in [[stageSecs]] under `kind.compact`.
    *
    * The repoint is NOT transactional against in-flight readers: a
    * plan already resolved against the old table fails once it is
    * dropped. All session callers are sequential (the probe queries
    * never invoke compact); a concurrent deployment would keep the
    * old snapshot until its readers drain and drop it then — the
    * usual snapshot-swap discipline, out of scope here. */
  def compact(spark: SparkSession, dir: String, kind: String,
      bucketCols: Seq[String]): DataFrame = {
    val key = (spark.sparkContext.applicationId, dir, kind)
    val prior = staged.get(key)
    require(prior != null,
      s"compact: index '$kind' for $dir is not staged in this app")
    val t0 = System.nanoTime()
    val (oldName, stageCost) = prior
    val g = generation.incrementAndGet()
    val newName = s"graft_idx_${kind}_${tag(dir)}_g$g"
    import org.apache.spark.sql.functions.col
    // one-file-per-bucket needs write tasks ALIGNED with bucket ids.
    // Two planner behaviors break the naive `repartition(N, cols)`
    // (observed: task 0 writing buckets 0..3 → 2 files/bucket): the
    // auto-bucketed-scan rule reads the old table as a PLAIN packed
    // scan (no per-bucket partitions) while the repartition is elided
    // as already-satisfied by the table's declared bucketing, and
    // AQE's coalescer merges adjacent shuffle partitions inside the
    // planned-write rewrite. Pin both off for this one write: the
    // bucketed read yields exactly one partition per bucket, the
    // repartition then elides or aligns, and each task writes its one
    // bucket.
    val pinned = Seq(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false")
    val prev = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try Sinks.writeBucketed(
      spark.table(oldName).repartition(NumBuckets, bucketCols.map(col): _*),
      newName, s"target/graft_idx/${kind}_${tag(dir)}_g$g",
      NumBuckets, bucketCols)
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    spark.sql(s"DROP TABLE IF EXISTS $oldName")
    staged.put(key, (newName, stageCost))
    staged.put((spark.sparkContext.applicationId, dir, s"$kind.compact"),
      (newName, (System.nanoTime() - t0) / 1e9))
    spark.table(newName)
  }

  /** Stage (once per app + sf dir) a bucketed index table and return it
    * as read through the catalog — the scan carries the bucketed
    * distribution on `bucketCols`. `build` runs only on the staging
    * pass; repeat calls are a table lookup. */
  def index(spark: SparkSession, dir: String, kind: String,
      bucketCols: Seq[String])(build: => DataFrame): DataFrame = {
    val table = staged.computeIfAbsent(
      (spark.sparkContext.applicationId, dir, kind), _ => {
        val t0 = System.nanoTime()
        val name = s"graft_idx_${kind}_${tag(dir)}"
        Sinks.writeBucketed(build, name, s"target/graft_idx/${kind}_${tag(dir)}",
          NumBuckets, bucketCols)
        (name, (System.nanoTime() - t0) / 1e9)
      })._1
    spark.table(table)
  }
}
