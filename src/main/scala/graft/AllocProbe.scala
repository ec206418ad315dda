package graft
import org.apache.spark.sql.SparkSession

/** Allocation-rate attribution probe (round 13, VERDICT r12 item 1):
  * the driver bench's `gc_ms` doubled in round 12 while the fleet got
  * FASTER — an allocation-rate signal, not retention (the r12 heap A/B
  * pinned that). This main attributes ALLOCATED BYTES and GC time to
  * individual queries so "find the allocators" is a measurement, not a
  * suspect list.
  *
  * Method: per query — one untimed warmup (JIT/codegen/fixture memos,
  * the Bench rule), a cache sweep, then one measured run bracketed by
  * (Σ per-thread allocated bytes, Σ GC collection ms) samples from
  * `com.sun.management.ThreadMXBean` / the GC MXBeans. Thread-allocated
  * counters are monotone per live thread; local-mode executor pools are
  * stable after warmup, so the delta attributes the run's allocation to
  * within thread-churn noise (threads that die mid-run undercount —
  * fine for a ranking). Output: one JSON line, queries sorted by
  * allocated MB desc.
  *
  * Usage: `sbt "runMain graft.AllocProbe [qprefix,...]"` with the same
  * env knobs as Bench (SPARK_GRAFT_SF_DIR / _CPUS / _SHUFFLE_PARTITIONS).
  */
object AllocProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.useV1SourceList", "")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    tmx.setThreadAllocatedMemoryEnabled(true)
    def allocTotal(): Long = {
      val ids = tmx.getAllThreadIds
      tmx.getThreadAllocatedBytes(ids).filter(_ > 0).sum
    }
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime)
      .filter(_ > 0).sum

    val pinned0 = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def sweep(): Unit = {
      val keep = pinned0 ++ graft.operators.CurationOps.pinnedRddIds
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep(id) }
        .values.foreach(_.unpersist(blocking = false))
    }
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val only = args.headOption
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(f => f.exists(n.startsWith)))

    names.foreach { n => try run(n) catch { case _: Throwable => () }; sweep() }

    val rows = names.map { n =>
      val a0 = allocTotal(); val g0 = gcMs()
      val t0 = System.nanoTime()
      val failed = try { run(n); false } catch { case _: Throwable => true }
      val dt = (System.nanoTime() - t0) / 1e9
      val mb = (allocTotal() - a0) / (1024.0 * 1024.0)
      val g = gcMs() - g0
      sweep()
      println(f"[alloc] $n%-28s ${mb / 1024}%7.2f GB  gc=${g}%4d ms  t=$dt%5.2f s" +
        (if (failed) "  **FAILED**" else ""))
      (n, mb, g, dt, failed)
    }
    val totalGb = rows.map(_._2).sum / 1024
    println(f"[alloc] TOTAL one pass: $totalGb%.1f GB allocated, " +
      s"${rows.map(_._3).sum} gc ms")
    val qs = rows.sortBy(-_._2).map { case (n, mb, g, t, f) =>
      "\"" + n + "\":{\"alloc_mb\":" + math.rint(mb) +
        ",\"gc_ms\":" + g + ",\"t\":" + math.rint(t * 100) / 100 +
        (if (f) ",\"err\":true" else "") + "}"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"alloc_probe","sf":"$sfDir","total_alloc_gb":""" +
      f"$totalGb%.1f" + s""","queries":$qs}""")
    spark.stop()
  }
}
