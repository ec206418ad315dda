package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusQueries, StarQueries}

/** Physical-plan shape assertions for the round-7 additions. */
class Round7PlanSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q190 star join: every dimension broadcasts, the fact table never re-exchanges") {
    val df = StarQueries.q190StarJoin(spark, sf)
    // an action on THIS Dataset finalizes AQE on the plan we assert on
    // (a noop write would run a separate QueryExecution); cut the
    // == Initial Plan == section so counts see the final plan only
    df.collect()
    val full = planOf(df)
    val cut = full.indexOf("== Initial Plan ==")
    val p = if (cut >= 0) full.substring(0, cut) else full
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 4,
      s"region/nation/customer/supplier (and ideally orders) must broadcast; got $nBroadcast in:\n$p")
    assert(!p.contains("CartesianProduct"))
    // at most the lineitem⋈orders pair may shuffle; with AQE the
    // date-filtered orders side broadcasts too at this SF
    val nSmj = "SortMergeJoin".r.findAllIn(p).length
    assert(nSmj <= 1, s"more than one shuffle join in the star:\n$p")
  }

  test("q186 equi-width histogram: stats broadcast, bucketing is a hash agg") {
    val p = planOf(StarQueries.q186EquiwidthHist(spark, sf))
    assert(p.contains("Broadcast"))
    assert(p.contains("HashAggregate"))
  }

  test("q181 exact substring dedup: fp agg is hash-based, no cartesian, doc window keyed") {
    val df = CorpusQueries.substringDedupExact(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
    val opt = df.queryExecution.optimizedPlan.toString.replaceAll("\\s", "")
    val keyless = "windowspecdefinition\\((?!id)".r
    assert(keyless.findFirstIn(opt).isEmpty, s"keyless window in:\n$opt")
  }

  test("clustered layout: a point predicate decodes ~one file's rows (row-group skipping)") {
    // CorpusSpec asserts the file RANGES are disjoint; this asserts the
    // payoff in the EXECUTED scan: Spark's parquet pushdown skips
    // row groups whose min/max excludes the predicate, so the scan's
    // numOutputRows is bounded by the one matching file's rows — not
    // the table's. (Vanilla Spark lists all files — numFiles stays 4;
    // the skipped ones cost a footer read, not a decode. File-LEVEL
    // listing pruning is the table-format layer's job.)
    val dir = java.nio.file.Files.createTempDirectory("skip-proof").toString
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val total = docs.count()
    graft.sources.Sinks.writeClustered(docs, dir, Seq("doc_id"), numFiles = 4)
    val probe = docs.select(org.apache.spark.sql.functions.min("doc_id"))
      .head().getLong(0)
    val q = spark.read.parquet(dir)
      .where(org.apache.spark.sql.functions.col("doc_id") === probe)
    assert(q.collect().length == 1) // execute THIS QueryExecution's plan
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScan in the plan")
    assert(scans.head.metadata("PushedFilters").contains("EqualTo"),
      "the point predicate must reach the parquet reader")
    val decoded = scans.map(_.metrics("numOutputRows").value).sum
    assert(decoded <= total / 2,
      s"row-group skipping should decode ~1 of 4 clustered files' rows, decoded $decoded of $total")
  }

  test("partitioned layout: directory-level pruning — the scan lists ONE partition's files") {
    // the hive-partitioned complement of the row-group-skipping proof:
    // a partition-column predicate must land in PartitionFilters and
    // the executed scan's numFiles must count only the one directory
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("part-prune").toString
    val ev = Tables.load(spark, sf, "events")
      .select("event_id", "event_type", "user_id")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val nTypes = ev.select("event_type").distinct().count()
    assert(nTypes >= 3)
    val q = spark.read.parquet(dir).where(col("event_type") === "click")
    q.collect()
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("event_type"),
      "the predicate must prune at the directory level, not post-scan")
    val allFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_type="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val clickFiles = new java.io.File(s"$dir/event_type=click")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == clickFiles,
      s"scan should list only the click partition's $clickFiles files of $allFiles")
  }

  test("q80 qdigest: no recount scan — the verdict rides the gridded ranking pass") {
    // the plan must contain NO per-row conditional-count aggregate over
    // the raw stream beyond the sketch + the single ranked pass: assert
    // the obvious regression markers instead of counting scans — no
    // cartesian, and the only sort is the tiny bracketing-bucket window
    val df = CorpusQueries.quantileSketch(spark, sf)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("ObjectHashAggregate"), "sketch agg must be object-hash, not sort-based")
  }
}
