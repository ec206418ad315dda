package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupIndex, NearDup, PrefixSum, Skyline}
import graft.queries.{CorpusQueries, StarQueries}
import graft.sources.{SchemaDrift, Sinks}

/** Round-15 orders: the bucketed fingerprint/shingle index probes
  * (X57/X91 production face — index side exchanges ZERO rows), the
  * PrefixSum driver-state + float-key + name-collision guards, the
  * Skyline anti-chain early break, the CSV rename-map drift face
  * (q228) with its inference-fork counterexample, the one-NULL_IF
  * contract across all CSV ingest paths, and the gridded-percentile
  * degenerate-domain contract. */
class Round15Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- plan traversal that crosses AQE stage boundaries ----

  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec        => Seq(q.plan)
    case r: ReusedExchangeExec    => Seq(r.child)
    case other                    => other.children
  }
  private def anyNode(p: SparkPlan)(f: SparkPlan => Boolean): Boolean =
    f(p) || kids(p).exists(anyNode(_)(f))
  private def isIdxScan(p: SparkPlan): Boolean = p match {
    case s: FileSourceScanExec =>
      s.relation.location.rootPaths.exists(_.toString.contains("graft_idx"))
    case _ => false
  }

  /** The order's plan gate: the staged index's scan appears, and the
    * JOIN-SIDE subtree feeding it contains NO Exchange (shuffle or
    * broadcast) — the index is read in place; only the batch side may
    * exchange. (Exchanges ABOVE the probe join — the final orderBy,
    * downstream aggs — are the query's own and irrelevant.) */
  private def assertIndexUnshuffled(df: DataFrame, name: String): Unit = {
    df.collect() // settle AQE so the final physical plan is inspected
    val plan = df.queryExecution.executedPlan
    assert(anyNode(plan)(isIdxScan), s"$name: no graft_idx scan in plan:\n$plan")
    // only the INNERMOST join above the index scan is the probe join —
    // downstream joins (the verdicts left-outer) legitimately exchange
    // their already-aggregated inputs
    var joinSidesChecked = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          Seq(j.left, j.right)
            .filter(s => anyNode(s)(isIdxScan) && !anyNode(s) {
              case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
              case _ => false
            })
            .foreach { side =>
              joinSidesChecked += 1
              assert(!anyNode(side) { case _: Exchange => true; case _ => false },
                s"$name: an Exchange sits between the probe join and the " +
                s"bucketed index scan:\n$plan")
            }
        case _ => ()
      }
      kids(p).foreach(walk)
    }
    walk(plan)
    assert(joinSidesChecked >= 1,
      s"$name: no join over the index scan found:\n$plan")
    assert(anyNode(plan) { case _: Exchange => true; case _ => false },
      s"$name: expected the batch side to exchange:\n$plan")
  }

  // ---- order 3: bucketed fingerprint / shingle index probes ----

  test("q75: bucketed fingerprint index probes with zero index-side exchange, values unchanged") {
    val df = CorpusQueries.incrementalDedup(spark, sf)
    assertIndexUnshuffled(df, "q75")
    // values equal the unstaged formulation (the r14 oracle shape)
    val d = Tables.load(spark, sf, "documents")
    val batch = d.where(pmod(col("doc_id"), lit(5L)) === 0L).select("doc_id", "text")
    val legacy = Dedup.incrementalNew(batch, "doc_id", "text",
        Dedup.fingerprints(d.where(pmod(col("doc_id"), lit(5L)) =!= 0L), "text"))
      .select("doc_id", "fingerprint").orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq == legacy)
  }

  test("q107: bucketed shingle index probes with zero index-side exchange, values unchanged") {
    val df = CorpusQueries.incrementalNearDedup(spark, sf)
    assertIndexUnshuffled(df, "q107")
    val docs = Tables.load(spark, sf, "documents")
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val legacy = NearDup.incrementalDedupVerdicts(
        batch = docs.filter(srcNum >= 10), index = docs.filter(srcNum < 10),
        idCol = "doc_id", textCol = "text", n = 3, threshold = 0.5)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq == legacy)
  }

  test("DedupIndex stages once per (app, dir, kind) and records build cost") {
    val t1 = DedupIndex.index(spark, sf, "fp", Seq("fingerprint")) {
      sys.error("second call must not rebuild") }
    assert(t1.columns.toSeq == Seq("fingerprint"))
    assert(DedupIndex.stageSecs.keys.exists(_.startsWith("fp:")))
    assert(DedupIndex.stageSecs.keys.exists(_.startsWith("sh:")))
  }

  // ---- order 4 + ADVICE: PrefixSum guards ----

  test("PrefixSum refuses an output-name collision loudly") {
    val df = Seq(("a", 1L, 2L)).toDF("g", "o", "cum")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(df, Seq("g"), Seq(col("o")), "o", "cum")
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("PrefixSum refuses float/double group keys (±0.0 sort-vs-equals fork)") {
    val df = Seq((0.0, 1L), (-0.0, 2L)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(df, Seq("g"), Seq(col("v")), "v")
    }
    assert(e.getMessage.contains("non-floating"))
  }

  test("PrefixSum refuses a high-cardinality group key at the bound") {
    // 500 distinct groups, bound 150: whichever arm fires first (the
    // executor-side per-partition check if AQE coalesced the sort to
    // one partition, else the driver-side global require), the
    // operator must refuse loudly instead of broadcasting 500 offsets
    val df = (1L to 500L).map(i => (i, 1L)).toDF("g", "v")
    val e = intercept[Exception] {
      PrefixSum.groupedRunningSum(df, Seq("g"), Seq(col("v")), "v",
        cumName = "cum", maxEntries = 150)
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("maxEntries") ||
      msgs(e).contains("group runs in one partition"), msgs(e))
  }

  test("PrefixSum per-partition arm fails in the task, before the collect") {
    // bound 2 with 500 groups: every partition exceeds the bound locally,
    // so the refusal comes from the executor (wrapped in SparkException)
    val df = (1L to 500L).map(i => (i, 1L)).toDF("g", "v")
    val e = intercept[org.apache.spark.SparkException] {
      PrefixSum.groupedRunningSum(df, Seq("g"), Seq(col("v")), "v",
        cumName = "cum", maxEntries = 2)
    }
    assert(e.getMessage.contains("group runs in one partition") ||
      Option(e.getCause).exists(_.getMessage.contains("group runs in one partition")))
  }

  test("PrefixSum under the bound is unchanged by the guard") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 7L), ("b", 3L, 1L))
      .toDF("g", "o", "v")
    val got = PrefixSum.groupedRunningSum(df, Seq("g"), Seq(col("o")), "v",
        cumName = "cum", maxEntries = 50)
      .orderBy("o").select("cum").as[Long].collect().toSeq
    assert(got == Seq(5L, 12L, 1L))
  }

  // ---- ADVICE: Skyline anti-chain early break ----

  test("Skyline breaks the tree-merge when a level stops shrinking (true anti-chain)") {
    // x and y both increase: no row dominates another — all 100 rows are
    // the frontier, and no amount of fan-in can shrink it. The loop must
    // break after ONE non-shrinking level instead of halving partitions
    // all the way to 1.
    val rows = (1 to 100).map(i => (i.toDouble, i.toDouble))
    val df = rows.toDF("x", "y").repartition(4)
    val (frontier, levels) = Skyline.paretoFrontierStats(
      df, "x", "y", mergeBound = 10L, fanIn = 2)
    assert(levels == 1, s"expected one (non-shrinking) level, got $levels")
    assert(frontier.count() == 100L)
    val got = frontier.select("x", "y").as[(Double, Double)].collect().toSet
    assert(got == rows.map { case (a, b) => (a, b) }.toSet)
  }

  // ---- orders 5/6 + ADVICE: CSV faces ----

  test("inferCsvNormalized types a numeric column carrying the lowercase null token") {
    val dir = java.nio.file.Files.createTempDirectory("graft-r15-nullinf")
    java.nio.file.Files.writeString(dir.resolve("part.csv"),
      "id,amount,note\n1,10,null\n2,null,ok\n3,NULL,x\n")
    val df = Sinks.inferCsvNormalized(spark, dir.toString)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    // with single-token inference 'null' degrades amount to string; the
    // normalized pass must keep it integral and null BOTH tokens
    assert(Set("integer", "long").contains(types("amount")),
      s"amount inferred as ${types("amount")}")
    val rows = df.orderBy("id").collect()
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
    assert(rows(0).isNullAt(2), "string 'null' token must read as NULL")
  }

  test("csv rename drift: without the map the merged read forks the column (counterexample)") {
    val corpus = SchemaDrift.stageOrdersCsvRenameDrift(spark, sf)
    val forked = SchemaDrift.readCsvMerged(spark, corpus)
    // rename is indistinguishable from drop+add: BOTH names appear,
    // each null on the other epoch's rows — the unsafe read q228 exists
    // to prevent
    assert(forked.columns.contains("o_totalprice"))
    assert(forked.columns.contains("total_price"))
    val n = forked.count()
    assert(forked.filter(col("o_totalprice").isNull).count() > 0)
    assert(forked.filter(col("total_price").isNull).count() > 0)

    val merged = SchemaDrift.readCsvMerged(spark, corpus,
      renames = Map("total_price" -> "o_totalprice"))
    assert(!merged.columns.contains("total_price"))
    assert(merged.filter(col("o_totalprice").isNull).count() == 0)
    assert(merged.count() == n)
  }

  test("q228 census: rename unified, zero null prices, epoch-exact cents") {
    val rows = StarQueries.q228CsvRenameDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum == 0L, "n_null_price must be 0 everywhere")
    // census totals replay the flat table's epoch-aware values
    val o = Tables.load(spark, sf, "orders")
    val wantN = o.count()
    assert(rows.map(_.getLong(1)).sum == wantN)
    val wantCents = o.select(sum(round(
      when(pmod(col("o_orderkey"), lit(2)) === 0,
        round(col("o_totalprice")).cast("long").cast("double"))
        .otherwise(col("o_totalprice")) * 100).cast("long")))
      .as[Long].head()
    assert(rows.map(_.getLong(3)).sum == wantCents)
  }

  // ---- order 5: gridded-percentile degenerate-domain contract ----

  test("percentile grid family stays exact on a single-bucket (constant) domain") {
    // every value identical: the whole key collapses into ONE grid cell
    // (the documented O(n_key)-in-one-task bound); results must stay
    // exact — the interpolated percentile of a constant IS the constant
    val const = Seq.fill(400)(("k", 42.0)).toDF("key", "v")
    val ps = Seq("p50" -> 0.5, "p95" -> 0.95)
    val got = graft.operators.Percentiles.exact(const, "key", "v", ps,
      numBuckets = 64).collect()
    assert(got.length == 1)
    assert(got(0).getDouble(1) == 42.0 && got(0).getDouble(2) == 42.0)
    // and the count-compressed route (the mitigation the scaladoc
    // points degenerate domains to) agrees, from ONE row per key
    val compressed = const.groupBy("key", "v").agg(count(lit(1)).as("c"))
    val w = graft.operators.Percentiles.exactWeighted(
      compressed, "key", "v", "c", ps).collect()
    assert(w.length == 1)
    assert(w(0).getDouble(1) == 42.0 && w(0).getDouble(2) == 42.0)
  }

  // ---- X228 (session 2): incremental index maintenance ----

  test("q229: maintained (appended) index probes exchange-free, values == rebuilt index") {
    val df = CorpusQueries.indexMaintenance(spark, sf)
    assertIndexUnshuffled(df, "q229")
    // equality with a from-scratch rebuild over history ∪ batch 1 —
    // in-place maintenance must be invisible to query semantics
    val d = Tables.load(spark, sf, "documents")
    val m = pmod(col("doc_id"), lit(5L))
    val rebuilt = Dedup.incrementalNew(
        d.where(m === 0L).select("doc_id", "text"), "doc_id", "text",
        Dedup.fingerprints(d.where(m >= 1L), "text"))
      .select("doc_id", "fingerprint").orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq == rebuilt)
  }

  test("appendOnce appended exactly once (no duplicate growth across re-runs)") {
    // a second maintenance pass must NOT re-append: index row count ==
    // distinct fingerprints of history ∪ batch 1, exactly
    CorpusQueries.indexMaintenance(spark, sf).collect()
    CorpusQueries.indexMaintenance(spark, sf).collect()
    val idx = DedupIndex.index(spark, sf, "fpm", Seq("fingerprint")) {
      sys.error("fpm must already be staged") }
    val d = Tables.load(spark, sf, "documents")
    val expected = d.where(pmod(col("doc_id"), lit(5L)) >= 1L)
      .select(md5(col("text"))).distinct().count()
    assert(idx.count() == expected,
      "appended index must hold history ∪ batch-1 fingerprints exactly once")
    assert(DedupIndex.stageSecs.keys.exists(_.startsWith("fpm.append:")),
      "append cost must surface in stageSecs for the bench artifact")
  }

  test("appendOnce refuses an unstaged index loudly") {
    val e = intercept[IllegalArgumentException] {
      DedupIndex.appendOnce(spark, sf, "nostage", Seq("fingerprint")) {
        spark.range(1).selectExpr("cast(id as string) as fingerprint") }
    }
    assert(e.getMessage.contains("not staged"))
  }

  /** Whether a SortExec sits between the innermost probe join and the
    * bucketed index scan on the INDEX side — present after an append
    * (multiple files per bucket forfeit the scan's declared ordering),
    * gone after compaction (one sorted file per bucket restores it). */
  private def indexSideSorted(df: DataFrame): Boolean = {
    df.collect()
    var sorted = false
    def walk(p: SparkPlan): Unit = {
      p match {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          Seq(j.left, j.right)
            .filter(s => anyNode(s)(isIdxScan) && !anyNode(s) {
              case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
              case _ => false })
            .foreach { side =>
              if (anyNode(side) {
                case _: org.apache.spark.sql.execution.SortExec => true
                case _ => false }) sorted = true }
        case _ => ()
      }
      kids(p).foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    sorted
  }

  test("compact: one file per bucket, probe values and exchange-free plan unchanged") {
    CorpusQueries.indexMaintenance(spark, sf).collect() // staged + appended
    val before = DedupIndex.index(spark, sf, "fpm", Seq("fingerprint")) {
      sys.error("fpm must already be staged") }
    val (nBefore, filesBefore) = (before.count(), before.inputFiles.length)
    // post-append, pre-compact: the SMJ probe must LOCALLY sort the
    // index side (multiple files per bucket — the documented trade)
    assert(indexSideSorted(CorpusQueries.indexMaintenance(spark, sf)),
      "expected an index-side local Sort on the appended (multi-file) table")
    val compacted = DedupIndex.compact(spark, sf, "fpm", Seq("fingerprint"))
    assert(compacted.count() == nBefore, "compaction must not change content")
    val filesAfter = compacted.inputFiles.length
    assert(filesAfter <= DedupIndex.NumBuckets,
      s"compacted table must hold <= one file per bucket, got $filesAfter")
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    // the q229 probe now reads the compacted snapshot transparently:
    // same values, still zero index-side exchange
    val df = CorpusQueries.indexMaintenance(spark, sf)
    assertIndexUnshuffled(df, "q229-compacted")
    // the per-bucket FILE sort is restored, but the planner only
    // trusts it (and elides the SMJ's index-side Sort) under the
    // listing-based legacy conf — Spark stopped reporting bucketed
    // scan output ordering by default because proving one-file-per-
    // bucket requires a planning-time file listing (SPARK-32859).
    // Pin BOTH behaviors: default keeps the local Sort; with the conf
    // on, the compacted (single-sorted-file-per-bucket) table elides it
    assert(indexSideSorted(df),
      "default planner must still sort (no declared scan ordering)")
    val orderingKey = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(orderingKey, "true")
    try assert(!indexSideSorted(CorpusQueries.indexMaintenance(spark, sf)),
      "with listing-based scan ordering on, the compacted table's " +
      "per-bucket sort must elide the SMJ index-side Sort")
    finally spark.conf.unset(orderingKey)
    val d = Tables.load(spark, sf, "documents")
    val m = pmod(col("doc_id"), lit(5L))
    val rebuilt = Dedup.incrementalNew(
        d.where(m === 0L).select("doc_id", "text"), "doc_id", "text",
        Dedup.fingerprints(d.where(m >= 1L), "text"))
      .select("doc_id", "fingerprint").orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(df.collect().map(_.toString).toSeq == rebuilt)
  }
}
