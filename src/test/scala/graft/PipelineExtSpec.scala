package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomPrune, ChunkDedup, Temporal}

/** Specs for the round-4 pipeline extensions (SURVEY §2.11b X48–X51):
  * chunk-level dedup, SCD2 intervals, token-budget quota, bloom-pruned
  * semi join. Each oracle-gated query has its hand-built semantic twin
  * here; plan-shape asserts pin the scale-relevant physical properties. */
class PipelineExtSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---------- ChunkDedup (X48) ----------

  private def chunkFixture = Seq(
    (0L, "a b c d"),   // keeper of "a b" and "c d"
    (1L, "a b x y"),   // loses chunk 0, keeps "x y"
    (2L, "a b"),       // loses its only chunk -> NULL text
    (3L, "p q p q")    // within-doc duplicate: second "p q" dropped
  ).toDF("doc_id", "text")

  test("chunk dedup: corpus-wide keep-first, reassembly, NULL when empty") {
    val out = ChunkDedup.dedupChunks(chunkFixture, "doc_id", "text", size = 2)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 2L), (1L, 2L, 1L), (2L, 1L, 0L), (3L, 2L, 1L)))
    assert(out.map(_.getString(3)).toSeq ===
      Seq("a b c d", "x y", null, "p q"))
  }

  test("chunk dedup: surviving chunks rejoin in original order") {
    val df = Seq(
      (0L, "k k"),            // claims "k k"
      (1L, "k k m m z z")     // loses chunk 0, keeps chunks 1 and 2 in order
    ).toDF("doc_id", "text")
    val out = ChunkDedup.dedupChunks(df, "doc_id", "text", size = 2)
      .orderBy("doc_id").collect()
    assert(out(1).getString(3) === "m m z z")
  }

  test("chunk dedup: ragged tail chunk is its own unit") {
    val df = Seq((0L, "a b c"), (1L, "c")).toDF("doc_id", "text")
    // size=2 -> doc0 chunks ["a b", "c"]; doc1 chunk ["c"] collides with
    // doc0's tail and is dropped
    val out = ChunkDedup.dedupChunks(df, "doc_id", "text", size = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getString(3) === "a b c")
    assert(out(1).getString(3) === null && out(1).getLong(2) === 0L)
  }

  test("chunk dedup plan: aggregate + equi join, no nested-loop pair scan") {
    val plan = ChunkDedup.dedupChunks(chunkFixture, "doc_id", "text", size = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("boilerplate report finds cross-document repeated chunks") {
    val out = ChunkDedup.boilerplate(chunkFixture, "doc_id", "text",
      size = 2, minDocs = 2).collect()
    assert(out.map(_.getString(0)).toSet === Set("a b"))
    assert(out.head.getAs[Long]("n_docs") === 3L)
    assert(out.head.getAs[Long]("first_id") === 0L)
  }

  // ---------- Temporal (X49) ----------

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def changeLog = Seq(
    (1L, "A", ts(10), 100L),
    (1L, "A", ts(20), 101L), // no change -> collapsed
    (1L, "B", ts(30), 102L),
    (1L, "B", ts(40), 103L),
    (1L, "A", ts(50), 104L), // back to A: NEW interval, not merged
    (2L, "X", ts(15), 200L)
  ).toDF("user_id", "event_type", "ts", "event_id")

  test("scd2: consecutive equal states collapse, intervals chain, open end") {
    val out = Temporal.scd2(changeLog, "user_id", "event_type", "ts",
      tieCols = Seq("event_id")).orderBy("user_id", "version").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(r => (r.getString(1), r.getTimestamp(2),
      Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5))).toSeq === Seq(
      ("A", ts(10), Some(ts(30)), 1L, false),
      ("B", ts(30), Some(ts(50)), 2L, false),
      ("A", ts(50), None, 3L, true)))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2.head.getBoolean(5))
  }

  test("scd2: equal-timestamp rows resolved by the tiebreak column") {
    val df = Seq(
      (1L, "A", ts(10), 2L), // same ts: event_id orders A before B
      (1L, "B", ts(10), 5L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Temporal.scd2(df, "user_id", "event_type", "ts", Seq("event_id"))
      .orderBy("version").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("A", "B"))
    assert(out(0).getTimestamp(3) === ts(10)) // A's interval closed at B's ts
  }

  test("scd2 on events: intervals chain per user, exactly one open each") {
    val out = Temporal.scd2(
      Tables.load(spark, sf, "events").select("user_id", "event_type", "ts", "event_id"),
      "user_id", "event_type", "ts", Seq("event_id"))
    val perUser = out.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"),
        count(lit(1)).as("n"))
      .collect()
    assert(perUser.nonEmpty)
    assert(perUser.forall(_.getLong(1) == 1L), "exactly one open interval per user")
    // chaining: version v's valid_to equals version v+1's valid_from
    val rows = out.orderBy("user_id", "version").collect()
    rows.sliding(2).foreach {
      case Array(a, b) if a.getLong(0) == b.getLong(0) =>
        assert(a.getTimestamp(3) === b.getTimestamp(2))
      case _ => ()
    }
  }

  test("applyChanges: partial upserts, delete resets, per-column last write") {
    val log = Seq(
      // key 1: insert, partial update (name only), partial update (score only)
      (1L, 10L, false, Some("ann"), Some(1.0)),
      (1L, 11L, false, Some("anne"), None),
      (1L, 12L, false, None, Some(2.0)),
      // key 2: written, deleted, partially re-inserted — name must be NULL
      (2L, 20L, false, Some("bob"), Some(5.0)),
      (2L, 21L, true, None, None),
      (2L, 22L, false, None, Some(9.0)),
      // key 3: write then delete as the LAST op — key absent
      (3L, 30L, false, Some("cat"), Some(7.0)),
      (3L, 31L, true, None, None),
      // key 4: deletes only — key absent
      (4L, 40L, true, None, None)
    ).toDF("k", "seq", "is_del", "name", "score")
    val out = Temporal.applyChanges(log, "k", "seq",
        isDelete = col("is_del"), payload = Seq("name", "score"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getString(1) === "anne" && out(0).getDouble(2) === 2.0)
    assert(out(1).isNullAt(1), "pre-delete write must not survive the delete")
    assert(out(1).getDouble(2) === 9.0)
  }

  test("applyChanges: aggregation is layout-independent") {
    val log = Seq(
      (1L, 1L, false, Some("a"), Some(1.0)), (1L, 2L, true, None, None),
      (1L, 3L, false, Some("b"), None), (1L, 4L, false, None, Some(4.0))
    ).toDF("k", "seq", "is_del", "name", "score")
    def run(df: org.apache.spark.sql.DataFrame) =
      Temporal.applyChanges(df, "k", "seq", col("is_del"), Seq("name", "score"))
        .collect().map(_.toString).toSeq
    assert(run(log.repartition(7)) === run(log.coalesce(1)))
  }

  test("inverted index: postings-head pruning runs through native TopKPerKey") {
    org.apache.spark.sql.graftsql.installTopK(spark)
    val plan = graft.queries.CorpusQueries.invertedIndex(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"),
      s"postings head should be rewritten to the native top-k operator:\n$plan")
    assert(plan.contains("TopKPerKeyPartial"),
      "per-mapper prune missing: every stopword occurrence would reach the exchange")
  }

  test("latestSnapshot: last row per key under (ts, tie) order") {
    val out = Temporal.latestSnapshot(changeLog, "user_id", "ts", Seq("event_id"))
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq ===
      Seq((1L, "A", 104L), (2L, "X", 200L)))
  }

  // ---------- token budget (X50) ----------

  test("token budget query: kept set is the exact hash-order prefix per source") {
    val out = queries.CorpusQueries.tokenBudget(spark, sf).collect()
    // independent reimplementation: same md5-derived order, driver-side fold
    def h56(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 7), 16) << 28) +
        java.lang.Long.parseLong(hex.substring(7, 14), 16)
    }
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      val ordered = rows.sortBy { case (id, _, _) => (h56(id.toString), id) }
      var cum = 0L
      val kept = ordered.takeWhile { case (_, _, text) =>
        val n = text.split(" ", -1).length
        val admit = cum < 512L; if (admit) cum += n; admit
      }
      src -> (kept.length.toLong,
        kept.map(_._3.split(" ", -1).length.toLong).sum)
    }
    out.foreach { r =>
      val (nKept, tokKept) = expected(r.getString(0))
      assert(r.getLong(1) === nKept, s"n_docs_kept for ${r.getString(0)}")
      assert(r.getLong(2) === tokKept, s"tok_kept for ${r.getString(0)}")
    }
  }

  // ---------- BloomPrune (X51) ----------

  test("bloom-pruned semi join equals the plain semi join exactly") {
    val li = Tables.load(spark, sf, "lineitem")
    val expensive = Tables.load(spark, sf, "orders")
      .where(col("o_totalprice") > 200000.0).select("o_orderkey")
    val pruned = BloomPrune.semiJoin(li, "l_orderkey", expensive, "o_orderkey")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = li.join(expensive, li("l_orderkey") === expensive("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(plain.nonEmpty)
    assert(pruned === plain)
  }

  test("bloom prune sits in the probe-side filter of the plan") {
    val li = Tables.load(spark, sf, "lineitem")
    val expensive = Tables.load(spark, sf, "orders")
      .where(col("o_totalprice") > 200000.0).select("o_orderkey")
    val plan = BloomPrune.semiJoin(li, "l_orderkey", expensive, "o_orderkey")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("bloom prune with empty build side yields empty result, no crash") {
    val li = Tables.load(spark, sf, "lineitem")
    val none = Tables.load(spark, sf, "orders")
      .where(col("o_totalprice") < 0.0).select("o_orderkey")
    assert(BloomPrune.semiJoin(li, "l_orderkey", none, "o_orderkey").count() === 0L)
  }

  // ---------- PII redaction (X52) ----------

  private def redactOne(s: String): String =
    Seq((s, 0)).toDF("t", "i")
      .select(graft.functions.TextFunctions.redactPii(col("t")))
      .head().getString(0)

  test("redactPii: each pattern, fixed order, clean text untouched") {
    assert(redactOne("mail bob.smith+x@corp.example.com end") === "mail <EMAIL> end")
    assert(redactOne("host 10.0.255.7 up") === "host <IP> up")
    assert(redactOne("call 5551234567 now") === "call <NUM> now")
    // 4 digits is below the run threshold; dotted digits go to IP, not NUM
    assert(redactOne("year 2024 at 192.168.0.1") === "year 2024 at <IP>")
    // an email containing digit runs is ONE email tag, not nested tags
    assert(redactOne("a12345@b12345.org") === "<EMAIL>")
    assert(redactOne("plain words only") === "plain words only")
  }

  // ---------- weighted sampling (X53) ----------

  private def h56(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 7), 16) << 28) +
      java.lang.Long.parseLong(hex.substring(7, 14), 16)
  }

  test("weightedSample: weight>=cap is a sure keep, 0/null weight drops") {
    val df = Seq(
      (1L, 512L), (2L, 600L), // at/over cap
      (3L, 0L)                // zero weight
    ).toDF("id", "w").union(Seq((4L, Option.empty[Long])).toDF("id", "w"))
    val kept = operators.Sampling.weightedSample(df, "id", col("w"), cap = 512L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L))
  }

  test("weightedSample: kept set matches the integer threshold exactly") {
    val df = (0L until 200L).map(i => (i, i % 64L)).toDF("id", "w")
    val kept = operators.Sampling.weightedSample(df, "id", col("w"), cap = 64L)
      .select("id").collect().map(_.getLong(0)).toSet
    val unit = (1L << 56) / 64L
    val expected = (0L until 200L)
      .filter(i => h56(i.toString) < unit * math.min(i % 64L, 64L)).toSet
    assert(kept === expected)
    assert(kept.nonEmpty && kept.size < 200)
  }

  // ---------- Count-Min sketch (X54) ----------

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] = {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    df.agg(exprColumn(graft.functions.CountMinAgg(
        columnExpr(graft.functions.TextFunctions.md5Hash56(col("token"))))
      .toAggregateExpression()).as("sk"))
      .head().getSeq[Long](0).toArray
  }

  test("CMS: estimate >= exact for every token, bounded overcount") {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val n = toks.count()
    val sketch = toks.agg(
      exprColumn(graft.functions.CountMinAgg(
        columnExpr(graft.functions.TextFunctions.md5Hash56(col("token"))))
        .toAggregateExpression()).as("sk"))
    val est = exprColumn(graft.functions.CountMin.Estimate(
      columnExpr(col("sk")),
      columnExpr(graft.functions.TextFunctions.md5Hash56(col("token")))))
    val rows = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(sketch))
      .select(col("n_exact"), est.as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0), "CMS must never undercount")
      assert(r.getLong(1) <= r.getLong(0) + n / 64,
        s"overcount beyond loose bound: exact=${r.getLong(0)} est=${r.getLong(1)}")
    }
  }

  test("CMS: sketch is layout-independent (partial merges commute)") {
    val toks = Tables.load(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
    val a = sketchOf(toks.repartition(2))
    val b = sketchOf(toks.repartition(7))
    assert(a.toSeq === b.toSeq)
    assert(a.sum > 0)
  }

  // ---------- Z-order (X56) ----------

  test("zValue: exact Morton interleave on known bit patterns") {
    val rows = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 1L), (0L, 0L),
      (0x10000L, 0L)) // 17th bit masked off
      .toDF("a", "b")
      .select(graft.functions.ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(0x55555555L, 0xAAAAAAAAL, 7L, 0L, 0L))
  }

  /** Per-file (min,max) extents of `c` across the parquet files under dir. */
  private def fileExtents(dir: String, c: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      (r.getLong(0), r.getLong(1))
    }
  }

  test("writeZOrdered bounds BOTH dimensions per file; linear clustering only one") {
    // deterministic uniform 16-bit pairs: x a Weyl sequence, y the BIT
    // REVERSAL of x — any contiguous x interval contains all low-bit
    // residues, so y sweeps its full range inside every x cluster
    // (x and y genuinely unclusterable by a single sort key)
    val df = (0 until 4096).map { i =>
      val x = (i * 40503) & 0xFFFF
      val y = (Integer.reverse(x) >>> 16) & 0xFFFF
      (x.toLong, y.toLong)
    }.toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    graft.sources.Sinks.writeZOrdered(df, zDir, "x", "y", numFiles = 8)
    graft.sources.Sinks.writeClustered(df, linDir, Seq("x"), numFiles = 8)

    def meanWidth(ext: Seq[(Long, Long)]): Double =
      ext.map { case (lo, hi) => (hi - lo).toDouble }.sum / ext.size
    val global = 65535.0
    // z layout: BOTH x and y extents are materially narrower than global
    assert(meanWidth(fileExtents(zDir, "x")) < 0.7 * global)
    assert(meanWidth(fileExtents(zDir, "y")) < 0.7 * global)
    // linear-on-x layout: x razor sharp, y essentially unbounded per file
    assert(meanWidth(fileExtents(linDir, "x")) < 0.3 * global)
    assert(meanWidth(fileExtents(linDir, "y")) > 0.9 * global)
  }

  // ---------- funnel / retention (X58, X59) ----------

  test("funnel: steps must complete strictly in order") {
    val ev = Seq(
      // user 1: full funnel, but with an early click BEFORE the view that
      // must not count — t2 is the click AFTER t1
      (1L, "click", ts(5)), (1L, "view", ts(10)), (1L, "click", ts(20)),
      (1L, "purchase", ts(30)),
      // user 2: stalls after view (its only click precedes the view)
      (2L, "click", ts(8)), (2L, "view", ts(12)),
      // user 3: never views -> not in the funnel at all
      (3L, "purchase", ts(50))
    ).toDF("user_id", "event_type", "ts")
    val out = graft.operators.Funnel.funnel(ev, "user_id", "ts",
      steps = Seq(col("event_type") === "view", col("event_type") === "click",
        col("event_type") === "purchase"))
      .orderBy("user_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val u1 = out(0)
    assert(u1.getTimestamp(1) === ts(10) && u1.getTimestamp(2) === ts(20) &&
      u1.getTimestamp(3) === ts(30) && u1.getAs[Long]("steps_completed") === 3L)
    val u2 = out(1)
    assert(u2.getTimestamp(1) === ts(12) && u2.getTimestamp(2) === null &&
      u2.getAs[Long]("steps_completed") === 1L)
  }

  test("retention: cohort by first week, offsets count distinct actives") {
    def d(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, d("2024-01-01 10:00:00")), (1L, d("2024-01-08 10:00:00")), // w0, w1
      (2L, d("2024-01-02 10:00:00")),                                 // w0 only
      (3L, d("2024-01-10 10:00:00")), (3L, d("2024-01-24 10:00:00"))  // w1, w3
    ).toDF("user_id", "ts")
    val out = graft.operators.Funnel.retention(ev, "user_id", "ts",
        period = date_trunc("week", _))
      .orderBy("cohort", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 2L), // users 1,2 in the Jan-1 cohort week
      ("2024-01-01", 1L, 1L), // user 1 returns in week 1
      ("2024-01-08", 0L, 1L), // user 3's cohort
      ("2024-01-08", 2L, 1L)  // user 3 returns two weeks later
    ))
  }

  // ---------- incremental dedup (X57) ----------

  test("incrementalNew: batch keep-first, history anti join, fingerprints appended") {
    val history = Seq((100L, "seen before")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "fresh content"),
      (2L, "fresh content"),  // batch-internal dup of 1 -> dropped
      (3L, "seen before"),    // already in history -> dropped
      (4L, "also new")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.incrementalNew(batch, "doc_id", "text",
        graft.operators.Dedup.fingerprints(history, "text"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 4L))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("fresh content".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head.getAs[String]("fingerprint") === md)
  }

  // ---------- duplicate-span excision (X86) ----------

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def spanFixture = Seq(
    (0L, "a b c d e"),            // shares "a b" with the others
    (1L, "x y a b z"),            // same passage mid-document
    (2L, "a b q q q a b"),        // touching windows merge into ONE span
    (3L, "a b m1 m2 m3 m4 a b"),  // two SEPARATED dup spans, middle survives
    (4L, "short")                 // shorter than win -> untouched
  ).toDF("doc_id", "text")

  test("span excision: cross-doc flags, island merge, separated spans, short docs") {
    val out = ChunkDedup.exciseDupSpans(spanFixture, "doc_id", "text",
        win = 2, stride = 1, minCount = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(out.toSeq === Seq(
      (0L, 5L, 1L, 1L, 2L, md5hex("c d e")),
      (1L, 5L, 1L, 1L, 2L, md5hex("x y z")),
      (2L, 7L, 4L, 1L, 7L, md5hex("")),          // fully excised
      (3L, 8L, 2L, 2L, 4L, md5hex("m1 m2 m3 m4")),
      (4L, 1L, 0L, 0L, 0L, md5hex("short"))))
  }

  test("exact substring dedup: keep-first over a 10-token dup the 20-window variant misses") {
    // one 10-token passage duplicated across two docs, unique elsewhere
    val span = (1 to 10).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      (0L, s"u1 u2 $span u3 u4"),
      (1L, s"v1 v2 v3 $span v4"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14")
    ).toDF("doc_id", "text")
    // the round-6 operator at its q102 geometry is blind to it
    val old = ChunkDedup.exciseDupSpans(docs, "doc_id", "text",
        win = 20, stride = 10, minCount = 2)
      .orderBy("doc_id").collect()
    assert(old.forall(_.getAs[Long]("n_removed") == 0L),
      "fixed 20-token windows must miss the 10-token duplicate (the documented gap)")
    // the exact operator excises the SECOND occurrence only (keep-first)
    val exact = ChunkDedup.exciseDupSpansExact(docs, "doc_id", "text", minLen = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_fp")))
    assert(exact.toSeq === Seq(
      (0L, 0L, 0L, md5hex(s"u1 u2 $span u3 u4")), // first occurrence intact
      (1L, 1L, 10L, md5hex("v1 v2 v3 v4")),       // second excised whole
      (2L, 0L, 0L, md5hex("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14"))))
  }

  test("exact substring dedup: layout-independent") {
    val span = (1 to 9).map(i => s"s$i").mkString(" ")
    val docs = Seq((0L, s"a $span b"), (1L, s"c d $span"), (2L, s"e $span f g"))
      .toDF("doc_id", "text")
    val a = ChunkDedup.exciseDupSpansExact(docs, "doc_id", "text", 8)
      .orderBy("doc_id").collect().toSeq
    val b = ChunkDedup.exciseDupSpansExact(docs.repartition(7), "doc_id", "text", 8)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // keep-first: doc 0 keeps the span, docs 1 and 2 lose it
    assert(a.map(_.getAs[Long]("n_removed")).sum == 18L)
  }

  test("span excision: layout-independent (result survives repartitioning)") {
    val a = ChunkDedup.exciseDupSpans(spanFixture, "doc_id", "text", 2, 1, 2)
      .orderBy("doc_id").collect().toSeq
    val b = ChunkDedup.exciseDupSpans(spanFixture.repartition(7), "doc_id", "text", 2, 1, 2)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  // ---------- BPE tokenizer training (X87) ----------

  test("BPE training matches the hand-computed merge sequence") {
    val docs = Seq("the cat sat on the mat", "the cats eat the fish",
      "a cat and a mat", "fish eat the cat").toDF("text")
    val (merges, words) = graft.operators.BpeTrain.train(docs, "text", rounds = 5)
    assert(merges.map(m => (m.round, m.left, m.right, m.weight)) === Seq(
      (1, "a", "t", 9L),   // a+t in cat/sat/mat/cats/eat, weighted by wordcount
      (2, "h", "e", 5L),
      (3, "t", "he", 5L),
      (4, "c", "at", 4L),
      (5, "e", "at", 2L)))
    val vocab = words.select(explode(col("syms")).as("s"), col("wc"))
      .groupBy("s").agg(sum("wc").as("f")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab("the") === 5L && vocab("cat") === 4L && vocab("eat") === 2L)
  }

  test("byte-level BPE: UTF-8 byte atoms, multibyte code points merge like any pair") {
    // "héllo" is 6 UTF-8 bytes (é = C3 A9): the byte alphabet must see
    // 6 atoms where the char variant sees 5, and the first merge on
    // this corpus is the é byte pair itself (most frequent adjacency)
    val docs = Seq("héllo héllo héllo", "hello héllo").toDF("text")
    val (merges, words) = graft.operators.BpeTrain.trainBytes(docs, "text", rounds = 4)
    // every atom/merged symbol is an even-length uppercase hex string
    val syms = words.select(explode(col("syms")).as("s")).collect()
      .map(_.getString(0))
    assert(syms.forall(s => s.length % 2 == 0 && s.matches("[0-9A-F]+")))
    // hand-replayed rounds: héllo = 68 C3 A9 6C 6C 6F (wc 4),
    // hello = 68 65 6C 6C 6F (wc 1) →
    //   r1 (6C,6C) n=5; r2 (6C6C,6F) n=5; r3 (68,C3) n=4;
    //   r4 fuses é's SECOND byte onto the h+C3 symbol: (68C3,A9) n=4
    assert(merges.map(m => (m.round, m.left, m.right, m.weight)) === Seq(
      (1, "6C", "6C", 5L), (2, "6C6C", "6F", 5L),
      (3, "68", "C3", 4L), (4, "68C3", "A9", 4L)))
    // the trained types reassemble to the words' exact hex
    val joined = words.select(array_join(col("syms"), "").as("h")).collect()
      .map(_.getString(0)).toSet
    assert(joined.contains("68C3A96C6C6F")) // hex(héllo)
    assert(joined.contains("68656C6C6F"))   // hex(hello)
  }

  test("byte-level BPE equals char-level on a pure-ASCII corpus (modulo hex naming)") {
    val docs = Seq("the cat sat on the mat", "the cats eat the fish").toDF("text")
    val charM = graft.operators.BpeTrain.train(docs, "text", 3)._1
    val byteM = graft.operators.BpeTrain.trainBytes(docs, "text", 3)._1
    def hex(s: String) = s.getBytes("UTF-8").map("%02X".format(_)).mkString
    assert(byteM.map(m => (m.round, m.left, m.right, m.weight)) ===
      charM.map(m => (m.round, hex(m.left), hex(m.right), m.weight)))
  }

  test("BPE training is layout-independent") {
    val docs = Seq("aa ab aa ba", "ab aa bb aa").toDF("text")
    val a = graft.operators.BpeTrain.train(docs, "text", 3)._1
    val b = graft.operators.BpeTrain.train(docs.repartition(5), "text", 3)._1
    assert(a === b)
  }

  test("BPE tokenize: subword counts shrink with merges, never below 1 per word") {
    val docs = Seq((0L, "the cat sat"), (1L, "the the fish")).toDF("doc_id", "text")
    val (_, words) = graft.operators.BpeTrain.train(docs, "text", 5)
    val lut = words.select(array_join(col("syms"), "").as("word"),
      org.apache.spark.sql.functions.size(col("syms")).cast("long").as("n_sub"))
    val out = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(lut, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
      .orderBy("doc_id").collect()
    val (w0, s0) = (out(0).getLong(1), out(0).getLong(2))
    val (w1, s1) = (out(1).getLong(1), out(1).getLong(2))
    assert(w0 === 3L && w1 === 3L)
    // every word tokenizes to at least 1 and at most len(word) subwords
    assert(s0 >= w0 && s0 <= "thecatsat".length)
    assert(s1 >= w1 && s1 <= "thethefish".length)
    // "the" occurs 3x corpus-wide so (t,h)/(h,e) merges fire: strictly
    // fewer subwords than characters
    assert(s1 < "thethefish".length)
  }

  test("BPE training stops early when every word is one symbol") {
    val docs = Seq("ab ab cd").toDF("text")
    // round 1 merges (a,b) or (c,d)... after at most 2 rounds nothing pairs
    val (merges, words) = graft.operators.BpeTrain.train(docs, "text", 10)
    assert(merges.size === 2)
    assert(merges.map(m => (m.left, m.right)).toSet === Set("a" -> "b", "c" -> "d"))
    val syms = words.select(col("syms")).collect().map(_.getSeq[String](0))
    assert(syms.forall(_.size == 1))
  }

  test("span excision: stride wider than 1 leaves unflagged grid positions alone") {
    // win=2 stride=2: only even starts fingerprint; "b c" never becomes a
    // window, so the shared bigram at an odd offset is NOT excised
    val df = Seq((0L, "a b c d"), (1L, "z b c w")).toDF("doc_id", "text")
    val out = ChunkDedup.exciseDupSpans(df, "doc_id", "text", 2, 2, 2)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(4) == 0L)) // nothing removed
  }
}
