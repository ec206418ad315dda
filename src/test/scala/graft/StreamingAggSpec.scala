package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize
import graft.streaming.EventStreams
import graft.streaming.EventStreams.EventRow

/** Watermark/window/custom-state streaming semantics over MemoryStream. */
class StreamingAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long, typ: String = "click",
      v: Double = 1.0): EventRow = EventRow(id, ts(t), user, typ, v)

  test("q120 composition: file-stream ingest gate equals the batch q107 table") {
    // the full driver-gated composition — file stream in, foreachBatch
    // verdicts, parquet sink out — must reproduce the batch twin exactly
    val streamed = graft.queries.CorpusQueries.streamingNearDedup(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = graft.queries.CorpusQueries.incrementalNearDedup(spark, sf)
      .collect().map(_.toString).toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming ingest near-dup: per-micro-batch verdicts equal the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, sf, "documents")
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val index = docs.filter(srcNum < 10).select("doc_id", "text")
    val batch1 = docs.filter(srcNum >= 10 && col("doc_id") % 2 === 0)
      .select("doc_id", "text")
    val batch2 = docs.filter(srcNum >= 10 && col("doc_id") % 2 === 1)
      .select("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[String]]
    // ONE checkpoint across restarts: the second AvailableNow run must
    // resume past batch1, not replay it
    val ckpt = java.nio.file.Files.createTempDirectory("neardup-ingest").toString
    def run(): Unit = {
      val q = graft.streaming.CorpusStreams.nearDupIngest(
        in.toDF().toDF("doc_id", "text"), index, "doc_id", "text") {
        (verdicts, id) =>
          got(id) = verdicts.orderBy("doc_id").collect().map(_.toString).toSeq
      }.option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    in.addData(batch1.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    run()
    in.addData(batch2.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
    run()
    assert(got.size == 2, s"expected 2 micro-batches, got ${got.keySet}")
    def expect(b: org.apache.spark.sql.DataFrame): Seq[String] =
      graft.operators.NearDup.incrementalDedupVerdicts(
        b, index, "doc_id", "text", n = 3, threshold = 0.5)
        .orderBy("doc_id").collect().map(_.toString).toSeq
    val batches = got.toSeq.sortBy(_._1).map(_._2)
    assert(batches(0) == expect(batch1))
    assert(batches(1) == expect(batch2))
    assert(batches.flatten.exists(_.contains("true")),
      "fixture should produce at least one dup verdict")
  }

  test("streaming decayed counts: merged state equals batch over any boundary") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("ts"))
    val all = events.collect().map(r => (r.getString(0), r.getTimestamp(1)))
    val (b1, b2) = all.splitAt(all.length / 3) // deliberately uneven
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val ckpt = java.nio.file.Files.createTempDirectory("decay-ingest").toString
    val state = java.nio.file.Files.createTempDirectory("decay-state").toString
    def run(): Unit = {
      val q = graft.streaming.CorpusStreams.decayedIngest(
        in.toDF().toDF("event_type", "ts"), "event_type", "ts",
        halfLifeDays = 7, stateDir = state) { (scores, id) =>
        got(id) = scores.orderBy("event_type").collect().map(_.toString).toSeq
      }.option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    in.addData(b1.toSeq); run()
    in.addData(b2.toSeq); run()
    assert(got.size == 2)
    // after the last batch the maintained state yields EXACTLY the batch
    // operator's answer over the full history — no rescan happened
    val expectAll = graft.operators.Decay
      .decayedCounts(events, "event_type", "ts", halfLifeDays = 7)
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(got(1L) == expectAll)
    // and the intermediate result equals batch over the prefix
    val prefix = graft.operators.Decay.decayedCounts(
        spark.createDataFrame(b1.toSeq.toDF("event_type", "ts").rdd,
          b1.toSeq.toDF("event_type", "ts").schema),
        "event_type", "ts", halfLifeDays = 7)
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(got(0L) == prefix)
    // re-running batch 1's merge from the same predecessor is
    // idempotent: state v=1 recomputed equals itself (versioned state)
    val v1 = spark.read.parquet(s"$state/v=1")
      .orderBy("__k", "__d").collect().map(_.toString).toSeq
    assert(v1.nonEmpty)
  }

  test("streaming heavy hitters: O(k) state keeps the n/k superset guarantee across boundaries") {
    implicit val sqlCtx = spark.sqlContext
    // 2 true heavies in a 300-type tail; vocab >> k=8 forces eviction
    val all = (Seq.fill(400)("heavy_a") ++ Seq.fill(300)("heavy_b") ++
      (0 until 300).map(i => s"tail_$i")).sorted // adversarial: tail interleaved
    val in = MemoryStream[String]
    val got = scala.collection.mutable.Map.empty[Long, Map[String, (Long, Long)]]
    val ckpt = java.nio.file.Files.createTempDirectory("hh-ingest").toString
    val state = java.nio.file.Files.createTempDirectory("hh-state").toString
    def run(): Unit = {
      val q = graft.streaming.CorpusStreams.heavyHitterIngest(
        in.toDF().toDF("item"), "item", k = 8, stateDir = state) { (cand, id) =>
        got(id) = cand.collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      }.option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    val (b1, rest) = all.splitAt(all.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    in.addData(b1); run(); in.addData(b2); run(); in.addData(b3); run()
    assert(got.size == 3)
    val fin = got(2L)
    // state is O(k): ≤ 8 candidates, n equals the full stream length
    assert(fin.size <= 8 && fin.values.forall(_._2 == all.length.toLong))
    // superset guarantee: every exact heavy (> n/k) is present, and its
    // counter is within n/k below the exact count
    val exact = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val thresh = all.length.toLong / 8
    exact.filter(_._2 > thresh).foreach { case (item, c) =>
      assert(fin.contains(item), s"heavy $item missing from $fin")
      val lower = fin(item)._1
      assert(lower <= c && c - lower <= thresh, s"$item: lower=$lower exact=$c")
    }
  }

  test("streaming anomaly scores: merged day-count state equals batch over any boundary") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("ts"))
    val all = events.collect().map(r => (r.getString(0), r.getTimestamp(1)))
    val (b1, b2) = all.splitAt(2 * all.length / 5)
    val in = MemoryStream[(String, java.sql.Timestamp)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val ckpt = java.nio.file.Files.createTempDirectory("anom-ingest").toString
    val state = java.nio.file.Files.createTempDirectory("anom-state").toString
    def run(): Unit = {
      val q = graft.streaming.CorpusStreams.anomalyIngest(
        in.toDF().toDF("event_type", "ts"), "event_type", "ts", state) { (z, id) =>
        got(id) = z.orderBy("event_type", "day").collect().map(_.toString).toSeq
      }.option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    in.addData(b1.toSeq); run(); in.addData(b2.toSeq); run()
    val expectAll = graft.operators.Anomaly
      .trailingZScores(events, "event_type", "ts")
      .orderBy("event_type", "day").collect().map(_.toString).toSeq
    assert(got(1L) == expectAll)
    assert(got(0L) != expectAll, "prefix state should differ from full history")
  }

  test("streaming sliding distinct: merged daily sketches equal batch over any boundary") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"))
    val all = events.collect().map(r => (r.getLong(0), r.getTimestamp(1)))
    val (b1, b2) = all.splitAt(all.length / 4)
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val got = scala.collection.mutable.Map.empty[Long, Seq[String]]
    val ckpt = java.nio.file.Files.createTempDirectory("skd-ingest").toString
    val state = java.nio.file.Files.createTempDirectory("skd-state").toString
    def run(): Unit = {
      val q = graft.streaming.CorpusStreams.slidingDistinctIngest(
        in.toDF().toDF("user_id", "ts"), "user_id", "ts",
        k = 256, windowDays = 7, stateDir = state) { (d, id) =>
        got(id) = d.orderBy("day").collect().map(_.toString).toSeq
      }.option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    in.addData(b1.toSeq); run(); in.addData(b2.toSeq); run()
    val expectAll = graft.operators.Sketches
      .kmvSlidingDailyDistinct(events, "user_id", "ts", k = 256, windowDays = 7)
      .orderBy("day").collect().map(_.toString).toSeq
    assert(got(1L) == expectAll)
  }

  test("late-arriving dimension: parked facts resolve when the dim lands, nothing drops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("latedim-dim").toString
    val state = java.nio.file.Files.createTempDirectory("latedim-park").toString
    val ckpt = java.nio.file.Files.createTempDirectory("latedim-ck").toString
    // dim v1: only key a
    Seq(("a", "Alpha")).toDF("k", "dim_name")
      .write.mode("overwrite").parquet(dimDir)
    val in = MemoryStream[(String, Long)]
    val got = scala.collection.mutable.Map.empty[Long, Set[(String, Long, String)]]
    def run(): Unit = {
      val q = graft.streaming.CorpusStreams.lateDimIngest(
        in.toDF().toDF("k", "amount"), dimDir, "k", state) { (res, id) =>
        got(id) = res.collect().map(r => (r.getString(0), r.getLong(1),
          r.getString(2))).toSet
      }.option("checkpointLocation", ckpt).start()
      q.awaitTermination()
    }
    in.addData(("a", 1L), ("b", 2L)); run()
    assert(got(0L) == Set(("a", 1L, "Alpha")), s"got ${got(0L)}")
    // the b fact is parked, not dropped or null-joined
    val park0 = spark.read.parquet(s"$state/v=0")
      .collect().map(_.getString(0)).toSet
    assert(park0 == Set("b"))
    // dim catches up; next batch brings a new unresolved key c
    Seq(("a", "Alpha"), ("b", "Beta")).toDF("k", "dim_name")
      .write.mode("overwrite").parquet(dimDir)
    in.addData(("c", 3L)); run()
    assert(got(1L) == Set(("b", 2L, "Beta")),
      "the parked fact must resolve against the late dimension")
    val park1 = spark.read.parquet(s"$state/v=1")
      .collect().map(_.getString(0)).toSet
    assert(park1 == Set("c"))
  }

  test("watermarked sliding-window counts finalize once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val out = EventStreams.windowedCounts(in.toDF(),
      watermarkDelay = "10 minutes", windowLen = "1 hour", slide = "30 minutes")
    val q = out.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()

    in.addData(ev(1, "2024-01-01 10:05:00", 1), ev(2, "2024-01-01 10:20:00", 2))
    q.processAllAvailable()
    // append mode: nothing final yet (watermark still before window ends)
    assert(spark.table("win_counts").count() == 0)

    // an event far past the windows advances the watermark and flushes them
    in.addData(ev(3, "2024-01-01 13:00:00", 1))
    q.processAllAvailable()
    in.addData(ev(4, "2024-01-01 15:00:00", 1))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select("window_start", "n").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    q.stop()
    // events at 10:05 and 10:20 fall in sliding windows [09:30,10:30) and [10:00,11:00)
    assert(rows("2024-01-01 09:30:00.0") == 2)
    assert(rows("2024-01-01 10:00:00.0") == 2)
  }

  test("flatMapGroupsWithState sessionize emits closed sessions matching batch gaps-and-islands") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val out = EventStreams.sessionize(in.toDS(), gapSeconds = 300,
      watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()

    // user 1: two sessions; user 2: one session
    in.addData(
      ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:02:00", 1),
      ev(3, "2024-01-01 10:30:00", 1),
      ev(4, "2024-01-01 10:00:30", 2))
    q.processAllAvailable()
    // watermark-advancing event closes all earlier sessions via timeout
    in.addData(ev(5, "2024-01-01 12:00:00", 3))
    q.processAllAvailable()
    in.addData(ev(6, "2024-01-01 14:00:00", 3))
    q.processAllAvailable()
    val streamed = spark.table("sessions")
      .filter(col("user_id") < 3)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toString).sorted.toSeq
    q.stop()

    val batchInput = Seq(
      ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:02:00", 1),
      ev(3, "2024-01-01 10:30:00", 1), ev(4, "2024-01-01 10:00:30", 2)).toDF()
    val batch = Sessionize.sessions(batchInput, "user_id", "ts", gapSeconds = 300)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.size == 3)
  }

  test("streaming dedup drops cross-batch duplicate keys exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.dedupStream(in.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    in.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:01:00", 1))
    q.processAllAvailable()
    // same event_id redelivered in a later batch (same + different payload)
    in.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:01:30", 7),
      ev(3, "2024-01-01 10:02:00", 2))
    q.processAllAvailable()
    val out = spark.table("dedup_out")
    assert(out.count() == 3)
    assert(out.select("event_id").distinct().count() == 3)
    q.stop()
  }

  test("built-in session_window agrees with gaps-and-islands on session count") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val out = EventStreams.sessionWindowCounts(in.toDF(), gap = "5 minutes",
      watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sw_counts")
      .outputMode(OutputMode.Append).start()
    in.addData(
      ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:02:00", 1),
      ev(3, "2024-01-01 10:30:00", 1))
    q.processAllAvailable()
    in.addData(ev(4, "2024-01-01 12:00:00", 9))
    q.processAllAvailable()
    in.addData(ev(5, "2024-01-01 14:00:00", 9))
    q.processAllAvailable()
    val sessions = spark.table("sw_counts").filter(col("user_id") === 1).collect()
    q.stop()
    assert(sessions.length == 2)
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-stream interval join equals the batch prior-window join") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[EventRow]
    val cIn = MemoryStream[EventRow]
    val out = EventStreams.purchaseClickJoin(pIn.toDF(), cIn.toDF(),
      windowSeconds = 3600, watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()

    val clicks = Seq(
      ev(10, "2024-01-01 09:10:00", 1), ev(11, "2024-01-01 09:50:00", 1, v = 2.0),
      ev(12, "2024-01-01 09:59:00", 2), ev(13, "2024-01-01 08:30:00", 1))
    val purchases = Seq(
      ev(20, "2024-01-01 10:00:00", 1, "purchase"),
      ev(21, "2024-01-01 10:30:00", 2, "purchase"))
    cIn.addData(clicks: _*)
    pIn.addData(purchases: _*)
    q.processAllAvailable()
    // advance both watermarks so all joinable pairs are emitted
    cIn.addData(ev(98, "2024-01-01 13:00:00", 99))
    pIn.addData(ev(99, "2024-01-01 13:00:00", 99, "purchase"))
    q.processAllAvailable()

    val streamed = spark.table("ss_join")
      .filter(col("user_id") < 99)
      .select("event_id", "c_ts", "c_value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    q.stop()

    // batch twin over the same rows
    val pDf = purchases.toDF().select(col("event_id"), col("user_id"), col("ts"))
    val cDf = clicks.toDF().select(col("user_id"), col("ts"), col("value"))
    val batch = graft.operators.RangeJoin.priorWindowJoin(
      pDf, cDf, "user_id", "ts", "ts", windowSeconds = 3600, payload = Seq("ts", "value"))
      .select(col("event_id"), col("range_match.ts"), col("range_match.value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("streaming latest-state equals batch latestSnapshot; late data never regresses") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = EventStreams.latestState(in.toDS())
      .writeStream.format("memory").queryName("latest_state")
      .outputMode(OutputMode.Update).start()

    // batch 1: user 1 reaches ts 10:30; user 2 at 09:00
    val b1 = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "a"), ev(2, "2024-01-01 10:30:00", 1, "b"),
      ev(3, "2024-01-01 09:00:00", 2, "x"))
    // batch 2: user 1 gets only LATE data (ts before 10:30) — state must
    // hold; user 2 legitimately advances
    val b2 = Seq(
      ev(4, "2024-01-01 09:45:00", 1, "stale"),
      ev(5, "2024-01-01 11:00:00", 2, "y"))
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    val emitted = spark.table("latest_state").collect()
      .map(r => (r.getLong(2), (r.getTimestamp(1).getTime, r.getLong(0), r.getString(3))))
    q.stop()

    // the late-arrival batch re-emitted user 1's UNCHANGED latest: every
    // emission for user 1 is the same row (a regression would add a second)
    assert(emitted.filter(_._1 == 1L).map(_._2).distinct.length === 1)
    // final state per user (max emission) equals the batch operator
    val finalPerUser = emitted.groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._2).max }
    val batchTwin = graft.operators.Temporal.latestSnapshot(
      (b1 ++ b2).toDF(), "user_id", "ts", Seq("event_id"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Timestamp]("ts").getTime, r.getAs[Long]("event_id"),
          r.getAs[String]("event_type")))).toMap
    assert(finalPerUser === batchTwin)
  }

  test("versioned-state re-delivery matrix: every stateful step recomputes v=N identically") {
    // the one protocol all five ingests share (VersionedState): batch N
    // merges into v=N from v=N−1, so a RE-DELIVERED batch (restart
    // between commit and checkpoint ack) must recompute the same
    // version and the same sink output — run each step with id=0, id=1,
    // then id=1 AGAIN with the same batch, and assert output + state
    // are bit-identical
    import graft.streaming.{CorpusStreams, VersionedState}
    val events = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("ts"), col("user_id"), col("event_id"))
    val b1 = events.where(col("user_id") % 2 === 0)
    val b2 = events.where(col("user_id") % 2 =!= 0)
    def snap(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    def stateSnap(dir: String, id: Long): Seq[String] =
      snap(spark.read.parquet(VersionedState.path(dir, id)))

    val cases: Seq[(String, String => (org.apache.spark.sql.DataFrame, Long) => org.apache.spark.sql.DataFrame, Seq[String])] = {
      val dimDir = java.nio.file.Files.createTempDirectory("mx-dim").toString
      // dim covers only ONE key so later facts genuinely park
      events.select(col("event_type").as("k")).distinct()
        .orderBy("k").limit(1)
        .withColumn("dim_name", concat(lit("D_"), col("k")))
        .write.mode("overwrite").parquet(dimDir)
      Seq(
        ("decayed", (d: String) => (b: org.apache.spark.sql.DataFrame, id: Long) =>
          CorpusStreams.decayedStep(b, "event_type", "ts", 7, d, id), Seq("")),
        ("heavyHitter", (d: String) => (b: org.apache.spark.sql.DataFrame, id: Long) =>
          CorpusStreams.heavyHitterStep(b, "event_type", 4, d, id), Seq("/mg", "/n")),
        ("anomaly", (d: String) => (b: org.apache.spark.sql.DataFrame, id: Long) =>
          CorpusStreams.anomalyStep(b, "event_type", "ts", d, 2.0, id), Seq("")),
        ("slidingDistinct", (d: String) => (b: org.apache.spark.sql.DataFrame, id: Long) =>
          CorpusStreams.slidingDistinctStep(b, "user_id", "ts", 64, 7, d, id), Seq("")),
        ("lateDim", (d: String) => (b: org.apache.spark.sql.DataFrame, id: Long) =>
          CorpusStreams.lateDimStep(b.select(col("event_type").as("k"), col("user_id")),
            dimDir, "k", d, id), Seq("")),
        ("markov", (d: String) => (b: org.apache.spark.sql.DataFrame, id: Long) =>
          CorpusStreams.markovStep(b, "user_id", "event_type", "ts",
            "event_id", d, id), Seq("/cells", "/last")))
    }
    cases.foreach { case (name, mkStep, stateSubdirs) =>
      val dir = java.nio.file.Files.createTempDirectory(s"mx-$name").toString
      val step = mkStep(dir)
      step(b1, 0L).count()
      val out1 = snap(step(b2, 1L))
      val st1 = stateSubdirs.map(s => stateSnap(dir + s, 1L))
      val out2 = snap(step(b2, 1L)) // re-delivery of batch 1
      val st2 = stateSubdirs.map(s => stateSnap(dir + s, 1L))
      assert(out1 == out2, s"$name: re-delivered sink output differs")
      assert(st1 == st2, s"$name: re-delivered state v=1 differs")
      assert(st1.exists(_.nonEmpty), s"$name: state v=1 unexpectedly empty")
    }
  }

  test("heavy hitters: a real empty-string item is a legitimate key, not a sentinel") {
    // regression for the round-6 advice: "" used to be reserved as the
    // in-domain sentinel row and silently dropped from state
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hh-empty").toString
    val batch = (Seq.fill(50)("") ++ Seq.fill(30)("x") ++
      (0 until 20).map(i => s"t_$i")).toDF("item")
    val out = graft.streaming.CorpusStreams
      .heavyHitterStep(batch, "item", 4, dir, 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "" is the heaviest item (50 of 100 > n/k=25): it MUST be present
    assert(out.contains(""), s"empty-string heavy hitter missing: $out")
    assert(out("") >= 50L - 25L)
  }

  test("dedupWithinWatermark: dedups inside the horizon, re-admits after it") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[EventRow]
    // key on event_type — standing in for a content fingerprint column
    val out = EventStreams.dedupWithinWatermark(in.toDF(),
      keyCols = Seq("event_type"), watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append).start()

    // two same-key records 1 minute apart: the second is a duplicate
    in.addData(ev(1, "2024-01-01 10:00:00", 1, "fpA"),
      ev(2, "2024-01-01 10:01:00", 2, "fpA"))
    q.processAllAvailable()
    // a different key passes through; it also advances the max event time
    in.addData(ev(3, "2024-01-01 11:00:00", 3, "fpB"))
    q.processAllAvailable()
    // watermark (11:00 − 10 min) is now past fpA's expiry → re-admitted
    in.addData(ev(4, "2024-01-01 11:05:00", 4, "fpA"))
    q.processAllAvailable()
    val got = spark.table("dedup_wm")
      .select("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    q.stop()
    assert(got == Set((1L, "fpA"), (3L, "fpB"), (4L, "fpA")),
      s"expected in-horizon dedup of id 2 and re-admission of id 4, got $got")
    // contrast: dedupStream (global key memory) would have dropped id 4 —
    // the bounded-state semantics are what scale to an unbounded corpus
  }
}
