package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, NearDup}
import graft.queries.{CorpusQueries, StarQueries}

/** Round-10 fixtures: REAL image resize (q210), REAL frame extraction
  * (q209), the fused two-hash image near-dup (q214) and the
  * probe-side NOT-IN NULL census row (q213). */
class Round10Spec extends AnyFunSuite {
  import TestSpark._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // action on THIS QueryExecution — AQE finalizes in place
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  // floors-of-floors replay of the decimation straight from synthPixel
  private def expectedResized(docId: Long): Array[Array[Int]] = {
    val seed = if (docId % 10 == 1) docId - 1 else docId
    val pert = docId % 10 == 1
    Array.tabulate(16, 16) { (y2, x2) =>
      ((for (dy <- 0 until 2; dx <- 0 until 2)
        yield Multimodal.synthPixel(seed, pert, x2 * 2 + dx, y2 * 2 + dy).toLong)
        .sum / 4).toInt
    }
  }

  test("q210 resized blob DECODES to exactly the decimated raster") {
    for (id <- Seq(0L, 1L, 7L, 11L, 42L, 130L)) {
      val resized = Multimodal.resizeRaster(Multimodal.synthPng(id), 2)
      assert(resized.nonEmpty, s"doc $id must resize")
      val (blob, w, h) = resized.get
      assert(w == 16 && h == 16, s"doc $id dims ${w}x$h")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      assert(img.getWidth == 16 && img.getHeight == 16)
      val exp = expectedResized(id)
      for (y <- 0 until 16; x <- 0 until 16)
        assert(img.getRaster.getSample(x, y, 0) == exp(y)(x),
          s"doc $id pixel ($x,$y): got ${img.getRaster.getSample(x, y, 0)}, want ${exp(y)(x)}")
    }
    // degenerate inputs yield the sentinel, never a throw
    assert(Multimodal.resizeRaster("not a png".getBytes("UTF-8"), 2).isEmpty)
  }

  test("q209 container round trip: frame counts, shared-seed dups, planted near-dup") {
    for (id <- Seq(0L, 5L, 10L, 11L)) {
      val frames = Multimodal.parseFrames(Multimodal.synthVideo(id))
      assert(frames.exists(_.length == (1 + id % 3).toInt), s"doc $id frame count")
    }
    // docs 10 (2 frames) and 11 (3 frames, planted twin of 10): frame 0
    // is the perturbed near-dup, the other shared frame an EXACT dup
    def hashes(id: Long) = Multimodal.parseFrames(Multimodal.synthVideo(id)).get
      .map(b => Multimodal.imagePerceptualHash(id, b))
    val f10 = hashes(10L)
    val f11 = hashes(11L)
    assert(java.lang.Long.bitCount(f10(0).dhash ^ f11(0).dhash) <= 1,
      "planted frame-0 pair must be within 1 dHash bit")
    assert(f10(1).dhash == f11(1).dhash && f10(1).ahash == f11(1).ahash,
      "shared unperturbed frames must hash identically")
    // unparseable blobs yield the sentinel row shape
    assert(Multimodal.parseFrames("junk".getBytes("UTF-8")).isEmpty)
  }

  test("q209 frame dHashes ride hammingPairs: cross-video near-dup end-to-end") {
    val fh = CorpusQueries.frameSample(spark, sf)
      .withColumn("fid", col("doc_id") * 8 + col("frame_no"))
      .select("fid", "dhash")
    val banded = NearDup.hammingPairs(fh, "fid", "dhash",
        maxHamming = 3, bits = 56)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flat = fh.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- flat; (ib, hb) <- flat
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(banded == brute,
      s"banded/brute diverge: only-banded=${(banded -- brute).take(5)}, " +
        s"only-brute=${(brute -- banded).take(5)}")
    // every planted cross-video pair (docs d, d+1 with d%10==0) collides
    // on frame 0
    val docIds = CorpusQueries.frameSample(spark, sf)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val planted = docIds.filter(d => d % 10 == 0 && docIds(d + 1))
      .map(d => (d * 8, (d + 1) * 8))
    assert(planted.nonEmpty && planted.subsetOf(brute),
      s"missing planted frame pairs: ${(planted -- brute).take(5)}")
  }

  test("q214 fused two-hash near-dup equals brute force and covers the dHash-only row") {
    val hashes = CorpusQueries.imagePHash(spark, sf)
      .select("doc_id", "ahash", "dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, aa, da) <- hashes; (ib, ab, db) <- hashes
      if ia < ib
      ah = java.lang.Long.bitCount(aa ^ ab)
      dh = java.lang.Long.bitCount(da ^ db)
      if ah <= 3 || dh <= 3
    } yield (ia, ib, ah.toLong, dh.toLong)).toSet
    val fused = CorpusQueries.imageNearDupFused(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(fused == brute,
      s"fused/brute diverge: only-fused=${(fused -- brute).take(5)}, " +
        s"only-brute=${(brute -- fused).take(5)}")
    val dOnly = CorpusQueries.imageNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dOnly.subsetOf(fused.map(t => (t._1, t._2))),
      "the dHash-only pair set must be a subset of the fused set")
  }

  test("q215 acoustic fingerprints: planted transient flips ≤2 bits; banded = brute force") {
    def fp(id: Long): Long = {
      val seed = if (id % 10 == 1) id - 1 else id
      Multimodal.audioFingerprint(id, Multimodal.synthWav(
        n = (100 + seed % 157).toInt, rate = 8000,
        amplitude = (500 + (seed % 29) * 250).toInt,
        period = (6 + seed % 23).toInt,
        boostFirst = if (id % 10 == 1) 4 else 0, boost = 500)).afp
    }
    for (base <- Seq(0L, 10L, 40L, 130L)) {
      val h = java.lang.Long.bitCount(fp(base) ^ fp(base + 1))
      assert(h <= 2, s"planted audio pair ($base,${base + 1}) fingerprint hamming $h")
      assert(fp(base) >= 0, "56-bit fingerprints stay non-negative")
    }
    val ids = Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val fps = ids.map(id => (id, fp(id)))
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (ia, ib)).toSet
    val banded = CorpusQueries.audioNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"banded/brute diverge: only-banded=${(banded -- brute).take(5)}, " +
        s"only-brute=${(brute -- banded).take(5)}")
  }

  test("q213 probe-null divergence: NOT IN drops exactly the rows the anti join keeps") {
    val rows = StarQueries.q213NotInProbeNull(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cust = Tables.load(spark, sf, "customer")
    val nNullProbe = cust.filter(col("c_custkey") % 97 === 3).count()
    assert(nNullProbe > 0, "fixture must contain NULL probe keys")
    val (nNotIn, chkNotIn) = rows("not_in_drops_probe_nulls")
    val (nAnti, chkAnti) = rows("anti_join_keeps_probe_nulls")
    assert(nAnti == nNotIn + nNullProbe,
      "anti join must keep exactly the probe-null rows NOT IN drops")
    val chkNulls = cust.filter(col("c_custkey") % 97 === 3)
      .agg(sum("c_custkey")).head().getLong(0)
    assert(chkAnti == chkNotIn + chkNulls)
  }

  test("q213 plans LeftAnti with only the 1-row scalar as a nested loop") {
    val p = finalPlan(StarQueries.q213NotInProbeNull(spark, sf))
    assert(p.contains("LeftAnti"), s"anti-join expected:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q216 grid-banded radius join: exactly-once, boundary-exact, equals brute force") {
    import spark.implicits._
    // hand-placed boundary fixture: same cell, touching r exactly (kept,
    // closed ball), one past r (dropped), diagonal neighbors, far apart
    val fix = Seq(
      (0L, 10L, 10L), (1L, 12L, 14L),   // same cell, d²=20
      (2L, 100L, 100L), (3L, 164L, 100L), // adjacent cells, d=64 exactly
      (4L, 200L, 200L), (5L, 265L, 200L), // d=65 — just outside
      (6L, 319L, 319L), (7L, 320L, 320L), // diagonal cell corner, d²=2
      (8L, 1000L, 1000L), (9L, 5000L, 5000L))
    val got = operators.Spatial
      .radiusSelfJoin(fix.toDF("id", "x", "y"), "id", "x", "y", 64L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(got.length == got.map(_._1).distinct.length, "pairs must emit exactly once")
    val gotMap = got.toMap
    assert(gotMap == Map((0L, 1L) -> 20L, (2L, 3L) -> 4096L, (6L, 7L) -> 2L),
      s"boundary fixture mismatch: $gotMap")
    // full-query brute-force equality on the real sf table
    val pairs = CorpusQueries.spatialRadius(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(pairs.length == pairs.map(_._1).distinct.length)
    val docs = Tables.load(spark, sf, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    val n = math.max(docs.length.toLong, 64L)
    val pts = docs.map(id => (id,
      ((id * 1103515245L + 12345L) / 65536L) % 4096L,
      ((id * 69069L + 1L) / 65536L) % n))
    val brute = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d <= 64L * 64L
    } yield ((ia, ib), d)).toMap
    assert(pairs.toMap == brute,
      s"banded/brute diverge: only-banded=${(pairs.toMap -- brute.keys).take(5)}, " +
        s"only-brute=${(brute -- pairs.map(_._1)).take(5)}")
  }

  test("LshSignatures expression == declarative per-plane formulation, bit for bit") {
    import spark.implicits._
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    val planes = operators.AnnSearch.lshPlanes(8, 6, 16, 42L)
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(50)(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    val df = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val native = df.select(col("vec_id"),
        posexplode(exprColumn(functions.LshSignatures(
          columnExpr(col("embedding")), planes.map(_.map(_.toSeq))))).as(Seq("t", "sig")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val declarative = planes.zipWithIndex.flatMap { case (ps, t) =>
      df.select(col("vec_id"),
          operators.AnnSearch.lshSignature(col("embedding"), ps).as("sig"))
        .collect().map(r => (r.getLong(0), t) -> r.getLong(1))
    }.toMap
    assert(native == declarative)
  }

  test("q218 k-truss peel: cascade fixture, exactly-once triangles, kcore divergence") {
    import spark.implicits._
    // strip of three triangles 123/234/345: under k=4 (support ≥ 2)
    // round 1 peels every support-1 edge (12,13,24,35,45) — which kills
    // all three triangles, so the shared edges 23/34 (support 2 in
    // round 1!) CASCADE out in round 2. This is the edge-grain behavior
    // no degree test shows: nodes 2-4 keep degree ≥ 2 through round 1.
    val strip = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L)).toDF("vec_a", "vec_b")
    val got = operators.Truss.peel(strip, k = 4, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got == Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 4L) -> 1L, (3L, 5L) -> 1L,
      (4L, 5L) -> 1L, (2L, 3L) -> 2L, (3L, 4L) -> 2L), s"cascade mismatch: $got")
    // k=3: a lone triangle survives with support 1, a pendant edge peels
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L)).toDF("vec_a", "vec_b")
    val got3 = operators.Truss.peel(tri, k = 3, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2),
         if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got3 == Map(
      (1L, 2L) -> (-1L, 1L), (1L, 3L) -> (-1L, 1L), (2L, 3L) -> (-1L, 1L),
      (3L, 9L) -> (1L, -1L)), s"triangle fixture mismatch: $got3")
  }

  test("q216/q218 plan shapes: banded joins stay hash equi-joins, never cartesian") {
    val p216 = finalPlan(CorpusQueries.spatialRadius(spark, sf))
    assert(!p216.contains("CartesianProduct"), s"q216 went cartesian:\n$p216")
    // the only nested loop allowed is the broadcast 1-row count scalar
    assert(p216.contains("HashJoin"), s"q216 cell join must hash:\n$p216")
    val p218 = finalPlan(CorpusQueries.ktrussPeel(spark, sf))
    assert(!p218.contains("CartesianProduct"), s"q218 went cartesian:\n$p218")
    assert(!p218.contains("BroadcastNestedLoopJoin"), s"q218 wedge join must stay equi:\n$p218")
  }

  test("streaming Markov: uneven time-ordered batches == batch operator; boundary exact") {
    val events = Tables.load(spark, sf, "events")
      .select("user_id", "event_type", "ts", "event_id")
    val dir = java.nio.file.Files.createTempDirectory("markov-stream").toString
    // three uneven batches cut along the global (ts, event_id) order —
    // consistent with every per-user subsequence, so full-history batch
    // semantics are well-defined; many users straddle the cuts, which
    // is exactly the boundary the last-event seed must cover
    val ordered = events.orderBy("ts", "event_id").collect()
    val cuts = Seq(ordered.length / 5, ordered.length / 2, ordered.length)
    var start = 0
    val schema = events.schema
    cuts.zipWithIndex.foreach { case (end, id) =>
      val batch = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(
          ordered.slice(start, end): _*)), schema)
      graft.streaming.CorpusStreams
        .markovStep(batch, "user_id", "event_type", "ts", "event_id", dir, id.toLong)
        .count()
      start = end
    }
    val streamed = graft.operators.Markov.fromCounts(
      spark.read.parquet(
        graft.streaming.VersionedState.path(s"$dir/cells", 2L)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val batchOp = CorpusQueries.markovTransitions(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batchOp,
      s"streaming/batch diverge: ${(streamed.toSet -- batchOp.toSet).take(3)} / " +
        s"${(batchOp.toSet -- streamed.toSet).take(3)}")
    // boundary coverage: the cuts split at least one user's sequence,
    // so a naive per-batch lag (no seed) would undercount
    val naive = cuts.zip(0 +: cuts.dropRight(1)).map { case (end, s0) =>
      val b = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(
          ordered.slice(s0, end): _*)), schema)
      graft.operators.Markov.cellCounts(b, "user_id", "event_type",
        Seq(col("ts"), col("event_id"))).agg(sum("n")).head().getLong(0)
    }.sum
    val total = batchOp.values.map(_._1).sum
    assert(naive < total,
      s"fixture must exercise the batch boundary (naive $naive vs $total)")
  }

  test("streaming fingerprint near-dup: batched union == full hammingPairs; re-delivery idempotent") {
    import spark.implicits._
    // real image dHashes from the q205 codec path — the modality the
    // generic ingest exists for
    val fps = operators.Multimodal.decodeImageHashes(
      Tables.load(spark, sf, "documents").select(col("doc_id"))
        .as[Long].map(id => (id, operators.Multimodal.synthPng(id)))
        .toDF("doc_id", "blob")).toDF()
      .select(col("doc_id"), col("dhash").as("fp")).collect()
    val dir = java.nio.file.Files.createTempDirectory("fp-stream").toString
    val cuts = Seq(fps.length / 4, fps.length / 2, fps.length)
    var start = 0
    val emitted = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    var crossBatch = 0
    cuts.zipWithIndex.foreach { case (end, id) =>
      val batchIds = fps.slice(start, end).map(_.getLong(0)).toSet
      val batch = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(fps.slice(start, end): _*)),
        fps.head.schema)
      val out = graft.streaming.CorpusStreams
        .fingerprintNearDupStep(batch, "doc_id", "fp", 3, 56, dir, id.toLong)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(out.forall { case (a, b, _) =>
        batchIds.contains(a) || batchIds.contains(b) }, "pairs must involve the batch")
      crossBatch += out.count { case (a, b, _) =>
        batchIds.contains(a) ^ batchIds.contains(b) }
      out.foreach { p => assert(!emitted.contains(p), s"pair $p emitted twice"); emitted += p }
      start = end
    }
    assert(crossBatch > 0, "fixture must exercise cross-batch pairs")
    val full = NearDup.hammingPairs(
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(fps: _*)), fps.head.schema),
      "doc_id", "fp", 3, 56)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(emitted.toSet == full,
      s"streamed/batch diverge: ${(emitted.toSet -- full).take(3)} / ${(full -- emitted).take(3)}")
    // re-delivery of the last batch id recomputes identical output + state
    val lastBatch = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(
        fps.slice(cuts(1), cuts(2)): _*)), fps.head.schema)
    def run() = graft.streaming.CorpusStreams
      .fingerprintNearDupStep(lastBatch, "doc_id", "fp", 3, 56, dir, 2L)
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run(), "re-delivered batch must recompute identically")
  }

  test("q219 privacy census: uniform group tvd=0, homogeneous group pinned, missing segments count") {
    val got = CorpusQueries.privacyCensus(spark, sf).collect()
      .map(r => r.getAs[Number](0).longValue ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // engine-independent invariants on the real table
    got.values.foreach { case (n, l, tvd) =>
      assert(l >= 1 && tvd >= 0 && tvd <= 1000000, s"($n, $l, $tvd) out of range")
    }
    // hand-replayed exact TVD for one nation vs the same integer formula
    import spark.implicits._
    val cells = Tables.load(spark, sf, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment")).agg(count(lit(1)).as("c"))
      .collect().map(r =>
        (r.getAs[Number](0).longValue, r.getString(1)) -> r.getLong(2)).toMap
    val segs = cells.keys.map(_._2).toSet
    val nAll = cells.values.sum
    val nation0 = cells.keys.map(_._1).min
    val ng = cells.collect { case ((n, _), c) if n == nation0 => c }.sum
    val num = segs.toSeq.map { s =>
      val cg = cells.getOrElse((nation0, s), 0L)
      val call = cells.collect { case ((_, s2), c) if s2 == s => c }.sum
      math.abs(cg * nAll - call * ng)
    }.sum
    val expected = num * 1000000L / (2L * ng * nAll)
    assert(got(nation0)._3 == expected,
      s"nation $nation0 tvd ${got(nation0)._3} != replayed $expected")
    // a group distributed exactly like the global distribution has tvd 0:
    // synthetic two-nation fixture where nation 1 mirrors the global mix
    val fix = Seq((1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "A"), (2L, "B"))
    val fcells = fix.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fsegs = Seq("A", "B")
    val fnAll = 6L
    val fnum = fsegs.map { s =>
      val cg = fcells.getOrElse((1L, s), 0L)
      val call = fix.count(_._2 == s).toLong
      math.abs(cg * fnAll - call * 3L)
    }.sum
    assert(fnum == 0L, "mirror-distribution group must have exact TVD 0")
  }

  test("streaming spatial nearby: batched union == full radiusSelfJoin; boundary exact") {
    import spark.implicits._
    // the q216 point synthesis, streamed in three batches
    val ids = Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val n = math.max(ids.length.toLong, 64L)
    val pts = ids.map(id => (id,
      ((id * 1103515245L + 12345L) / 65536L) % 4096L,
      ((id * 69069L + 1L) / 65536L) % n))
    val dir = java.nio.file.Files.createTempDirectory("spatial-stream").toString
    val cuts = Seq(pts.length / 3, 2 * pts.length / 3, pts.length)
    var start = 0
    val emitted = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    var crossBatch = 0
    cuts.zipWithIndex.foreach { case (end, id) =>
      val batchIds = pts.slice(start, end).map(_._1).toSet
      val out = graft.streaming.CorpusStreams
        .spatialNearbyStep(pts.slice(start, end).toSeq.toDF("id", "x", "y"),
          "id", "x", "y", 64L, dir, id.toLong)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      crossBatch += out.count { case (a, b, _) =>
        batchIds.contains(a) ^ batchIds.contains(b) }
      out.foreach { p => assert(!emitted.contains(p), s"pair $p emitted twice"); emitted += p }
      start = end
    }
    assert(crossBatch > 0, "fixture must exercise cross-batch pairs")
    val full = operators.Spatial
      .radiusSelfJoin(pts.toSeq.toDF("id", "x", "y"), "id", "x", "y", 64L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(emitted.toSet == full,
      s"streamed/batch diverge: ${(emitted.toSet -- full).take(3)} / ${(full -- emitted).take(3)}")
  }

  test("q217 Markov transitions: hand fixture counts, exact-ratio p_ppm, tie order") {
    import spark.implicits._
    // user 1: A,B,A,B → A→B ×2, B→A ×1; user 2 contributes A→A once;
    // two events share a timestamp — event_id must break the tie
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val ev = Seq(
      (1L, ts(0), 10L, "A"), (1L, ts(1), 11L, "B"),
      (1L, ts(2), 12L, "A"), (1L, ts(2), 13L, "B"), // tied ts, id orders
      (2L, ts(0), 20L, "A"), (2L, ts(5), 21L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = operators.Markov
      .transitions(ev, "user_id", "event_type", Seq(col("ts"), col("event_id")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("A", "B") -> (2L, 666666L), // 2·1e6 div 3
      ("A", "A") -> (1L, 333333L),
      ("B", "A") -> (1L, 1000000L)), s"fixture mismatch: $got")
    // row-stochastic up to integer-floor slack on the real table
    val full = CorpusQueries.markovTransitions(spark, sf).collect()
    val bySrc = full.groupBy(_.getString(0))
    bySrc.foreach { case (src, rows) =>
      val ppm = rows.map(_.getLong(3)).sum
      val k = rows.length
      assert(ppm > 1000000L - k && ppm <= 1000000L,
        s"src $src p_ppm sums to $ppm over $k cells")
    }
  }
}
