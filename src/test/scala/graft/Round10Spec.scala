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
}
