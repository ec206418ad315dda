package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, NearDup}
import graft.queries.{CorpusQueries, StarQueries}

/** Round-9 fixtures: image perceptual-hash near-dup (q205/q206) and the
  * NULL-semantics census (q207/q208). */
class Round9Spec extends AnyFunSuite {
  import TestSpark._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // action on THIS QueryExecution — AQE finalizes in place
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  // independent re-computation of the hashes straight from synthPixel —
  // the engine path must agree after a REAL PNG encode+decode round trip
  private def expectedHashes(docId: Long): (Long, Long) = {
    val seed = if (docId % 10 == 1) docId - 1 else docId
    val pert = docId % 10 == 1
    val g = Array.tabulate(8, 8) { (r, c) =>
      (for (dy <- 0 until 4; dx <- 0 until 4)
        yield Multimodal.synthPixel(seed, pert, c * 4 + dx, r * 4 + dy).toLong)
        .sum / 16
    }
    val mean = g.flatten.sum / 64
    var ahash = 0L; var dhash = 0L
    for (r <- 0 until 8; c <- 0 until 7) {
      val k = r * 7 + c
      if (g(r)(c) > mean) ahash |= 1L << k
      if (g(r)(c) > g(r)(c + 1)) dhash |= 1L << k
    }
    (ahash, dhash)
  }

  test("q205 image hashes survive the real PNG encode/decode round trip") {
    for (id <- Seq(0L, 1L, 7L, 10L, 11L, 33L, 128L)) {
      val h = Multimodal.imagePerceptualHash(id, Multimodal.synthPng(id))
      val (ea, ed) = expectedHashes(id)
      assert(h.width == 32L && h.height == 32L, s"doc $id decoded dims")
      assert(h.ahash == ea, s"doc $id ahash: got ${h.ahash}, want $ea")
      assert(h.dhash == ed, s"doc $id dhash: got ${h.dhash}, want $ed")
    }
  }

  test("planted twins are ≤1 dHash bit apart; 56-bit hashes stay non-negative") {
    for (base <- Seq(0L, 10L, 40L, 130L)) {
      val hb = Multimodal.imagePerceptualHash(base, Multimodal.synthPng(base))
      val ht = Multimodal.imagePerceptualHash(base + 1, Multimodal.synthPng(base + 1))
      val ham = java.lang.Long.bitCount(hb.dhash ^ ht.dhash)
      assert(ham <= 1, s"planted pair ($base,${base + 1}) dhash hamming $ham")
      assert(hb.ahash >= 0 && hb.dhash >= 0 && ht.ahash >= 0 && ht.dhash >= 0)
    }
  }

  test("q206 banded pairs = brute-force hamming pairs, every planted pair found") {
    val hashes = CorpusQueries.imagePHash(spark, sf)
      .select("doc_id", "dhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val banded = CorpusQueries.imageNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"banded/brute diverge: only-banded=${(banded -- brute).take(5)}, " +
        s"only-brute=${(brute -- banded).take(5)}")
    val maxId = hashes.map(_._1).max
    val planted = hashes.map(_._1).filter(d => d % 10 == 0 && d + 1 <= maxId)
      .map(d => (d, d + 1)).toSet
    assert(planted.subsetOf(banded),
      s"missing planted pairs: ${(planted -- banded).take(5)}")
  }

  test("q207 pins all three NOT-IN semantics: trap empty, guard real, IN unaffected") {
    val rows = StarQueries.q207NotInNullCensus(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("not_in_with_nulls") == ((0L, 0L)),
      "NOT IN over a null-containing subquery must return zero rows")
    assert(rows("not_in_null_guarded")._1 > 0L)
    assert(rows("in_with_nulls")._1 > 0L)
    val nCust = Tables.load(spark, sf, "customer").count()
    assert(rows("not_in_null_guarded")._1 + rows("in_with_nulls")._1 == nCust,
      "guarded NOT IN and IN must partition the probe")
  }

  test("q207 plans LeftAnti/LeftSemi with only the 1-row scalar as a nested loop") {
    val p = finalPlan(StarQueries.q207NotInNullCensus(spark, sf))
    assert(p.contains("LeftAnti"), s"anti-join expected:\n$p")
    assert(p.contains("LeftSemi"), s"semi-join expected:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q211 Q16-shape: one fact scan, LeftAnti exclusion, dims broadcast, no cartesian") {
    val p = finalPlan(StarQueries.q211SupplierCountByPart(spark, sf))
    assert(p.linesIterator.count(l =>
      (l.contains("FileScan parquet") || l.contains("Scan parquet")) &&
        l.contains("lineitem")) == 1, s"fact must be scanned once:\n$p")
    assert(p.contains("LeftAnti"), s"NOT IN must plan as an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q212 Q19-shape: the disjunction never breaks the equi join; part filter pushed") {
    val p = finalPlan(StarQueries.q212BandedRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"OR-of-conjunctions must stay a post-join filter:\n$p")
    assert(p.linesIterator.count(l =>
      (l.contains("FileScan parquet") || l.contains("Scan parquet")) &&
        l.contains("lineitem")) == 1, s"fact must be scanned once:\n$p")
    // the union of the part-side disjuncts reaches the part scan
    assert(p.contains("PushedFilters") || p.contains("p_brand"), p)
  }

  test("q208 divergence is exactly the null-key group; null-safe join stays a hash join") {
    val df = StarQueries.q208NullSafeJoin(spark, sf)
    val p = finalPlan(df)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"null-safe equality is hashable — must not plan a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    val rows = df.collect()
    val nullRows = rows.filter(_.isNullAt(1))
    assert(nullRows.length == 1 && nullRows.head.getString(0) == "nullsafe",
      "exactly one null-key row, and only in the nullsafe variant")
    // away from the null key the two variants agree row-for-row
    val bySide = rows.filterNot(_.isNullAt(1))
      .groupBy(_.getString(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSet).toMap
    assert(bySide("nullsafe") == bySide("plain"))
  }
}
