package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Specs for the grouped-analytics operators: OLS regression (X72),
  * equi-depth histograms (X73), corpus novelty (X74) and int8 vector
  * quantization (X75). Cross-engine exactness is the oracle gate
  * (q90–q93, both SFs); these pin the math against independent
  * driver-side recomputation and the semantic invariants.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("group regression matches driver-side OLS on every source") {
    val out = CorpusQueries.groupRegression(spark, sf).collect()
    val rows = Tables.load(spark, sf, "documents")
      .select(col("source"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("x"),
        col("n_chars").as("y"))
      .collect().groupBy(_.getString(0))
    assert(out.map(_.getString(0)).toSet == rows.keySet)
    out.foreach { r =>
      val xs = rows(r.getString(0)).map(x => (x.getLong(1), x.getLong(2)))
      val n = xs.length.toLong
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val sxy = xs.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(r.getDouble(2) == slope, s"slope mismatch for ${r.getString(0)}")
      assert(r.getDouble(3) ==
        (sy.toDouble - slope * sx.toDouble) / n.toDouble, "intercept")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "r2 out of [0,1]")
    }
  }

  test("equi-depth histogram: 8 near-equal buckets that partition each group") {
    val out = CorpusQueries.equiDepthHist(spark, sf).collect()
    out.groupBy(_.getString(0)).foreach { case (flag, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (0L to 7L), s"$flag buckets")
      val counts = rows.map(_.getLong(2))
      val total = counts.sum
      counts.foreach(c => assert(
        c >= total / 16 && c <= total * 3 / 16,
        s"$flag bucket count $c not equi-depth for total $total"))
      // buckets tile the value range in order
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { w =>
        assert(w(0).getDouble(4) <= w(1).getDouble(3), s"$flag overlap")
      }
    }
  }

  test("novelty: shared shingles are never counted unique") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f"),     // shares the a-b-c-d window with doc 1
      (1L, "a b c d x y"),
      (2L, "p q r s t u")      // fully novel
    ).toDF("doc_id", "text")
    val sh = graft.operators.NearDup.shingles(docs, "doc_id", "text", n = 4)
      .select(col("doc_id"),
        graft.functions.TextFunctions.md5Hash56(col("shingle")).as("h"))
    val dfreq = sh.groupBy("h").agg(count_distinct(col("doc_id")).as("df"))
    val out = sh.join(dfreq, Seq("h")).groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_u"))
      .orderBy("doc_id").collect()
    // each doc has 3 4-gram shingles; "a b c d" is shared by docs 0 and 1
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 3L, 2L), (1L, 3L, 2L), (2L, 3L, 3L)))
    val corpus = CorpusQueries.noveltyScore(spark, sf).collect()
    corpus.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("int8 quantization: codes in [-127,127], error within a half step") {
    val out = CorpusQueries.quantizeInt8(spark, sf)
    val stats = out.groupBy("dim").agg(
      min("q").as("qmn"), max("q").as("qmx"), max("err").as("emax")).collect()
    assert(stats.length == 64)
    stats.foreach { r =>
      assert(r.getLong(1) >= -127L && r.getLong(2) <= 127L)
    }
    // per-dim error bound: half a quantization step of that dim's range
    val ranges = Tables.load(spark, sf, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim").agg((max(col("v").cast("double")) -
        min(col("v").cast("double"))).as("range"))
      .collect().map(r => r.getInt(0).toLong -> r.getDouble(1)).toMap
    stats.foreach { r =>
      val halfStep = ranges(r.getLong(0)) / 254.0 * 0.5 + 1e-12
      assert(r.getDouble(3) <= halfStep,
        s"dim ${r.getLong(0)} err ${r.getDouble(3)} > $halfStep")
    }
  }

  test("pagerank: conserves mass (minus truncation), favors inbound weight") {
    import spark.implicits._
    // star graph: everything points at 'hub' (weight 9), plus one
    // side edge — hub must outrank everything; spokes with identical
    // in-profiles must tie exactly (determinism)
    val edges = Seq(
      ("a", "hub", 9L), ("b", "hub", 9L), ("c", "hub", 9L),
      ("hub", "a", 1L), ("hub", "b", 1L), ("hub", "c", 1L))
      .toDF("src", "dst", "w")
    val out = graft.operators.PageRank.weighted(edges, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("hub", "a", "b", "c"))
    assert(out("hub") > out("a"))
    assert(out("a") == out("b") && out("b") == out("c"), "symmetric spokes must tie")
    // total mass stays within truncation loss of SCALE: <= 2 units lost
    // per node per round -> 4 nodes * 10 rounds * 2
    val total = out.values.sum
    val scale = graft.operators.PageRank.Scale
    assert(total <= scale && total >= scale - 4 * 10 * 2 - 100,
      s"mass $total vs $scale")
    // layout independence: same result from a repartitioned edge table
    val out2 = graft.operators.PageRank.weighted(edges.repartition(7), iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == out2)
  }

  test("snapshot diff classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("doc_id", "text")
    val out = graft.operators.Temporal.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff: NULL content classifies by presence, not by digest") {
    import spark.implicits._
    val a = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option("z")),
      (5L, Option.empty[String])).toDF("doc_id", "text")
    val b = Seq((2L, Option.empty[String]), (3L, Option.empty[String]),
      (4L, Option.empty[String]), (5L, Option("w"))).toDF("doc_id", "text")
    val out = graft.operators.Temporal.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "removed",   // present only in a, despite non-null content
      2L -> "unchanged", // NULL on both sides
      3L -> "changed",   // content -> NULL is a change
      4L -> "added",     // present only in b, with NULL content
      5L -> "changed"))  // NULL -> content is a change
  }

  test("incremental rollup merge is lossless on every source and split") {
    val out = CorpusQueries.incrementalRollup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getBoolean(5),
      s"merge != direct for source ${r.getString(0)}"))
    // the merged totals must also reconcile with the profile's totals
    val prof = CorpusQueries.corpusProfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      assert(prof(r.getString(0)) == ((r.getLong(1), r.getLong(2))),
        s"rollup/profile totals disagree for ${r.getString(0)}")
    }
  }

  test("distribution drift: nonnegative terms folding to the reported total") {
    val out = CorpusQueries.distributionDrift(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(3) >= 0.0, s"negative chi2 term at ${r.getString(0)}"))
    val total = out.head.getDouble(4)
    assert(out.forall(_.getDouble(4) == total))
    // identical fold order as the query: term sum in token order
    val folded = out.sortBy(_.getString(0)).map(_.getDouble(3))
      .foldLeft(0.0)(_ + _)
    assert(folded == total, s"fold $folded != reported $total")
  }

  test("skew report: shares and skew factor are consistent") {
    val out = CorpusQueries.skewReport(spark, sf).collect()
    assert(out.length == 10)
    val counts = out.map(_.getLong(1))
    assert(counts.sorted.reverse.toSeq == counts.toSeq, "not ordered by count")
    assert(out.map(_.getDouble(2)).sum <= 1.0 + 1e-12)
    out.foreach(r => assert(r.getDouble(4) >= 1.0, "max/mean skew below 1"))
  }
}
