package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.queries.CorpusQueries

/** Specs for the round-4 curation additions: overlapping sliding-window
  * chunking (X69), exactly-k-per-stratum deterministic sampling through
  * the native TopKPerKey operator (X70), and median/MAD robust outlier
  * flagging (X71). Cross-engine bit-exactness is the oracle gate
  * (q87–q89, both SFs); these specs pin the semantic invariants and the
  * plan shapes.
  */
class CurationOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("sliding chunks: spans tile each doc at stride 10, fp matches content") {
    val out = CorpusQueries.slidingChunks(spark, sf).collect()
    val lens = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == lens.filter(_._2 >= 1).keySet)
    byDoc.foreach { case (id, chunks) =>
      val len = lens(id)
      assert(chunks.length == ((len + 9) / 10).toInt, s"doc $id chunk count")
      chunks.sortBy(_.getLong(1)).zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i.toLong)                   // chunk_idx dense
        assert(c.getLong(2) == i.toLong * 10)              // start = idx·stride
        assert(c.getLong(3) == math.min(20L, len - i * 10)) // window or tail
      }
    }
    // content fingerprint spot check on one doc, recomputed driver-side
    val d0 = Tables.load(spark, sf, "documents")
      .orderBy("doc_id").select("doc_id", "text").head()
    val w = d0.getString(1).split(" ")
    val expectFp = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      w.slice(10, 30).mkString(" "))
    val got = out.filter(r => r.getLong(0) == d0.getLong(0) && r.getLong(1) == 1L)
    assert(got.head.getString(4) == expectFp)
  }

  test("strata sample: k smallest hashes per source, via native TopKPerKey") {
    org.apache.spark.sql.graftsql.installTopK(spark)
    val df = CorpusQueries.strataSample(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rewrite did not fire:\n$plan")
    assert(plan.contains("TopKPerKeyPartial"), s"no partial prune:\n$plan")
    val out = df.collect()
    val direct = Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        TextFunctions.md5Hash56(col("doc_id").cast("string")).as("h"))
      .collect().groupBy(_.getString(0)).toSeq
      .flatMap { case (src, rows) =>
        rows.sortBy(r => (r.getLong(2), r.getLong(1))).take(20).zipWithIndex
          .map { case (r, i) => (src, r.getLong(1), i + 1L) }
      }.toSet
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == direct)
  }

  test("MAD outliers: flag equals driver-side median/MAD recomputation") {
    val out = CorpusQueries.madOutliers(spark, sf).collect()
    // quantile_cont's interpolation form, matching Percentiles: lo·(1−f)+hi·f
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val p = (s.length - 1) * 0.5
      val f = p - math.floor(p)
      s(p.toInt) * (1.0 - f) + s(math.ceil(p).toInt) * f
    }
    out.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val toks = rows.map(_.getLong(2).toDouble).toSeq
      val med = medianOf(toks)
      val mad = medianOf(toks.map(x => math.abs(x - med)))
      rows.foreach { r =>
        val dev = math.abs(r.getLong(2).toDouble - med)
        assert(math.abs(r.getDouble(3) - dev) < 1e-9, s"dev mismatch in $src")
        assert(r.getBoolean(4) == dev > mad * 3.0,
          s"flag mismatch: doc ${r.getLong(0)} dev=$dev mad=$mad")
      }
    }
    // the robust gate must not flag the bulk of any stratum
    val frac = out.count(_.getBoolean(4)).toDouble / out.length
    assert(frac < 0.5, s"outlier fraction $frac is implausible")
  }

  test("dup artifact: one derivation feeds q29/q50/q105/q109/q119, results unshared-equal") {
    import graft.operators.{CurationOps, NearDup}
    CurationOps.clear()
    val before = CurationOps.derivationCount
    val pairs = CorpusQueries.ngramJaccard(spark, sf).collect()
    CorpusQueries.dupGroups(spark, sf).collect()
    CorpusQueries.canonicalKeeper(spark, sf).collect()
    CorpusQueries.sourceOverlap(spark, sf).collect()
    CorpusQueries.dedupReweight(spark, sf).collect()
    assert(CurationOps.derivationCount - before == 1,
      "five artifact consumers must trigger exactly one pair-pipeline derivation")

    // shared-artifact results must equal a fresh unshared derivation
    val fresh = NearDup.ngramJaccardPairs(
      Tables.load(spark, sf, "documents"), "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == fresh)

    // clear() releases the artifact's persisted RDDs (bracket hygiene)
    val ids = CurationOps.pinnedRddIds
    assert(ids.nonEmpty)
    CurationOps.clear()
    val live = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.forall(id => !live.contains(id)),
      s"artifact RDDs ${ids.filter(live.contains)} survived clear()")
    assert(CurationOps.pinnedRddIds.isEmpty)
  }

  test("knn graph artifact: one derivation feeds q123/q131/q139, results unshared-equal") {
    import graft.operators.{AnnSearch, CurationOps}
    CurationOps.clear()
    val before = CurationOps.knnDerivationCount
    val edges = CorpusQueries.mutualKnn(spark, sf).collect()
    CorpusQueries.knnCommunities(spark, sf).collect()
    CorpusQueries.knnTriangles(spark, sf).collect()
    assert(CurationOps.knnDerivationCount - before == 1,
      "three graph consumers must trigger exactly one block-grid derivation")
    // shared-artifact edges must equal a fresh unshared derivation
    val fresh = AnnSearch.mutualKnnGraph(
        Tables.load(spark, sf, "embeddings").select("vec_id", "embedding"),
        k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges.map(r => (r.getLong(0), r.getLong(1))).toSet == fresh)
    CurationOps.clear()
  }

  test("bpe artifact: one training feeds q103/q104/q111, results untrained-equal") {
    import graft.operators.{BpeTrain, CurationOps}
    CurationOps.clear()
    val before = CurationOps.bpeDerivationCount
    val trained = CorpusQueries.bpeTrain(spark, sf).collect()
    CorpusQueries.bpeTokenize(spark, sf).collect()
    CorpusQueries.tokenizerFertility(spark, sf).collect()
    assert(CurationOps.bpeDerivationCount - before == 1,
      "three tokenizer consumers must trigger exactly one BPE training")

    // merge rows must equal a fresh unshared training run (byte-level —
    // the suite's tokenizer geometry since round 7)
    val fresh = BpeTrain.trainBytes(
      Tables.load(spark, sf, "documents"), "text", rounds = 5)._1
    val gotMerges = trained.filter(_.getString(0) == "merge")
      .map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4))).toSet
    assert(gotMerges ==
      fresh.map(m => (m.round.toLong, m.left, m.right, m.weight)).toSet)

    // clear() releases the checkpointed word-type tables
    val ids = CurationOps.pinnedRddIds
    assert(ids.nonEmpty)
    CurationOps.clear()
    val live = spark.sparkContext.getPersistentRDDs.keySet
    assert(ids.forall(id => !live.contains(id)),
      s"BPE RDDs ${ids.filter(live.contains)} survived clear()")
  }
}
