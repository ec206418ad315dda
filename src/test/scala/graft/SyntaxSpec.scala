package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.syntax._

/** The fluent facade forwards to the operators verbatim. */
class SyntaxSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val embeddings = Tables.load(spark, sf, "embeddings")

  test("dedup + components chain through the facade") {
    val pairs = docs.ngramJaccardPairs("doc_id", "text", threshold = 0.5)
    val direct = graft.operators.NearDup.ngramJaccardPairs(
      docs, "doc_id", "text", n = 3, threshold = 0.5)
    assert(pairs.orderBy("doc_a", "doc_b").collect().toSeq ==
      direct.orderBy("doc_a", "doc_b").collect().toSeq)
    val groups = docs.dupGroupsFrom(pairs)
    assert(groups.count() > 0)
  }

  test("skew-join + sampling paths forward correctly") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey"))
    val s = Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    assert(li.saltedJoin(s, "suppkey", salts = 4).count() ==
      li.join(s, "suppkey").count())
    val kept = docs.deterministicSample("doc_id", 0.3)
    assert(kept.count() ==
      graft.operators.Sampling.deterministicSample(docs, "doc_id", 0.3).count())
    assert(docs.stratifiedSample("lang", "doc_id",
      Map("en" -> 1.0), defaultRate = 0.0).count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("round-7 facade rows forward correctly") {
    val exact = docs.exciseDupSpansExact("doc_id", "text", minLen = 8)
    val direct = graft.operators.ChunkDedup
      .exciseDupSpansExact(docs, "doc_id", "text", 8)
    assert(exact.orderBy("doc_id").collect().toSeq ==
      direct.orderBy("doc_id").collect().toSeq)
    val wj = docs.weightedJaccardPairs("doc_id", "text", threshold = 0.5)
    assert(wj.count() == graft.operators.NearDup
      .weightedJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    val (merges, _) = docs.limit(50).trainBpeBytes("text", rounds = 2)
    assert(merges.size == 2 && merges.forall(_.left.matches("[0-9A-F]+")))
    val out = java.nio.file.Files.createTempDirectory("syntax-jsonl").toString
    val manifest = docs.limit(10).select("doc_id", "text")
      .exportJsonlTo(out, "doc_id", numShards = 2)
    assert(manifest.filter(col("shard") === -1L).head().getLong(1) == 10L)
  }

  test("similarity + percentile paths forward correctly") {
    val queries = embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val corpus = embeddings.filter(col("vec_id") >= 5).select("vec_id", "embedding")
    assert(corpus.bruteForceTopK(queries, k = 3).count() == 15)
    val p = Tables.load(spark, sf, "lineitem")
      .exactPercentiles("l_returnflag", "l_extendedprice", Seq("p50" -> 0.5))
    assert(p.count() == 3 && p.columns.toSeq == Seq("l_returnflag", "p50"))
  }

  test("versioning + graph + sketch paths forward correctly") {
    import spark.implicits._
    val older = Seq((1L, "x"), (2L, "y")).toDF("id", "c")
    val newer = Seq((2L, "y2"), (3L, "z")).toDF("id", "c")
    val diff = older.snapshotDiffAgainst(newer, "id", "c")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(1L -> "removed", 2L -> "changed", 3L -> "added"))
    val pr = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
      .pageRank(iters = 2)
    assert(pr.count() == 2)
    val kmv = Seq(("g", 7L), ("g", 7L), ("g", 9L)).toDF("k", "h")
      .kmvDistinctChecked("k", "h")
    assert(kmv.head().getLong(1) == 2L)
    val wp = Seq(("g", 1L, 3L), ("g", 5L, 1L)).toDF("k", "v", "c")
      .exactWeightedPercentiles("k", "v", "c", Seq("p50" -> 0.5))
    // values 1,1,1,5 -> pos 1.5 -> 1.0*(0.5)+1.0*0.5 = 1.0
    assert(wp.head().getDouble(1) == 1.0)
  }

  test("semantic-dedup + mining paths forward correctly") {
    val sem = embeddings.semDedup(numClusters = 3, threshold = 0.4)
    assert(sem.count() == embeddings.count())
    spark.sharedState.cacheManager.clearCache()
    val proto = embeddings.prototypicality(numClusters = 3)
    assert(proto.columns.toSeq ==
      Seq("vec_id", "centroid_id", "proto_score", "proto_rank", "n_cluster", "keep"))
    val q = embeddings.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("label").as("qlabel"))
    val hn = embeddings.filter(col("vec_id") >= 3).hardNegatives(q, k = 3)
    assert(hn.count() == 9)
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val inc = docs.filter(srcNum >= 10)
      .incrementalNearDupAgainst(docs.filter(srcNum < 10), "doc_id", "text")
    assert(inc.count() == docs.filter(srcNum >= 10).count())
  }

  test("round-9 image facade: perceptual hashes + hammingPairs match the query path") {
    import TestSpark.spark.implicits._
    val blobs = docs.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map(id =>
        (id, graft.operators.Multimodal.synthPng(id))))
      .toDF("doc_id", "blob")
    val hashes = blobs.imagePerceptualHashes()
    val pairs = hashes.hammingPairs("doc_id", "dhash", maxHamming = 3, bits = 56)
    val direct = graft.queries.CorpusQueries.imageNearDup(TestSpark.spark, sf)
    assert(pairs.orderBy("doc_a", "doc_b").collect().toSeq ==
      direct.collect().toSeq)
  }
}
