package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnSearch

/** Fixture spec for X157 multi-probe LSH: at EQUAL table count the
  * probed candidate set strictly contains the single-probe set (the
  * memory-for-recall trade is real, not asserted), so measured recall
  * can only improve. */
class MultiProbeSpec extends AnyFunSuite {
  import TestSpark._

  test("multi-probe recall >= single-probe recall at equal tables") {
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    import org.apache.spark.sql.functions._
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val corpus = e.filter(col("vec_id") >= 10).select("vec_id", "embedding")
    val bf = AnnSearch.bruteForceTopK(queries, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(bf).size.toDouble / bf.size
    }
    val single = recall(AnnSearch.lshTopK(queries, corpus, k = 5,
      numTables = 4, planesPerTable = 6))
    val multi = recall(AnnSearch.lshMultiProbeTopK(queries, corpus, k = 5,
      numTables = 4, planesPerTable = 6))
    assert(multi >= single,
      s"multi-probe ($multi) must not lose to single-probe ($single)")
    assert(multi > 0.3, s"4-table multi-probe recall too low: $multi")
  }
}
