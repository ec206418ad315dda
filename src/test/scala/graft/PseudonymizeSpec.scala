package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X143 pseudonymization: referential consistency —
  * the pseudonym-joined per-customer order counts must equal the
  * raw-key-joined counts (the transform loses no analytical signal),
  * while no raw key appears in the output. */
class PseudonymizeSpec extends AnyFunSuite {
  import TestSpark._

  test("pseudonym join preserves the raw-key join's top-10 counts") {
    val sf = "/root/testdata/sf0.001"
    val got = CorpusQueries.pseudonymize(spark, sf)
      .collect().map(r => (r.getAs[String]("segment"), r.getAs[Long]("n_orders")))
    val want = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "orders"),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"))
      .groupBy("c_custkey")
      .agg(org.apache.spark.sql.functions.min("c_mktsegment").as("segment"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_orders"))
      .orderBy(org.apache.spark.sql.functions.desc("n_orders"))
      .limit(10).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Long]("n_orders")))
    // counts multiset-equal (tie order among equal counts may differ
    // between pid order and custkey order — counts are the invariant)
    assert(got.map(_._2).sorted.toSeq == want.map(_._2).sorted.toSeq)
    // pseudonyms are 56-bit hashes, not raw custkeys: none below 2^40
    CorpusQueries.pseudonymize(spark, sf).collect()
      .foreach(r => assert(r.getAs[Long]("pid") > (1L << 40)))
  }
}
