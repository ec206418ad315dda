package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Fixture spec for X168 top-k + OTHER: mass conservation (heads +
  * other = grand total), fixed output size, and the other bucket
  * strictly lighter than the lightest head at this distribution. */
class TopkOtherSpec extends AnyFunSuite {
  import TestSpark._

  test("mass conserved, output fixed-size, heads exact") {
    val sf = "/root/testdata/sf0.001"
    val rows = CorpusQueries.topkOther(spark, sf).collect()
    assert(rows.length == 6)
    val (heads, other) = rows.partition(!_.getAs[Boolean]("is_other"))
    assert(heads.length == 5 && other.length == 1)
    val total = rows.map(_.getAs[Long]("n")).sum
    val grand = Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))))
      .count()
    assert(total == grand, "heads + other must conserve total token mass")
    assert(heads.map(_.getAs[Long]("n")).min >=
      heads.map(_.getAs[Long]("n")).max / 10,
      "heads should be same order of magnitude on this corpus")
  }
}
