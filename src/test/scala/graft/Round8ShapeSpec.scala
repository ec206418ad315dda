package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.StarQueries

/** Edge-semantics fixtures for the round-8 subquery shapes — the cases
  * the SF-level hash gate exercises only in aggregate: Q21's three
  * exclusion rules, Q15's decimal tie set, Q20's correlated-empty-set
  * NULL drop. Each fixture is a hand-built micro-corpus written as
  * parquet so the queries run through the exact production entry point
  * (Tables.load). */
class Round8ShapeSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("r8shape").toString
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")

    // lineitem rows serve three queries at once; rows are routed by
    // orderkey (q193: only orders 1-4 exist with status), partkey
    // (q201: only parts 100/101 exist; 999 drops), shipdate (q200:
    // only Q1-1996 counts).
    Seq(
      // q193 order 1: supp 1 returns twice, supp 2 clean -> ONE late
      // supplier in a multi-supplier finished order: counted, numwait=2
      (1L, 999L, 1L, 10.0, 100.0, 0.0, "R", ts("1995-03-01")),
      (1L, 999L, 1L, 10.0, 100.0, 0.0, "R", ts("1995-03-02")),
      (1L, 999L, 2L, 10.0, 100.0, 0.0, "N", ts("1995-03-03")),
      // q193 order 2: SINGLE-supplier order with a return: excluded
      (2L, 999L, 1L, 10.0, 100.0, 0.0, "R", ts("1995-04-01")),
      // q193 order 3: BOTH suppliers return: excluded (not the only one)
      (3L, 999L, 1L, 10.0, 100.0, 0.0, "R", ts("1995-05-01")),
      (3L, 999L, 2L, 10.0, 100.0, 0.0, "R", ts("1995-05-02")),
      // q193 order 4: open order (status O): excluded by status
      (4L, 999L, 2L, 10.0, 100.0, 0.0, "N", ts("1995-06-01")),
      (4L, 999L, 3L, 10.0, 100.0, 0.0, "R", ts("1995-06-02")),
      // q201 (part 100, supp 1): avail 100, NO 1996 shipments ->
      // correlated sum over empty set is NULL -> comparison false ->
      // supplier 1 must NOT qualify
      (10L, 100L, 1L, 100.0, 50.0, 0.0, "N", ts("1995-07-01")),
      // q201 (part 100, supp 2): avail 100 vs 1996-shipped 5 ->
      // 100 > 8*5 -> qualifies (the June date also keeps q200 clean)
      (11L, 100L, 2L, 95.0, 50.0, 0.0, "N", ts("1995-07-02")),
      (12L, 100L, 2L, 5.0, 50.0, 0.0, "N", ts("1996-06-15")),
      // q201 (part 101, supp 3): huge excess but part is not in the
      // 'large%' family -> excluded by the semi filter
      (13L, 101L, 3L, 500.0, 50.0, 0.0, "N", ts("1995-08-01")),
      // q200: supp 1 and supp 2 with IDENTICAL price x discount inside
      // Q1-1996 -> exactly equal DECIMAL revenue -> both are the max
      (20L, 999L, 1L, 1.0, 1000.0, 0.1, "N", ts("1996-02-01")),
      (21L, 999L, 2L, 1.0, 1000.0, 0.1, "N", ts("1996-02-02")),
      // q200: supp 3 higher revenue but OUTSIDE the quarter
      (22L, 999L, 3L, 1.0, 9999.0, 0.0, "N", ts("1996-05-01")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")

    Seq((1L, "F"), (2L, "F"), (3L, "F"), (4L, "O"))
      .toDF("o_orderkey", "o_orderstatus")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, "S1", 10L), (2L, "S2", 10L), (3L, "S3", 10L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .write.parquet(s"$d/supplier.parquet")
    Seq((10L, "NATION_3", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq((100L, "large bolt"), (101L, "small bolt"))
      .toDF("p_partkey", "p_name")
      .write.parquet(s"$d/part.parquet")
    d
  }

  test("q193 Q21-shape: single-supplier, multi-late and open orders all excluded; numwait counts the late ROWS") {
    val rows = StarQueries.q193WaitingSupplier(spark, dir).collect()
    assert(rows.length == 1, rows.mkString(", "))
    assert(rows(0).getAs[String]("s_name") == "S1")
    assert(rows(0).getAs[Long]("numwait") == 2L) // both R rows of order 1
  }

  test("q200 Q15-shape: exactly-tied decimal revenues BOTH survive; out-of-window revenue invisible") {
    val rows = StarQueries.q200TopRevenueSupplier(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSeq == Seq(1L, 2L),
      rows.mkString(", "))
    // 1000.00 * (1 - 0.10) exactly, for both
    rows.foreach(r => assert(r.getAs[Double]("total_revenue") == 900.0))
  }

  test("q201 Q20-shape: empty 1996 correlation drops the pair (NULL compare), part family gates") {
    val rows = StarQueries.q201ExcessStock(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSeq == Seq(2L),
      rows.mkString(", "))
  }
}
