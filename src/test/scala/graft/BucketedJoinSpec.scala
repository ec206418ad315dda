package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Bucketed-table co-location: writing both join sides bucketed on the
  * join key must eliminate the per-query shuffle (no Exchange in the
  * physical plan), while producing identical results to the plain join. */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("join of two tables bucketed on the key plans without Exchange") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val orders = Tables.load(spark, sf, "orders")
    val customer = Tables.load(spark, sf, "customer")
    Sinks.writeBucketed(orders, "orders_b", s"$dir/orders_b", 8, Seq("o_custkey"))
    Sinks.writeBucketed(customer, "customer_b", s"$dir/customer_b", 8, Seq("c_custkey"))

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

    // disable broadcast so the join would otherwise need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      // the join subtree must be shuffle-free: both scans bucketed, and the
      // only Exchange in the plan is the post-join aggregation on a
      // different key (c_mktsegment), not the join keys
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.linesIterator.count(_.contains("Bucketed: true")) == 2,
        s"scans not bucketed:\n$plan")
      val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      val got = joined.orderBy("c_mktsegment").collect().map(_.toString).toSeq
      val want = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").collect().map(_.toString).toSeq
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
