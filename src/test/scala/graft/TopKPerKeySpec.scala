package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.installTopK
import org.scalatest.funsuite.AnyFunSuite

/** The native top-k-per-key operator (plans/TopKPerKey.scala): the
  * optimizer rule must rewrite the row_number-then-filter idiom into
  * TopKPerKeyExec nodes, producing EXACTLY the rows the stock window
  * formulation produces; non-matching shapes must be left alone. */
class TopKPerKeySpec extends AnyFunSuite {
  import TestSpark._

  private def orders = Tables.load(spark, sf, "orders")

  private val w =
    Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), asc("o_orderkey"))

  /** Stock window formulation the rule intentionally does NOT match:
    * rank() over the same TOTAL order is row-for-row identical to
    * row_number() (no ties possible), but keeps Spark's Window exec. */
  private def expected(k: Int) = orders
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      rank().over(w).cast("long").as("rn"))
    .filter(col("rn") <= k)
    .orderBy("o_custkey", "rn")

  test("rewrite fires on the cast-and-project shape and matches the window result") {
    installTopK(spark)
    val topk = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rewrite did not fire:\n$plan")
    assert(plan.contains("TopKPerKeyPartial"), s"no partial prune:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    assert(topk.collect().toSeq == expected(3).collect().toSeq)
  }

  test("rewrite fires on the bare filter-over-window shape") {
    installTopK(spark)
    val topk = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1)
    assert(topk.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
    // exactly one row per customer, and it is that customer's max
    val perKey = topk.groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(perKey.filter(col("n") =!= 1).count() == 0)
    val maxes = orders.groupBy("o_custkey").agg(max("o_totalprice").as("mx"))
    assert(topk.join(maxes, "o_custkey")
      .filter(col("o_totalprice") =!= col("mx")).count() == 0)
  }

  test("rewrite leaves rank() alone") {
    installTopK(spark)
    val plan = expected(3).queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"),
      s"rank() must not be rewritten (ties semantics differ):\n$plan")
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit"),
      s"baseline lost its window exec:\n$plan")
  }

  test("SQL-text row_number top-k goes through the native operator") {
    installTopK(spark)
    Tables.registerAll(spark, sf)
    val df = spark.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"),
      "SQL window top-k not rewritten")
    val twin = spark.sql(
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         rank() OVER (PARTITION BY o_custkey
        |                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 2""".stripMargin)
    assert(df.orderBy("o_custkey", "rn").collect().toSeq ==
      twin.orderBy("o_custkey", "rn").collect().toSeq)
  }

  test("shuffle carries only pruned rows: partial sits below the exchange") {
    installTopK(spark)
    val topk = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    val plan = topk.queryExecution.executedPlan.toString
    val partialIdx = plan.indexOf("TopKPerKeyPartial")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(partialIdx >= 0 && exchangeIdx >= 0)
    // tree prints parents first: the exchange must appear ABOVE the
    // partial (smaller index) and BELOW the final
    assert(plan.indexOf("TopKPerKeyFinal") < exchangeIdx,
      s"exchange not between final and partial:\n$plan")
    assert(exchangeIdx < partialIdx,
      s"partial not below the exchange:\n$plan")
  }
}
