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

  test("null keys and null order values group and sort like the window exec") {
    installTopK(spark)
    import spark.implicits._
    // nulls in the key column must form ONE group (window PARTITION BY
    // semantics) and null order values sort per SortOrder null ordering
    val df = Seq[(java.lang.Long, java.lang.Double, Long)](
      (null, 5.0, 1L), (null, null, 2L), (null, 1.0, 3L),
      (1L, null, 4L), (1L, 2.0, 5L), (1L, 3.0, 6L), (2L, 9.0, 7L)
    ).toDF("k", "v", "id")
    val w = Window.partitionBy(col("k")).orderBy(asc("v"), asc("id"))
    val native = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(native.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
    val twin = df.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    assert(native.orderBy("k", "rn").collect().toSeq ==
      twin.orderBy("k", "rn").collect().toSeq)
  }

  test("randomized equivalence with the window formulation") {
    installTopK(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(2000)(i =>
      (rnd.nextInt(37).toLong, rnd.nextInt(1000).toDouble, i.toLong))
    val df = rows.toDF("k", "v", "id").repartition(13)
    for (k <- Seq(1, 4, 50)) {
      val w = Window.partitionBy(col("k")).orderBy(desc("v"), asc("id"))
      val native = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      assert(native.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
      val twin = df.withColumn("rn", rank().over(w)).filter(col("rn") <= k)
      assert(native.orderBy("k", "rn").collect().toSeq ==
        twin.orderBy("k", "rn").collect().toSeq, s"mismatch at k=$k")
    }
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
