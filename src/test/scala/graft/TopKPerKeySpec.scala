package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.installTopK
import org.scalatest.funsuite.AnyFunSuite

/** The native top-k-per-key operator (plans/TopKPerKey.scala): the
  * optimizer rule must rewrite the rank-then-filter idiom — row_number(),
  * rank(), dense_rank() — into TopKPerKeyExec nodes, producing EXACTLY
  * the rows the stock window formulation produces (including tie
  * semantics for the rank modes); non-matching shapes must be left
  * alone. Baselines are materialized WITHOUT a filter (so the rule
  * cannot fire on them) and filtered on the driver. */
class TopKPerKeySpec extends AnyFunSuite {
  import TestSpark._

  private def orders = Tables.load(spark, sf, "orders")

  private val w =
    Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), asc("o_orderkey"))

  /** Full-window materialization + driver-side filter: the unrewritten
    * ground truth (asserts the rewrite stayed away). */
  private def baseline(df: DataFrame, rankCol: org.apache.spark.sql.Column,
      k: Int, sortCols: String*): Seq[Row] = {
    val full = df.withColumn("rn", rankCol.cast("long"))
    assert(!full.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "baseline must not be rewritten (it has no filter)")
    full.filter(col("rn") <= k).orderBy(sortCols.map(col): _*).collect().toSeq
  }

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
    val base = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    assert(topk.collect().toSeq ==
      baseline(base, row_number().over(w), 3, "o_custkey", "rn"))
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

  test("rank() and dense_rank() rewrite with exact tie semantics") {
    installTopK(spark)
    import spark.implicits._
    // heavy ties: 7 keys × values drawn from {0..4} — rank boundaries
    // routinely split inside tie groups, the case that separates
    // rank-retention from a k-row heap
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(500)(i => (i % 7L, rnd.nextInt(5).toDouble, i.toLong))
      .toDF("k", "v", "id").repartition(9)
    val tw = Window.partitionBy(col("k")).orderBy(asc("v"))
    for (kk <- Seq(1, 2, 3)) {
      val nativeRank = df.withColumn("rn", rank().over(tw)).filter(col("rn") <= kk)
      val pr = nativeRank.queryExecution.executedPlan.toString
      assert(pr.contains("TopKPerKeyFinal"), s"rank() not rewritten:\n$pr")
      assert(nativeRank.orderBy("k", "rn", "id").collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3).toLong)) ==
        baseline(df, rank().over(tw), kk, "k", "rn", "id")
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))),
        s"rank ties mismatch at k=$kk")
      val nativeDense = df.withColumn("rn", dense_rank().over(tw)).filter(col("rn") <= kk)
      val pd = nativeDense.queryExecution.executedPlan.toString
      assert(pd.contains("TopKPerKeyFinal"), s"dense_rank() not rewritten:\n$pd")
      assert(nativeDense.orderBy("k", "rn", "id").collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3).toLong)) ==
        baseline(df, dense_rank().over(tw), kk, "k", "rn", "id")
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))),
        s"dense_rank ties mismatch at k=$kk")
    }
  }

  test("rank bound inside a conjunction rewrites; unrelated conjuncts survive") {
    installTopK(spark)
    val topk = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("o_totalprice") > 1000.0)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"conjunction blocked the rewrite:\n$plan")
    val base = orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val expected = baseline(base, row_number().over(w), 3, "o_custkey", "rn")
      .filter(_.getAs[Double]("o_totalprice") > 1000.0)
    assert(topk.orderBy("o_custkey", "rn").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong)) ==
      expected.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))))
  }

  test("rn = 1 equality bound rewrites (keep-first dedup idiom)") {
    installTopK(spark)
    val first = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(first.queryExecution.executedPlan.toString.contains("TopKPerKeyFinal"))
    assert(first.groupBy("o_custkey").count().filter(col("count") =!= 1).count() == 0)
  }

  test("unsupported window functions are left alone") {
    installTopK(spark)
    // percent_rank is rank-like but not supported: must keep the window
    val pct = orders
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") <= 0.5)
    assert(!pct.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // multi-expression windows must not match either
    val multi = orders
      .select(col("o_custkey"), col("o_totalprice"),
        row_number().over(w).as("rn"), sum(col("o_totalprice")).over(w).as("s"))
      .filter(col("rn") <= 2)
    assert(!multi.queryExecution.executedPlan.toString.contains("TopKPerKey"))
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
    assert(native.orderBy("k", "rn").collect().toSeq
      .map(r => (r.get(0), r.get(1), r.getLong(2), r.getInt(3).toLong)) ==
      baseline(df, row_number().over(w), 2, "k", "rn")
        .map(r => (r.get(0), r.get(1), r.getLong(2), r.getLong(3))))
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
      assert(native.orderBy("k", "rn").collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3).toLong)) ==
        baseline(df, row_number().over(w), k, "k", "rn")
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))),
        s"mismatch at k=$k")
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
    val base = orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    assert(df.orderBy("o_custkey", "rn").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong)) ==
      baseline(base, row_number().over(w), 2, "o_custkey", "rn")
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))))
  }

  test("spotify chart derivation runs through the native top-k operator") {
    installTopK(spark)
    // the literal reference workload's rank<=k generation (SpotifyParity)
    // must hit the same rewrite as the hand-written idioms
    val q1 = queries.SpotifyParity.q1TrendingSongs(spark, sf)
    val plan = q1.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"chart derivation not rewritten:\n$plan")
    assert(q1.count() == 10)
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

  test("ANN probe-side ranks plan natively: q35/q49 carry no Window exec") {
    // the IVF nProbe rank, the IVF candidate rank and the LSH rerank are
    // all row_number-then-filter idioms — with the rewrite installed the
    // executed plans must contain ONLY TopKPerKey nodes, no WindowExec
    installTopK(spark)
    for (q <- Seq("q35_ann_ivf_topk", "q49_ann_lsh_topk")) {
      val df = SparkEntry.queries(q)(spark, TestSpark.sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKeyFinal"), s"$q not rewritten:\n$plan")
      assert(!plan.contains("Window "), s"$q still windows:\n$plan")
      assert(df.count() > 0)
    }
  }
}
