package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, Skew}

/** Tolerance + merge-consistency specs for sketch aggregates, and
  * exactness specs for the skew-mitigation operators (which must produce
  * bit-identical results to their direct formulations). */
class SketchSkewSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val lineitem = Tables.load(spark, sf, "lineitem")

  test("salted collect_set equals direct collect_set") {
    val salted = Skew.saltedCollectSet(lineitem, "l_returnflag", "l_suppkey", salts = 8)
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val direct = lineitem.groupBy("l_returnflag")
      .agg(array_sort(collect_set(col("l_suppkey"))).as("l_suppkey_set"))
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    assert(salted == direct)
  }

  test("salted join equals plain inner join, and spreads the key over salts") {
    val li = lineitem.select(col("l_suppkey").as("suppkey"),
      col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val s = Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    val salted = Skew.saltedJoin(li, s, "suppkey", salts = 8)
      .select("suppkey", "l_orderkey", "l_linenumber", "s_name")
      .orderBy("suppkey", "l_orderkey", "l_linenumber")
      .collect().toSeq
    val plain = li.join(s, "suppkey")
      .select("suppkey", "l_orderkey", "l_linenumber", "s_name")
      .orderBy("suppkey", "l_orderkey", "l_linenumber")
      .collect().toSeq
    assert(salted == plain)
    // the exchange must hash on (key, salt), not the bare key — that is
    // the whole point: a hot key spreads over `salts` reducers
    val bcOff = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Skew.saltedJoin(li, s, "suppkey", salts = 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt column missing from plan:\n$plan")
      assert(plan.linesIterator.exists(l =>
        l.contains("hashpartitioning") && l.contains("suppkey") && l.contains("__salt")),
        s"exchange not keyed by (suppkey, __salt):\n$plan")
    } finally bcOff match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("two-phase distinct count equals count(DISTINCT)") {
    val twoPhase = Skew.distinctCountTwoPhase(lineitem, "l_returnflag", "l_suppkey")
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val direct = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(twoPhase == direct)
  }

  test("q-digest: rank error within bits·n/σ on every layout; deterministic") {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    import graft.functions.{QDigest, QDigestAgg}
    import spark.implicits._
    // skewed synthetic values in [0, 2^16): squares cluster mass low
    val vals = (0 until 20000).map(i => ((i.toLong * i) % 65536L))
    val bits = 16; val sigma = 256
    def estimate(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(exprColumn(
          QDigestAgg(columnExpr(col("v")), bits, sigma).toAggregateExpression()).as("sk"))
        .select(exprColumn(QDigest.Quantile(
          columnExpr(col("sk")), columnExpr(lit(0.5)), bits)))
        .head().getLong(0)
    val sorted = vals.sorted
    val n = vals.length
    val bound = bits.toDouble * n / sigma + 1
    for (parts <- Seq(1, 7, 32)) {
      val est = estimate(vals.toDF("v").repartition(parts))
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - math.ceil(0.5 * n)) <= bound,
        s"parts=$parts est=$est rank=$rank n=$n bound=$bound")
    }
    // same layout twice -> identical estimate (fully deterministic)
    val df1 = vals.toDF("v").coalesce(1)
    assert(estimate(df1) === estimate(df1))
  }

  test("q-digest: out-of-domain values clamp; constant column is exact") {
    import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
    import graft.functions.{QDigest, QDigestAgg}
    import spark.implicits._
    val df = Seq.fill(100)(42L).toDF("v")
    val est = df.agg(exprColumn(
        QDigestAgg(columnExpr(col("v")), 16, 64).toAggregateExpression()).as("sk"))
      .select(exprColumn(QDigest.Quantile(columnExpr(col("sk")), columnExpr(lit(0.5)), 16)))
      .head().getLong(0)
    assert(est === 42L)
    val clamped = Seq(-5L, 70000L).toDF("v")
      .agg(exprColumn(QDigestAgg(columnExpr(col("v")), 16, 64).toAggregateExpression()).as("sk"))
      .select(exprColumn(QDigest.Quantile(columnExpr(col("sk")), columnExpr(lit(1.0)), 16)))
      .head().getLong(0)
    assert(clamped === 65535L, "values above the domain saturate at 2^bits - 1")
  }

  test("HLL approx distinct within rsd tolerance of exact") {
    val approx = Sketches.approxDistinct(lineitem, "l_returnflag", "l_suppkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err < 0.15, s"$k: approx ${approx(k)} vs exact $n (err $err)")
    }
  }

  test("HLL sketches merge losslessly: union of per-group == direct global") {
    val perGroup = Sketches.hllSketches(lineitem, "l_returnflag", "l_suppkey")
    val merged = Sketches.hllMergeEstimate(perGroup).head().getLong(0)
    val direct = Sketches.hllDirectEstimate(lineitem, "l_suppkey").head().getLong(0)
    assert(merged == direct)
  }
}
