package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}

import graft.functions.{KmvAgg, QDigest, QDigestAgg}

/** Sketch aggregates — the mergeable-partial-state building block for
  * 100 TB rollups: per-partition/per-group sketches are tiny, exact to
  * merge, and re-aggregatable to any coarser grouping without rescanning
  * the raw data.
  *
  * Built on Spark's native Datasketches HLL expressions (codegen'd,
  * partial-aggregatable). Approximate outputs are spec-verified for
  * tolerance and merge-consistency rather than hash-matched (no
  * cross-engine oracle for sketch internals).
  */
object Sketches {

  /** Per-group approximate distinct count (HyperLogLog++, rsd default 5%). */
  def approxDistinct(df: DataFrame, key: String, value: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(col(key))
      .agg(approx_count_distinct(col(value), rsd).as(s"approx_n_$value"))

  /** Per-group approximate distinct next to the exact two-phase distinct
    * and a relative-error check column — the oracle-gateable shape: the
    * exact count and the (deterministic) tolerance verdict hash-match a
    * SQL oracle, while the estimate itself stays engine-internal. */
  def approxDistinctChecked(df: DataFrame, key: String, value: String,
      rsd: Double = 0.05, tol: Double = 0.15): DataFrame =
    df.groupBy(col(key))
      .agg(
        count_distinct(col(value)).as(s"n_distinct_$value"),
        approx_count_distinct(col(value), rsd).as("__est"))
      .select(col(key), col(s"n_distinct_$value"),
        (abs(col("__est").cast("double") /
          col(s"n_distinct_$value").cast("double") - 1.0) <= tol).as("approx_ok"))

  /** Per-group KMV bottom-k distinct sketch ([[graft.functions.KmvAgg]])
    * next to the exact distinct count, with the estimate DERIVED IN
    * COLUMN ARITHMETIC from the sketch's k-th order statistic — so,
    * unlike HLL register internals, the whole estimator is replayable by
    * a SQL oracle: est = (k−1)·2^56 / h_k (exact = buffer size when the
    * group has fewer than k distinct hashes). `hashCol` must be a 56-bit
    * `md5Hash56`-style hash column. The verdict column gates relative
    * error against `tol` (KMV CV ≈ 1/√(k−2); 64 → ~13% σ). */
  def kmvDistinctChecked(df: DataFrame, key: String, hashCol: String,
      k: Int = 64, tol: Double = 0.35): DataFrame = {
    val sk = df.groupBy(col(key)).agg(
      exprColumn(KmvAgg(columnExpr(col(hashCol)), k).toAggregateExpression()).as("__sk"),
      count_distinct(col(hashCol)).as("n_exact"))
    // 2^56 and (k-1)·2^56 are exactly representable doubles; the whole
    // estimate is one multiply + one divide on one order statistic —
    // bit-for-bit reproducible in any IEEE-754 engine.
    val est = when(size(col("__sk")) < k, size(col("__sk")).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(7.2057594037927936e16) /
        element_at(col("__sk"), k).cast("double"))
    sk.select(col(key), col("n_exact"), est.as("est"),
        (abs(est / col("n_exact").cast("double") - lit(1.0)) <= lit(tol)).as("est_ok"))
      .orderBy(col(key))
  }

  /** Sketch-based join preflight: estimate the distinct-key cardinality
    * of BOTH join sides, their union and their intersection from two
    * k-sized KMV bottom-k sketches — the O(k)-state answer to "how big
    * is this join, and how contained is A in B?" a planner or a
    * pipeline author asks BEFORE shuffling 100 TB. Intersection rides
    * inclusion–exclusion over the merged sketch (est_a + est_b −
    * est_union, clamped at 0); the sketch merge is the documented KMV
    * algebra (`slice(array_sort(array_union), 1, k)`), so the whole
    * preflight re-aggregates from per-side sketches without touching
    * the raw keys again. Every estimate is order-statistic arithmetic
    * on exact doubles — a SQL oracle replays it bit-for-bit — and the
    * verdict compares the intersection estimate to the exact overlap
    * (small-side join at probe scale; the production mode trusts the
    * sketch). */
  def joinPreflight(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      k: Int = 256, tol: Double = 0.35): DataFrame = {
    import graft.functions.TextFunctions
    def sketch(df: DataFrame, key: String) = df
      .select(TextFunctions.md5Hash56(col(key).cast("string")).as("__h"))
      .agg(exprColumn(KmvAgg(columnExpr(col("__h")), k)
          .toAggregateExpression()).as("sk"),
        count_distinct(col("__h")).as("nd"))
    def est(sk: org.apache.spark.sql.Column) =
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(7.2057594037927936e16) /
          element_at(sk, k).cast("double"))
    val sa = sketch(a, aKey).select(col("sk").as("ska"), col("nd").as("nd_a"))
    val sb = sketch(b, bKey).select(col("sk").as("skb"), col("nd").as("nd_b"))
    val exact = a.select(col(aKey).as("__k")).distinct()
      .join(b.select(col(bKey).as("__k")).distinct(), Seq("__k"))
      .agg(count(lit(1)).as("nd_intersect"))
    val merged = slice(array_sort(array_union(col("ska"), col("skb"))), 1, k)
    sa.crossJoin(sb).crossJoin(exact)
      .withColumn("est_a", est(col("ska")))
      .withColumn("est_b", est(col("skb")))
      .withColumn("est_union", est(merged))
      .withColumn("est_intersect",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("est_ok",
        abs(col("est_intersect") -
            col("nd_intersect").cast("double")) <=
          lit(tol) * greatest(col("nd_intersect").cast("double"), lit(1.0)))
      .select("nd_a", "nd_b", "nd_intersect", "est_a", "est_b",
        "est_union", "est_intersect", "est_ok")
  }

  /** Per-group q-digest quantile sketch next to exact interpolated
    * percentiles and a deterministic rank-error verdict — the
    * oracle-gateable shape ([[approxDistinctChecked]]'s pattern): exact
    * values and the verdict hash-match a SQL oracle, the sketch stays
    * engine-internal.
    *
    * `vLong` must be an integer column in [0, 2^bits) (callers scale —
    * e.g. price cents). For each requested fraction the sketch estimate's
    * TRUE rank (recomputed against the data) must sit within the
    * q-digest bound bits·n/σ of the target rank. */
  def qdigestChecked(df: DataFrame, key: String, vLong: String,
      fracs: Seq[(String, Double)], bits: Int = 24, sigma: Int = 2048): DataFrame =
    qdigestVerdict(
      qdigestEstimates(df, key, vLong, fracs, bits, sigma),
      qdigestProbes(df, key, vLong, fracs, bits, sigma),
      key, fracs, bits, sigma)

  /** The PRODUCTION half of [[qdigestChecked]]: one pass over the
    * stream into the per-group q-digest (partial-aggregated — one
    * O(σ·bits) digest per task crosses the exchange) and the requested
    * quantile estimates. This is what a deployment runs per corpus;
    * the exact-rank verification below is eval harness run once per
    * dataset (the q49-eval / q120-drain precedent — see
    * [[graft.queries.CorpusQueries.quantileSketch]] for the memoized
    * fixture and BENCHING.md for the `q80_verify_sec` artifact field). */
  def qdigestEstimates(df: DataFrame, key: String, vLong: String,
      fracs: Seq[(String, Double)], bits: Int = 24, sigma: Int = 2048): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val pre0 = df.select(col(key), col(vLong))
    // spread a narrow (few-file) scan before the imperative sketch agg —
    // file count is the cheap conservative width probe (see the round-10
    // note on .rdd materialization below); a wide cluster scan skips the
    // extra exchange. Single consumer now — no persist needed since the
    // verify pass moved to its own fixture.
    val pre = if (pre0.inputFiles.length < parts) pre0.repartition(parts)
              else pre0
    val sk = pre.groupBy(col(key)).agg(
      exprColumn(QDigestAgg(columnExpr(col(vLong)), bits, sigma)
        .toAggregateExpression()).as("__sk"),
      count(lit(1)).as("__n"))
    sk.select(
      col(key) +: col("__n") +: fracs.map { case (nm, f) =>
        exprColumn(QDigest.Quantile(columnExpr(col("__sk")), columnExpr(lit(f)), bits))
          .as(s"__est_$nm")
      }: _*)
  }

  /** The EVAL half of [[qdigestChecked]]: the per-group order
    * statistics at every probe rank the verdict needs — exact
    * interpolated-percentile brackets plus the rank-bound brackets —
    * reduced to ONE ≤|keys|-row table. A production recall/accuracy
    * eval computes this ONCE per dataset and scores every sketch
    * configuration against it, so callers memoize it as a fixture
    * (never per query). */
  def qdigestProbes(df: DataFrame, key: String, vLong: String,
      fracs: Seq[(String, Double)], bits: Int = 24, sigma: Int = 2048): DataFrame = {
    // The rank-bound verdict WITHOUT a recount pass: for integer rank
    // r and any estimate e, rank(e) = #{v ≤ e} satisfies
    //   rank(e) ≥ r  ⟺  e ≥ v_(r)      (r-th smallest, with ties)
    //   rank(e) ≤ r  ⟺  r ≥ n ∨ e < v_(r+1)
    // so "|rank(e) − ceil(f·n)| ≤ bits·n/σ + 1" is EXACTLY two order-
    // statistic comparisons at ranks ceil(tgt−bound) and
    // floor(tgt+bound)+1 — and those ride the SAME gridded ranking
    // pass as the percentile probes (two extra rank probes per
    // fraction), deleting the whole recount scan and its sequential
    // dependency on the sketch. Crucially the probe ranks depend only
    // on (fracs, bits, sigma) and per-key totals — NOT on the sketch —
    // which is what makes this half a memoizable fixture: it never has
    // to see the estimates it will judge. The sketch's domain contract
    // [0, 2^bits) hands the twin a free fixed grid — no stats pass
    // either ([[Percentiles.exactGridded]]'s shape, inlined because
    // the probe ranks are runtime expressions of the per-key total).
    // (Rounds 4-10 history: a globally value-compressed (key, v, count)
    // intermediate was built and REJECTED — near-continuous domains
    // barely compress; a shared persisted projection of the raw stream
    // won the round-10 A/B when sketch + grid were one timed query.
    // With the halves split, each pass persists only what IT reads
    // twice: here the bucketed projection, read by the offsets agg and
    // the ranked join.)
    val gridWidth = math.max(1.0, math.pow(2.0, (bits - 12).toDouble))
    // spread a narrow (few-file) scan before building the persisted
    // projection — same file-count probe as qdigestEstimates; without
    // it a single-file table computes and CACHES the bucketed stream
    // at 1-partition width and both consumers inherit it (the exact
    // round-10 regression the repartition was added to prevent)
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val pre0 = df.select(col(key), col(vLong))
    val pre = if (pre0.inputFiles.length < parts) pre0.repartition(parts)
              else pre0
    val bucketed = graft.Caching.tracked(
      pre.select(col(key), col(vLong).cast("double").as("__v"))
        .withColumn("__b", floor(col("__v") / lit(gridWidth)).cast("long")))
    val offsets = bucketed.groupBy(col(key), col("__b"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off",
        coalesce(sum("__bn").over(
          Window.partitionBy(key).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__kn", sum("__bn").over(Window.partitionBy(key)))
    // probe ranks, all as expressions of the per-key total __kn
    def tgt(f: Double): Column = ceil(lit(f) * col("__kn").cast("double"))
    val bnd = lit(bits.toDouble) * col("__kn").cast("double") /
      lit(sigma.toDouble) + lit(1.0)
    def clampRank(r: Column): Column =
      greatest(lit(1L), least(col("__kn"), r.cast("long")))
    val probeRanks: Seq[(String, Column)] = fracs.zipWithIndex.flatMap {
      case ((_, p), i) => Seq(
        s"__plo$i" -> (floor((col("__kn") - 1) * p) + 1).cast("long"),
        s"__phi$i" -> (ceil((col("__kn") - 1) * p) + 1).cast("long"),
        s"__pa$i" -> clampRank(ceil(tgt(p) - bnd)),
        s"__pb$i" -> clampRank(floor(tgt(p) + bnd) + 1))
    }
    val neededBuckets = offsets.filter(
      probeRanks.map { case (_, r) =>
        col("__off") < r && r <= col("__off") + col("__bn")
      }.reduce(_ || _))
      .select(col(key), col("__b"), col("__off"), col("__kn"))
    val wLocal = Window.partitionBy(col(key), col("__b")).orderBy("__v")
    val ranked = bucketed
      .join(broadcast(neededBuckets), Seq(key, "__b"))
      .withColumn("__rn", col("__off") + row_number().over(wLocal))
    val aggs = probeRanks.map { case (nm, r) =>
      max(when(col("__rn") === r, col("__v"))).as(nm)
    } :+ max(col("__kn")).as("__kn0")
    ranked.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
  }

  /** Join the production estimates ([[qdigestEstimates]]) with the
    * probe fixture ([[qdigestProbes]]) — two ≤|keys|-row tables — into
    * the oracle-shaped output: exact interpolated percentiles plus the
    * rank-bound `est_ok` verdict. Pure broadcast-join + column
    * arithmetic; the heavy passes both happened upstream. */
  def qdigestVerdict(ests: DataFrame, pcts: DataFrame, key: String,
      fracs: Seq[(String, Double)], bits: Int = 24, sigma: Int = 2048): DataFrame = {
    val kn0 = col("__kn0").cast("double")
    val bnd0 = lit(bits.toDouble) * kn0 / lit(sigma.toDouble) + lit(1.0)
    val okCols = fracs.zipWithIndex.map { case ((nm, f), i) =>
      val t = ceil(lit(f) * kn0)
      val lowOk = (ceil(t - bnd0) <= lit(0.0)) ||
        (col(s"__est_$nm") >= col(s"__pa$i"))
      val highOk = (floor(t + bnd0) >= kn0) ||
        (col(s"__est_$nm") < col(s"__pb$i"))
      lowOk && highOk
    }
    val pCols = fracs.zipWithIndex.map { case ((nm, p), i) =>
      val f = (kn0 - 1) * p - floor((kn0 - 1) * p)
      (col(s"__plo$i") * (lit(1.0) - f) + col(s"__phi$i") * f).as(nm)
    }
    pcts.join(broadcast(ests), Seq(key))
      .select(col(key) +: pCols :+ okCols.reduce(_ && _).as("est_ok"): _*)
  }

  /** Per-group HLL sketch blobs — the storable/mergeable form. */
  def hllSketches(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(col(key))
      .agg(hll_sketch_agg(col(value)).as("sketch"))

  /** Merge per-group sketches to one global estimate — proves the rollup
    * path: estimate(union(group sketches)) == estimate(direct sketch). */
  def hllMergeEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"))).as("merged_estimate"))

  /** Direct global estimate, for merge-consistency checks. */
  def hllDirectEstimate(df: DataFrame, value: String): DataFrame =
    df.agg(hll_sketch_estimate(hll_sketch_agg(col(value))).as("direct_estimate"))

  /** Trailing-`windowDays` distinct keys per day from MERGED daily KMV
    * sketches — the re-aggregatable-rollup pattern at its purest: the
    * raw stream is folded ONCE into per-day O(k) sketches, and every
    * sliding window is answered by sketch-merge algebra
    * (`slice(array_sort(array_distinct(flatten(...))), 1, k)` — the
    * X126 documented KMV merge), never by rescanning events. At 100 TB
    * the daily sketches are the only thing retained; a year of trailing
    * windows costs 365 × O(k) merges.
    *
    * Estimates are the X67 order-statistic arithmetic (exact doubles →
    * hash-matchable), and EXACT whenever the merged sketch is sub-k —
    * so at k ≥ window cardinality this is an exact sliding
    * COUNT(DISTINCT) maintained incrementally. Windows are DATE-range
    * scoped via a tiny broadcast day-range join (not a rows-frame: gap
    * days must shrink the window's content, not slide it). */
  def kmvSlidingDailyDistinct(events: DataFrame, keyCol: String,
      tsCol: String, k: Int = 256, windowDays: Int = 7): DataFrame =
    slidingFromDailySketches(
      kmvDailySketches(events, keyCol, tsCol, k), k, windowDays)

  /** The per-day O(k) sketch table alone — the state a streaming ingest
    * maintains ([[graft.streaming.CorpusStreams.slidingDistinctIngest]]);
    * merge two tables' same-day rows with the X126 algebra. */
  def kmvDailySketches(events: DataFrame, keyCol: String, tsCol: String,
      k: Int): DataFrame = {
    val h = graft.functions.TextFunctions.md5Hash56(col(keyCol).cast("string"))
    events
      .select(date_trunc("DAY", col(tsCol)).cast("date").as("day"), h.as("__h"))
      .groupBy("day")
      .agg(exprColumn(KmvAgg(columnExpr(col("__h")), k)
        .toAggregateExpression()).as("sk"))
  }

  /** Sliding windows over an existing (day, sk) sketch table. */
  def slidingFromDailySketches(daily: DataFrame, k: Int,
      windowDays: Int): DataFrame = {
    val days = daily.select(col("day").as("wday"))
    val est = when(size(col("m")) < k, size(col("m")).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(7.2057594037927936e16) /
        element_at(col("m"), k).cast("double"))
    daily
      .join(broadcast(days),
        datediff(col("wday"), col("day")).between(0, windowDays - 1))
      .groupBy(col("wday").as("day"))
      .agg(count(lit(1)).as("n_days"),
        slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))),
          1, k).as("m"))
      .select(col("day"), col("n_days"), est.as("est_distinct"),
        (size(col("m")) < k).as("is_exact"))
      .orderBy("day")
  }

  /** Exact φ=1/k heavy hitters via Misra–Gries prefilter
    * ([[graft.functions.MisraGriesAgg]]): items whose true frequency
    * exceeds n/k, with their EXACT counts.
    *
    * Three-stage shape, none of which shuffles the full item cardinality:
    *   1. ONE pass folds every partition into a ≤k-counter MG summary
    *      (partial aggregation; the exchange carries ≤k strings per map
    *      task) alongside the total item count — the MG guarantee says
    *      the summary ⊇ every item with count > n/k;
    *   2. the ≤k candidates broadcast into a semi-join that restricts the
    *      recount to candidate rows only — the heavy tail (at web scale,
    *      billions of near-unique items) is filtered BEFORE the exchange,
    *      so the recount aggregate's key space is ≤k, not |vocab|;
    *   3. the exact filter `cnt · k > n` is integer arithmetic — the
    *      output is exact, not an estimate, and the DuckDB twin (a plain
    *      GROUP BY + HAVING) hash-matches bit-for-bit.
    *
    * Contrast with an exact global top-k (full-vocab shuffle, no bound on
    * reducer state) and with CMS top-k (X22's q73: estimate-valued,
    * tolerance-gated): this is the 100 TB pattern that is BOTH bounded
    * and exact. */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int = 64): DataFrame = {
    val it = items.select(col(itemCol).cast("string").as("item"))
    val pre = it.agg(
      exprColumn(graft.functions.MisraGriesAgg(columnExpr(col("item")), k)
        .toAggregateExpression()).as("__cand"),
      count(lit(1)).as("__n"))
    val cand = pre.select(explode(col("__cand")).as("item"), col("__n"))
    it.join(broadcast(cand), Seq("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"), min("__n").as("n_total"))
      .where(col("cnt") * lit(k.toLong) > col("n_total"))
      .orderBy(desc("cnt"), col("item"))
  }
}
