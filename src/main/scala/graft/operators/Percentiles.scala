package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles via parallel ranking instead of Spark's
  * holistic `percentile` aggregate.
  *
  * The built-in buffers every (value → count) per group in an in-memory
  * map and sorts it single-threaded at eval — 5+ s for 600k rows at
  * sf0.1, and a scale hazard (group state ∝ group cardinality). A naive
  * row_number window is better but sorts each key in ONE task — with few
  * huge groups (the common shape: 3 returnflags, a handful of tenants)
  * parallelism collapses to |keys|.
  *
  * This formulation keeps every stage wide:
  *  1. per-key (count, min, max) — map-side-combined hash agg, broadcast
  *     back onto the stream;
  *  2. each row gets a value-range bucket `floor((v-min)/(max-min)·B)`;
  *     bucket id is a monotone deterministic function of v, so per-key
  *     global order = (bucket, within-bucket order) — equal values land
  *     in the same bucket, and interpolation only reads v at a rank, so
  *     tie order inside a bucket is immaterial;
  *  3. bucket sizes (hash agg) → cumulative offsets (window over the
  *     TINY |keys|·B table);
  *  4. row_number windows partitioned by (key, bucket) — |keys|·B
  *     concurrent sorts of ~n/B rows instead of |keys| sorts of n;
  *     global rank = bucket offset + local rank;
  *  5. rows not at a requested bracketing rank are filtered before the
  *     final agg, which interpolates v_lo*(1-frac) + v_hi*frac at
  *     position p*(n-1) — the exact expression `percentile` / DuckDB
  *     `quantile_cont` evaluate (the algebraically equal
  *     v_lo + (v_hi-v_lo)*frac form differs in the last float bits).
  *
  * DEGENERATE-DOMAIN BOUND (round 15, the whole gridded family —
  * [[exact]], [[exactGridded]], [[equiDepthGridded]], and the
  * winsorized/clipped riders): bucketing assumes the VALUE DOMAIN
  * SPREADS across the grid. If a key's values collapse into one grid
  * cell (a constant-price feed, a saturated sensor), every bracketing
  * rank lands in that cell and its per-(key, cell) rank window
  * processes that key's whole stream in ONE task — O(n_key) worst
  * case, the documented bound (results stay exact; Round15Spec pins
  * the constant-value point). The mitigation for a KNOWN-degenerate
  * low-cardinality domain is not a finer grid (a constant collapses
  * any value-derived grid) but count-compression: [[exactWeighted]]
  * reduces the stream to (key, value, count) first, and a constant
  * column compresses to ONE row per key. Callers with heavy value
  * ties should route there (X71); the gridded family keeps the
  * value-spread contract because its riders (winsorize sums, equi-depth
  * cell stats) need per-row passes the compressed form cannot carry. */
object Percentiles {

  /** One output row per key: `p<NN>` columns for each requested fraction.
    *
    * `numBuckets` is purely a partitioning device — results are
    * identical for any B (interpolation reads exact values at exact
    * ranks). It sets the fraction of rows the ranking window touches:
    * only buckets CONTAINING a bracketing rank are ranked (≤ 2P per
    * key), so the window exchange carries ~2P/B of the stream. B=2048
    * makes that a rounding error (measured vs B=32, which windowed
    * ~44% of the rows: the whole operator drops ~35% at sf0.1) while
    * the per-(key,bucket) offset table stays tiny (|keys|·B rows). */
  def exact(df: DataFrame, key: String, value: String,
      ps: Seq[(String, Double)], numBuckets: Int = 2048): DataFrame = {
    val vals = df.select(col(key), col(value).cast("double").as("__v"))
    val stats = vals.groupBy(col(key)).agg(
      count(lit(1)).as("__n"), min("__v").as("__mn"), max("__v").as("__mx"))

    val bkt = when(col("__mx") === col("__mn"), lit(0)).otherwise(
      least(floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn"))
        * numBuckets), lit(numBuckets - 1))).cast("int")
    val bucketed = vals.join(broadcast(stats), Seq(key)).withColumn("__b", bkt)

    // per-(key, bucket) sizes → exclusive prefix offsets; |keys|·B rows
    val offsets = bucketed.groupBy(col(key), col("__b"))
      .agg(count(lit(1)).as("__bn"), max("__n").as("__kn"))
      .withColumn("__off",
        coalesce(sum("__bn").over(
          Window.partitionBy(key).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(key), col("__b"), col("__bn"), col("__kn"), col("__off"))

    def pos(p: Double): Column = (col("__n") - 1) * p

    // Only buckets that CONTAIN a bracketing rank need ranking: with P
    // requested fractions that is ≤ 2P buckets per key, so the window
    // shuffle below carries ~2P/B of the rows instead of all of them.
    // (A monotone bucket function means global rank r lives in the unique
    // bucket with __off < r ≤ __off + __bn.)
    val neededBuckets = offsets.filter(
      ps.map { case (_, p) =>
        val kpos = (col("__kn") - 1) * p
        val lo = floor(kpos) + 1
        val hi = ceil(kpos) + 1
        (col("__off") < lo && lo <= col("__off") + col("__bn")) ||
          (col("__off") < hi && hi <= col("__off") + col("__bn"))
      }.reduce(_ || _))
      .select(col(key), col("__b"), col("__off"))

    val wLocal = Window.partitionBy(col(key), col("__b")).orderBy("__v")
    val ranked = bucketed
      .join(broadcast(neededBuckets), Seq(key, "__b"))
      .withColumn("__lrn", row_number().over(wLocal))
      .withColumn("__rn", col("__off") + col("__lrn"))
    val needed = ps.map { case (_, p) =>
      col("__rn") === floor(pos(p)) + 1 || col("__rn") === ceil(pos(p)) + 1
    }.reduce(_ || _)
    val aggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      Seq(
        max(when(col("__rn") === floor(pos(p)) + 1, col("__v"))).as(s"__lo$i"),
        max(when(col("__rn") === ceil(pos(p)) + 1, col("__v"))).as(s"__hi$i"),
        max(pos(p) - floor(pos(p))).as(s"__f$i"))
    }
    val outCols = col(key) +: ps.zipWithIndex.map { case ((name, _), i) =>
      (col(s"__lo$i") * (lit(1.0) - col(s"__f$i")) + col(s"__hi$i") * col(s"__f$i")).as(name)
    }
    ranked.filter(needed)
      .groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
  }

  /** Exact interpolated percentiles over a PRE-COMPRESSED
    * (key, value, count) table — the right shape when the value domain
    * is low-cardinality (integer token counts, ratings, codes): the
    * corpus-sized stream is reduced ONCE by a map-side-combinable hash
    * agg and every subsequent step touches only O(|keys|·|domain|)
    * rows, with no per-row ranking windows at all. A (key, v) row
    * covers global ranks (cum−c, cum]; the bracketing ranks
    * floor/ceil((n−1)·p)+1 each land in exactly one row. Interpolation
    * is the same `v_lo·(1−f) + v_hi·f` expression as [[exact]] — the
    * form `quantile_cont` evaluates, bit-for-bit. */
  def exactWeighted(cnts: DataFrame, key: String, value: String, cnt: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val base = cnts.select(col(key), col(value).cast("double").as("__v"),
      col(cnt).cast("long").as("__c"))
    // both windows share ONE partitioning + sort (Spark plans them as
    // stacked WindowExecs over a single exchange/sort of the compressed
    // stream) — A/B'd against a groupBy-total + broadcast join for __n,
    // which was ~0.4 s/call SLOWER at sf0.1: the extra driver-synced
    // broadcast job outweighs the second in-memory window sweep on a
    // table that is compressed to |keys|·|domain| rows by contract
    val w = Window.partitionBy(key).orderBy("__v")
    val cum = base
      .withColumn("__end", sum("__c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__c").over(Window.partitionBy(key)))
      .withColumn("__start", col("__end") - col("__c"))
    def pos(p: Double): Column = (col("__n") - 1) * p
    val aggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      val lo = floor(pos(p)) + 1
      val hi = ceil(pos(p)) + 1
      Seq(
        max(when(col("__start") < lo && lo <= col("__end"), col("__v"))).as(s"__lo$i"),
        max(when(col("__start") < hi && hi <= col("__end"), col("__v"))).as(s"__hi$i"),
        max(pos(p) - floor(pos(p))).as(s"__f$i"))
    }
    val outCols = col(key) +: ps.zipWithIndex.map { case ((name, _), i) =>
      (col(s"__lo$i") * (lit(1.0) - col(s"__f$i")) + col(s"__hi$i") * col(s"__f$i")).as(name)
    }
    cum.groupBy(col(key)).agg(aggs.head, aggs.tail: _*).select(outCols: _*)
  }

  /** [[exact]] minus the stats pass: buckets come from a FIXED value
    * grid `floor(v / gridWidth)` instead of the per-key min/max range,
    * removing one sequential broadcast job from the plan (the stats
    * agg had to finish before bucketing could start — at local SF that
    * driver sync is a measurable slice of the whole query; at cluster
    * SF it is one fewer barrier). Correctness is width-independent:
    * the bucket id is a monotone function of v, which is the only
    * property the rank arithmetic uses — `gridWidth` just sets bucket
    * occupancy (pick it so a bucket holds ~thousands of rows; skewed
    * buckets cost balance, never answers). Per-key totals ride the
    * same tiny offsets table (one extra window over |keys|·B rows). */
  def exactGridded(df: DataFrame, key: String, value: String,
      ps: Seq[(String, Double)], gridWidth: Double): DataFrame = {
    require(gridWidth > 0, s"gridWidth=$gridWidth must be positive")
    val base = df.select(col(key), col(value).cast("double").as("__v"))
    val bucketed = base.withColumn("__b",
      floor(col("__v") / lit(gridWidth)).cast("long"))
    val offsets = bucketed.groupBy(col(key), col("__b"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off",
        coalesce(sum("__bn").over(
          Window.partitionBy(key).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__kn", sum("__bn").over(Window.partitionBy(key)))
    val neededBuckets = offsets.filter(
      ps.map { case (_, p) =>
        val kpos = (col("__kn") - 1) * p
        val lo = floor(kpos) + 1
        val hi = ceil(kpos) + 1
        (col("__off") < lo && lo <= col("__off") + col("__bn")) ||
          (col("__off") < hi && hi <= col("__off") + col("__bn"))
      }.reduce(_ || _))
      .select(col(key), col("__b"), col("__off"), col("__kn"))
    def pos(p: Double): Column = (col("__kn") - 1) * p
    val wLocal = Window.partitionBy(col(key), col("__b")).orderBy("__v")
    val ranked = bucketed
      .join(broadcast(neededBuckets), Seq(key, "__b"))
      .withColumn("__rn", col("__off") + row_number().over(wLocal))
    val aggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      Seq(
        max(when(col("__rn") === floor(pos(p)) + 1, col("__v"))).as(s"__lo$i"),
        max(when(col("__rn") === ceil(pos(p)) + 1, col("__v"))).as(s"__hi$i"),
        max(pos(p) - floor(pos(p))).as(s"__f$i"))
    }
    val outCols = col(key) +: ps.zipWithIndex.map { case ((name, _), i) =>
      (col(s"__lo$i") * (lit(1.0) - col(s"__f$i")) + col(s"__hi$i") * col(s"__f$i")).as(name)
    }
    ranked.groupBy(col(key)).agg(aggs.head, aggs.tail: _*).select(outCols: _*)
  }

  /** Fused equi-depth histogram (round 9, VERDICT item 2): boundary
    * derivation AND bucket counting off ONE grid-cell aggregate of the
    * raw stream — the q80/q161 "ride the gridded ranking pass" identity
    * applied to q91. The former formulation ran [[exactGridded]] (grid
    * agg + bracketing-rank probe) and then re-scanned the raw stream a
    * THIRD time to count rows per boundary bucket; but the grid-cell
    * table already knows every cell's (count, min, max), and a cell can
    * straddle an octile boundary ONLY if it brackets that boundary's
    * interpolation ranks (boundaries interpolate between CONSECUTIVE
    * ranks, so no data value lies strictly between the bracketing
    * values — any straddling cell contains one of them and is therefore
    * a probed cell). Hence:
    *   - non-probed cells roll up WHOLE into their bucket
    *     (Σ[min ≥ bₖ] = Σ[max ≥ bₖ] there), count/lo/hi from cell stats;
    *   - probed cells' rows are already materialized by the ranking
    *     window — the same subplan assigns them per-row buckets, and
    *     ReuseExchange materializes its exchange once.
    * Two raw scans total (cell agg + probe filter), both wide; every
    * other stage is |keys|·B-bounded. Results are value-identical to
    * the unfused plan for any grid width. Output: one row per (key,
    * bucket) — (n, lo, hi).
    *
    * CACHING CONTRACT: the returned plan reads two persisted
    * intermediates (the |keys|·B offsets table and the probed-cell
    * rows) for its lifetime — lazy evaluation makes an eager unpersist
    * here wrong, so callers own the release. Loop-invoking library
    * callers must sweep query-local caches between invocations
    * (`sparkContext.getPersistentRDDs` minus their own pins, as
    * graft.Bench's sweep does) or cached blocks accumulate for the
    * session; the benchmark/verify harnesses already do. */
  def equiDepthGridded(df: DataFrame, key: String, value: String,
      nBuckets: Int, gridWidth: Double): DataFrame = {
    require(gridWidth > 0 && nBuckets > 1)
    val fracs = (1 until nBuckets).map(i => (s"__p$i", i.toDouble / nBuckets))
    val base = df.select(col(key), col(value).cast("double").as("__v"))
    val bucketed = base.withColumn("__b",
      floor(col("__v") / lit(gridWidth)).cast("long"))
    val cells = bucketed.groupBy(col(key), col("__b"))
      .agg(count(lit(1)).as("__bn"), min("__v").as("__mn"), max("__v").as("__mx"))
    // the cell table feeds FOUR consumers (probe filter, its negation,
    // and through them both histogram parts) that also self-reference
    // through broadcasts — without a persist Spark re-derives the whole
    // scan+agg+window subtree per consumer (measured: 7 raw scans, 10
    // windows in the static plan). It is |keys|·B rows by contract —
    // pinning it is control-plane cost, like the bounds broadcast.
    val offsets = graft.Caching.tracked(cells
      .withColumn("__off",
        coalesce(sum("__bn").over(
          Window.partitionBy(key).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__kn", sum("__bn").over(Window.partitionBy(key))))
    val isNeeded = fracs.map { case (_, p) =>
      val kpos = (col("__kn") - 1) * p
      val lo = floor(kpos) + 1
      val hi = ceil(kpos) + 1
      (col("__off") < lo && lo <= col("__off") + col("__bn")) ||
        (col("__off") < hi && hi <= col("__off") + col("__bn"))
    }.reduce(_ || _)
    val needed = offsets.filter(isNeeded)
      .select(col(key), col("__b"), col("__off"), col("__kn"))
    val wLocal = Window.partitionBy(col(key), col("__b")).orderBy("__v")
    // ranked = only the probed cells' rows (≤ 2·(nBuckets−1) cells per
    // key); persisted because both the boundary agg and the row-level
    // histogram part read it — without the pin the raw scan + filter
    // join + window run twice
    val ranked = graft.Caching.tracked(bucketed
      .join(broadcast(needed), Seq(key, "__b"))
      .withColumn("__rn", col("__off") + row_number().over(wLocal)))
    def pos(p: Double): Column = (col("__kn") - 1) * p
    val aggs = fracs.zipWithIndex.flatMap { case ((_, p), i) =>
      Seq(
        max(when(col("__rn") === floor(pos(p)) + 1, col("__v"))).as(s"__lo$i"),
        max(when(col("__rn") === ceil(pos(p)) + 1, col("__v"))).as(s"__hi$i"),
        max(pos(p) - floor(pos(p))).as(s"__f$i"))
    }
    val bounds = ranked.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
      .select(col(key) +: fracs.zipWithIndex.map { case ((name, _), i) =>
        (col(s"__lo$i") * (lit(1.0) - col(s"__f$i")) +
          col(s"__hi$i") * col(s"__f$i")).as(name)
      }: _*)
    def bucketOf(v: Column): Column = fracs.map { case (nm, _) =>
      when(v >= col(nm), lit(1L)).otherwise(lit(0L))
    }.reduceLeft(_ + _)
    // probed cells re-aggregate from their ranked rows; whole cells from
    // cell stats (their bucket is constant: no boundary strictly inside)
    val rowPart = ranked
      .join(broadcast(bounds), Seq(key))
      .select(col(key), bucketOf(col("__v")).as("__bucket"),
        lit(1L).as("__n"), col("__v").as("__lo"), col("__v").as("__hi"))
    val cellPart = offsets.filter(!isNeeded)
      .join(broadcast(bounds), Seq(key))
      .select(col(key), bucketOf(col("__mn")).as("__bucket"),
        col("__bn").as("__n"), col("__mn").as("__lo"), col("__mx").as("__hi"))
    rowPart.unionAll(cellPart)
      .groupBy(col(key), col("__bucket").as("bucket"))
      .agg(sum("__n").as("n"), min("__lo").as("lo"), max("__hi").as("hi"))
  }

  /** Order statistics at CALLER-SUPPLIED integer ranks — the
    * [[exactGridded]] machinery with each probe rank an arbitrary
    * expression of the per-key total (so nearest-rank cut formulas
    * like `(5n+99) div 100` probe exactly, no fraction rounding in
    * between). Returns one row per key: the value at each probed rank
    * plus the key's total `n`. Same plan shape as [[exactGridded]]:
    * no stats pass, only bracketing buckets are ranked. */
  def valuesAtRanks(df: DataFrame, key: String, value: String,
      probes: Seq[(String, Column => Column)],
      gridWidth: Double): DataFrame = {
    require(gridWidth > 0, s"gridWidth=$gridWidth must be positive")
    val base = df.select(col(key), col(value).cast("double").as("__v"))
    val bucketed = base.withColumn("__b",
      floor(col("__v") / lit(gridWidth)).cast("long"))
    val offsets = bucketed.groupBy(col(key), col("__b"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off",
        coalesce(sum("__bn").over(
          Window.partitionBy(key).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__kn", sum("__bn").over(Window.partitionBy(key)))
    val kn = col("__kn")
    val neededBuckets = offsets.filter(
      probes.map { case (_, r) =>
        col("__off") < r(kn) && r(kn) <= col("__off") + col("__bn")
      }.reduce(_ || _))
      .select(col(key), col("__b"), col("__off"), col("__kn"))
    val wLocal = Window.partitionBy(col(key), col("__b")).orderBy("__v")
    val ranked = bucketed
      .join(broadcast(neededBuckets), Seq(key, "__b"))
      .withColumn("__rn", col("__off") + row_number().over(wLocal))
    val aggs = probes.map { case (nm, r) =>
      max(when(col("__rn") === r(kn), col("__v"))).as(nm)
    } :+ max(kn).as("__n")
    ranked.groupBy(col(key)).agg(aggs.head, aggs.tail: _*)
      .select(col(key) +: probes.map { case (nm, _) => col(nm) } :+
        col("__n").as("n"): _*)
  }

  /** [[exactWeighted]] for a compressed table that is still LARGE (a
    * near-continuous value domain — prices, amounts — where compression
    * buys little): [[exactWeighted]]'s per-key cumulative window sorts
    * each key's whole domain in ONE task, so with few keys parallelism
    * collapses to |keys| exactly like the raw row_number plan [[exact]]
    * exists to avoid. Same cure as [[exact]], applied to weights:
    *  1. per-key (Σcount, min, max) — one hash agg over the compressed
    *     table (map-side combined, wide);
    *  2. monotone value-range bucket per row; per-(key, bucket) weight
    *     sums → cumulative offsets over the TINY |keys|·B table;
    *  3. only buckets CONTAINING a bracketing rank (≤ 2P per key) get
    *     the weighted cumulative window — it touches ~2P/B of the
    *     compressed rows, every other stage is a wide hash agg;
    *  4. a (key, v, c) row covers global ranks (__off + local cum − c,
    *     __off + local cum]; interpolation is the identical
    *     `v_lo·(1−f) + v_hi·f` — results are bit-for-bit
    *     [[exactWeighted]]'s for any B. */
  def exactWeightedBucketed(cnts: DataFrame, key: String, value: String,
      cnt: String, ps: Seq[(String, Double)],
      numBuckets: Int = 2048): DataFrame = {
    val base = cnts.select(col(key), col(value).cast("double").as("__v"),
      col(cnt).cast("long").as("__c"))
    val stats = base.groupBy(col(key)).agg(
      sum("__c").as("__n"), min("__v").as("__mn"), max("__v").as("__mx"))
    val bkt = when(col("__mx") === col("__mn"), lit(0)).otherwise(
      least(floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn"))
        * numBuckets), lit(numBuckets - 1))).cast("int")
    val bucketed = base.join(broadcast(stats), Seq(key)).withColumn("__b", bkt)
    val offsets = bucketed.groupBy(col(key), col("__b"))
      .agg(sum("__c").as("__bn"), max("__n").as("__kn"))
      .withColumn("__off",
        coalesce(sum("__bn").over(
          Window.partitionBy(key).orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    def pos(p: Double): Column = (col("__n") - 1) * p
    // the row covering global rank r lies in the unique bucket with
    // __off < r ≤ __off + __bn (bucket id is monotone in v, so a
    // bucket's rows are contiguous in global rank order)
    val neededBuckets = offsets
      .filter(ps.map { case (_, p) =>
        val kpos = (col("__kn") - 1) * p
        val lo = floor(kpos) + 1
        val hi = ceil(kpos) + 1
        (col("__off") < lo && lo <= col("__off") + col("__bn")) ||
          (col("__off") < hi && hi <= col("__off") + col("__bn"))
      }.reduce(_ || _))
      .select(col(key), col("__b"), col("__off"))
    val wLocal = Window.partitionBy(col(key), col("__b")).orderBy("__v")
    val ranked = bucketed
      .join(broadcast(neededBuckets), Seq(key, "__b"))
      .withColumn("__end", col("__off") + sum("__c").over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__start", col("__end") - col("__c"))
    val aggs = ps.zipWithIndex.flatMap { case ((_, p), i) =>
      val lo = floor(pos(p)) + 1
      val hi = ceil(pos(p)) + 1
      Seq(
        max(when(col("__start") < lo && lo <= col("__end"), col("__v"))).as(s"__lo$i"),
        max(when(col("__start") < hi && hi <= col("__end"), col("__v"))).as(s"__hi$i"),
        max(pos(p) - floor(pos(p))).as(s"__f$i"))
    }
    val outCols = col(key) +: ps.zipWithIndex.map { case ((name, _), i) =>
      (col(s"__lo$i") * (lit(1.0) - col(s"__f$i")) + col(s"__hi$i") * col(s"__f$i")).as(name)
    }
    ranked.groupBy(col(key)).agg(aggs.head, aggs.tail: _*).select(outCols: _*)
  }
}
