package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Dedup

/** Core relational operator suite over the synthetic star schema
  * (TESTDATA.md), one query per operator family from SURVEY.md §2.
  *
  * Oracle-parity rules (the driver hash-compares against DuckDB):
  *  - money/quantity aggregation goes through DECIMAL(18,2) so sums are
  *    exact regardless of partial-aggregation order, then casts to DOUBLE;
  *  - raw doubles are only emitted unaggregated, or via order-independent
  *    aggregates (min/max), or per-row IEEE arithmetic — never float sums;
  *  - every output is totally ordered by a unique key and every computed
  *    column is aliased identically to the oracle SQL;
  *  - integer-ish outputs are cast to LongType to match DuckDB BIGINT.
  *
  * Scale notes are per-query; the common theme: filters/projections sit
  * directly on the parquet scan (pushdown + pruning), small dimensions are
  * broadcast, and the only shuffles are the semantically required
  * hash-exchanges for groupBy/window keys.
  */
object StarQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Q0 parity: count(*) smoke per table (SURVEY §2.5 A1). */
  def q00Counts(spark: SparkSession, dir: String): DataFrame =
    Tables.names
      .map { n =>
        Tables.load(spark, dir, n)
          .agg(count(lit(1)).as("n"))
          .select(lit(n).as("tbl"), col("n"))
      }
      .reduce(_.unionAll(_))
      .orderBy("tbl")

  /** Pricing summary: multi-key hash agg with exact decimal sums (A2).
    * Partial (map-side) aggregation makes this a single small shuffle of
    * |groups| rows per partition at any scale. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Top-k by value with unique tiebreak → TakeOrderedAndProject, no full
    * sort at scale (O1/O2, P7). */
  def q02TopkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** Fact ⋈ dimension with an explicit broadcast of the small side (J1),
    * then hash agg (A2). No shuffle of the fact table for the join. */
  def q03JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
      .orderBy("c_mktsegment")
  }

  /** Range predicate + projection, both pushed into the parquet scan
    * (O3/O4, F2/F3) — `.explain` shows PushedFilters and a 5-column
    * ReadSchema. */
  def q04FilterSort(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-07-01 00:00:00")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** row_number window, rank<=3 per partition key (W1). One hash shuffle
    * on the partition key; sort within partitions only. */
  def q05WindowRownum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** lag() trajectory per key (W3); per-row double subtraction is
    * IEEE-deterministic so the raw delta is oracle-safe. */
  def q06WindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Deterministic keep-first dedup (D1/D2 via W2) — reference semantics of
    * pandas drop_duplicates, made order-explicit. */
  def q07DedupKeepfirst(spark: SparkSession, dir: String): DataFrame =
    Dedup.keepFirst(
      Tables.load(spark, dir, "lineitem")
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_partkey"),
      Seq(col("l_orderkey"), col("l_linenumber")))
      .orderBy("l_partkey")

  /** Array explode (P4) with order-independent aggregates over elements. */
  def q08Explode(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), explode(col("embedding")).as("e"))
      .groupBy("vec_id")
      .agg(
        count(lit(1)).as("n_elems"),
        min(col("e").cast("double")).as("min_e"),
        max(col("e").cast("double")).as("max_e"))
      .orderBy("vec_id")

  /** Array element access (P3). */
  def q09ArrayAccess(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("first_dim"),
        element_at(col("embedding"), 64).cast("double").as("last_dim"),
        col("label"))
      .orderBy("vec_id")

  /** Left-semi join (EXISTS). Supplier side is small → broadcast the
    * filter-producing side would invert; Catalyst broadcasts correctly. */
  def q10SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.load(spark, dir, "supplier")
    val li = Tables.load(spark, dir, "lineitem").select(col("l_suppkey"))
    s.join(li, s("s_suppkey") === li("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Left-anti join (NOT EXISTS): parts never shipped in bulk. The filter
    * on the probe side is pushed below the join. */
  def q11AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45)
      .select(col("l_partkey"))
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** UNION (distinct) — §2.9 set ops. */
  def q12Union(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nk"))
      .union(Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  /** EXCEPT: customers who never placed a >300k order. */
  def q13Except(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(col("c_custkey").as("ck"))
      .except(Tables.load(spark, dir, "orders")
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("ck")))
      .orderBy("ck")

  /** INTERSECT. */
  def q14Intersect(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "nation").select(col("n_nationkey").as("nk"))
      .intersect(Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nk")))
      .orderBy("nk")

  /** ROLLUP over a two-dim hierarchy; null grouping slots coalesced to a
    * sentinel so ordering is engine-independent. */
  def q15Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"))
      .orderBy("region_name", "nation_name")
  }

  /** DISTINCT aggregate alongside a plain count (A-family). */
  def q16DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"), count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** JSON field extraction from a string column (P5/F6 analog). */
  def q17JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .orderBy("k")

  /** Tumbling-hour aggregation over the event stream table — the batch twin
    * of the Structured Streaming path (§2.10). */
  def q18DateTruncAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
      .orderBy("hr")

  /** Scalar string function battery (F-family, §2.7). */
  def q19StringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 12).as("name_pfx"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Q1 parity shape: date-window (anchor = max date in data, so the query
    * is deterministic, unlike CURRENT_DATE) + top-k (F2, O1). The scalar
    * anchor is broadcast, never collected. */
  def q20DateWindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val mx = o.agg(max(col("o_orderdate")).as("max_d"))
    o.crossJoin(broadcast(mx))
      .filter(col("o_orderdate") >= col("max_d") - expr("INTERVAL 30 DAYS"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
  }

  /** Q2 parity shape: fact ⋈ dim + group-avg over (entity, month) (J1+A2+O3). */
  def q21JoinAggTime(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), month(col("l_shipdate")).cast("long").as("ship_month"))
      .agg(
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("p_brand", "ship_month")
  }

  /** Q3 parity shape: per-day chart rank (window) → filter top-10 → count
    * per entity → top-k (W1+A3+O2). */
  def q22Top10Appearances(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("d")).orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("d"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("top10_appearances"))
      .orderBy(desc("top10_appearances"), asc("o_custkey"))
      .limit(20)
  }

  /** Q4 parity shape: single-key time series with lag delta (O4+W3);
    * key chosen from the data (min partkey) to stay deterministic. The
    * window partitions by the (single, post-filter) key, so the plan
    * stays key-parallel if the filter ever widens. */
  def q23LagTrajectory(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val mn = li.agg(min(col("l_partkey")).as("min_pk"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    li.crossJoin(broadcast(mn))
      .filter(col("l_partkey") === col("min_pk"))
      .select(col("l_partkey"), col("l_shipdate"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("qty_delta", col("l_quantity") - lag(col("l_quantity"), 1).over(w))
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
  }

  /** Pivot (wide aggregation): returnflag × linestatus counts as columns.
    * Explicit pivot values keep the plan a single pass (no value-discovery
    * job); coalesce(0) aligns missing combinations with the oracle's
    * filtered counts. */
  def q45Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"))
      .orderBy("l_returnflag")

  /** CUBE over region × nation (all four grouping-set combinations). */
  def q46Cube(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_customers"))
      .orderBy("region_name", "nation_name")
  }

  /** Exact interpolated percentiles per group — sort+window formulation
    * (graft.operators.Percentiles); interpolation matches DuckDB
    * `quantile_cont` bit-exactly. */
  def q47Percentiles(spark: SparkSession, dir: String): DataFrame =
    // fixed $64 price grid (round 7): identical values for any grid —
    // skips exact()'s per-key min/max broadcast job
    graft.operators.Percentiles.exactGridded(
      Tables.load(spark, dir, "lineitem"), "l_returnflag", "l_extendedprice",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99), gridWidth = 64.0)
      .orderBy("l_returnflag")

  /** LEFT OUTER broadcast join: every customer, with order stats where
    * they exist (null-extended otherwise — count preserved as 0). The
    * fact side is pre-aggregated BEFORE the join, so the outer join
    * touches |customers| + |custkeys-with-orders| rows, never the raw
    * fact table. */
  def q51OuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    val stats = o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        max(col("o_totalprice")).as("max_price"))
    c.join(stats, c("c_custkey") === stats("o_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("max_price"))
      .orderBy("c_custkey")
  }

  /** EXISTS / NOT EXISTS correlated subqueries — expressed as left-semi
    * and left-anti joins (exactly what Catalyst rewrites EXISTS into):
    * suppliers that shipped in 1997 but never had a full-quantity return
    * line. Both subquery filters are pushed to the fact scan. */
  def q52Exists(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.load(spark, dir, "supplier")
    val li = Tables.load(spark, dir, "lineitem")
    val shipped97 = li.filter(
      col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
      col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      .select(col("l_suppkey"))
    val fullReturns = li.filter(col("l_returnflag") === "R" && col("l_quantity") > 49)
      .select(col("l_suppkey"))
    s.join(shipped97, s("s_suppkey") === shipped97("l_suppkey"), "left_semi")
      .join(fullReturns, s("s_suppkey") === fullReturns("l_suppkey"), "left_anti")
      .select("s_suppkey", "s_name", "s_nationkey")
      .orderBy("s_suppkey")
  }

  /** Salted skew join (X35): fact⋈dim through Skew.saltedJoin — each fact
    * row salts deterministically, the dim replicates `salts` ways, and a
    * hot supplier spreads over 8 reducers instead of one. Aggregated per
    * supplier so the oracle (a plain inner join — salting must be
    * invisible in the result) compares a small totally-ordered frame. */
  /** rank()-with-ties top-k: each customer's 2 most recent order DAYS,
    * keeping ALL same-day ties (rank ≤ 2 can exceed 2 rows) — the other
    * common top-k idiom, rewritten by TopKRewrite into the native
    * ties-aware TopKPerKey operator (RankMode.Rank). */
  def q66RankTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(desc("d"))
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 2)
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** Hierarchical rollup (X172): revenue + counts at (flag, status),
    * per-flag subtotal, and grand total from ONE pass — Spark's
    * `rollup` expands to grouping sets inside a single Expand+hash-agg
    * (no self-union of three aggregations), exactly the multi-grain
    * readout a reporting layer asks of 100 TB of fact rows. Exact
    * cents-long sums; grouping levels surfaced by coalescing the
    * rolled-up keys to 'ALL' (flag/status are non-null by schema, so
    * the sentinel is unambiguous and engine-portable — DuckDB's
    * GROUPING() bitmask and Spark's grouping_id() need not align). */
  def q182Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("cents").as("cents"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("cents"), col("n"))
      .orderBy("returnflag", "linestatus")

  /** Pivot (X173): long→wide event counts per user segment — the
    * reshape every dashboard export runs. Pivot VALUES are declared
    * (the 5-type domain), so the plan is one hash agg with 5
    * conditional counts — no distinct-values pre-scan, no second
    * shuffle — and the twin is plain FILTERed aggregation. Absent
    * combinations are 0 (count semantics), matching both engines. */
  def q183Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(pmod(col("user_id"), lit(8L)).as("segment"), col("event_type"))
      .groupBy("segment")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("segment")

  /** JSON path extraction (X174): the semi-structured `props` column
    * (the reference's raw layer is exactly such nested JSON) read with
    * `get_json_object` INSIDE the scan projection — parse and extract
    * fuse into the map stage, only (type, k) longs reach the agg. */
  def q184JsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), min("k").as("k_min"),
        max("k").as("k_max"), sum("k").as("k_sum"))
      .orderBy("event_type")

  /** Distribution-rank window suite (X175): ntile/percent_rank/
    * cume_dist — the three rank-family functions the suite had not
    * exercised — over a UNIQUE (bal, suppkey) order so tie semantics
    * cannot diverge between engines; percent_rank's (rank−1)/(n−1)
    * and cume_dist's rank/n are single IEEE divisions, portable. One
    * keyed window, state = one nation's suppliers. */
  def q185WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("s_nationkey")
      .orderBy(col("bal"), col("s_suppkey"))
    Tables.load(spark, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        round(col("s_acctbal") * 100).cast("long").as("bal"))
      .select(col("s_nationkey"), col("s_suppkey"), col("bal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("s_nationkey", "s_suppkey")
  }

  /** TPC-H Q5-shape 6-table star join (X180 — the canonical multi-join
    * benchmark shape the suite lacked; q15/q46 join dimensions only):
    * revenue per nation for one region's LOCAL commerce (customer and
    * supplier in the same nation) inside a one-year window. The plan
    * the optimizer should pick — and measurably does: region/nation/
    * customer/supplier all broadcast (pruned before the join by the
    * pushed-down region filter), so the FACT table shuffles ZERO times
    * before aggregation — lineitem⋈orders is the only exchange pair,
    * and AQE turns orders (date-filtered) into a broadcast too when it
    * fits. Revenue through DECIMAL(18,2) (the q01 rule). */
  def q190StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(spark, dir, "region").where(col("r_name") === "ASIA")
    val n = Tables.load(spark, dir, "nation")
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val li = Tables.load(spark, dir, "lineitem")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("l_extendedprice")) *
          (dec(lit(1)) - dec(col("l_discount")))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** TPC-H Q21-shape (X184): suppliers who kept everyone waiting — per
    * supplier of one nation, the count of returned ('R') lineitems in
    * finished multi-supplier orders where that supplier was the ONLY
    * one with a return. The reference semantics is the fact
    * self-join + EXISTS + NOT-EXISTS on the same key (the oracle is
    * written in literally that form); the engine plans the algebraic
    * rewrite that touches the fact ONCE instead of three times:
    *   EXISTS(other supplier)        ⟺ n_distinct_suppliers ≥ 2
    *   NOT EXISTS(other late supp)   ⟺ n_late_suppliers = 1 (l1 late)
    * so a (orderkey, suppkey) grain agg followed by an orderkey grain
    * agg carries everything: supplier count, late supplier count, THE
    * late supplier (max over a 1-element set) and its late-row count
    * (numwait counts l1 ROWS, Q21's count(*)). The fact repartitions
    * on orderkey ALONE before the first agg: HashPartitioning(ok)
    * satisfies the clustering of BOTH aggs ((ok,sk) ⊇ {ok}) and the
    * orders join, so the whole chain rides ONE exchange — the (ok,sk)
    * grain barely compresses lineitem (~1 row each), so the map-side
    * partial agg the plain groupBy would buy costs a second exchange
    * for nothing (A/B at sf0.1: 1.02 → 0.75 s min-of-6).
    * The order-status filter joins at orderkey grain (AQE broadcasts
    * the filtered orders at local SF; co-keyed single exchange at
    * cluster SF), supplier⋈nation broadcast. The fact is scanned once,
    * exchanged once — vs the literal plan's three scans + three
    * exchanges — and hash-equality against the EXISTS-form oracle IS
    * the proof of the rewrite. */
  def q193WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val late = col("l_returnflag") === "R"
    val perSupp = Tables.load(spark, dir, "lineitem")
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(late).as("any_late"),
        sum(when(late, lit(1L)).otherwise(lit(0L))).as("n_late_rows"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("any_late"), lit(1L)).otherwise(lit(0L))).as("n_late_supp"),
        max(when(col("any_late"), col("l_suppkey"))).as("late_supp"),
        sum(when(col("any_late"), col("n_late_rows")).otherwise(lit(0L)))
          .as("late_rows"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
    val fOrders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
        .filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    perOrder.join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("late_supp") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(sum("late_rows").as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  /** Two-fact-path join (X185, the Q8-shape thin spot): ORDER revenue
    * and EVENT engagement per customer nation — two independent fact
    * streams, each reduced to customer grain by its own map-side
    * combinable agg (orders → n/Σtotalprice, events → n/Σcents), THEN
    * joined through the shared customer dimension and rolled up to
    * nation. The anti-pattern this query pins against is joining the
    * raw facts first (|orders| × |events| per customer before any
    * reduction); pre-aggregation makes each fact cross the wire once
    * at its REDUCED grain, and the dim joins stay broadcast. Revenue
    * through DECIMAL(18,2) (q01 rule), engagement through exact cents
    * (q158 rule), so every sum is reduction-order-free. Customers with
    * no orders or no events stay (left joins, zero-coalesced) — the
    * n_active_both column pins the null bookkeeping. */
  def q194TwoFactPaths(spark: SparkSession, dir: String): DataFrame = {
    val ords = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).as("order_rev"))
    val evs = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("event_cents"))
    Tables.load(spark, dir, "customer")
      .join(ords, col("c_custkey") === col("o_custkey"), "left")
      .join(evs, col("c_custkey") === col("user_id"), "left")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(coalesce(col("n_orders"), lit(0L))).as("n_orders"),
        sum(coalesce(col("order_rev"), dec(lit(0)))).cast("double")
          .as("order_revenue"),
        sum(coalesce(col("n_events"), lit(0L))).as("n_events"),
        (sum(coalesce(col("event_cents"), lit(0L))).cast("double") /
          lit(100.0)).as("event_value"),
        sum(when(col("n_orders").isNotNull && col("n_events").isNotNull,
          lit(1L)).otherwise(lit(0L))).as("n_active_both"))
      .orderBy("n_name")
  }

  /** TPC-H Q17-shape (X186): small-quantity-order revenue — per brand,
    * the yearly-averaged revenue of lineitems whose quantity is below
    * 20% of that PART's average quantity. The reference semantics is a
    * correlated scalar subquery (`l_quantity < (SELECT 0.2*avg(...)
    * WHERE l2.l_partkey = l_partkey)` — the oracle is written in
    * literally that form); the engine plans the decorrelated rewrite:
    * one per-part threshold agg off the fact (map-side combinable,
    * |parts| rows), joined back co-keyed on partkey — the fact crosses
    * the wire once at full grain and once reduced, never per-subquery.
    * Float determinism: quantities are integer-valued doubles, so
    * sum() is order-free exact, avg = sum/count is ONE division both
    * engines evaluate identically, and the 0.2× threshold compare can
    * never flip between engines; revenue through DECIMAL(18,2)
    * (q01 rule), one division by 7.0 at the end. */
  def q195SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val thr = li.groupBy(col("l_partkey"))
      .agg((sum(col("l_quantity")) / count(lit(1)) * lit(0.2)).as("__thr"))
    li.join(thr, Seq("l_partkey"))
      .filter(col("l_quantity") < col("__thr"))
      .join(broadcast(Tables.load(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0))
        .as("avg_yearly"),
        count(lit(1)).as("n_small_qty_lines"))
      .orderBy("p_brand")
  }

  /** TPC-H Q2-shape (X187): minimum-cost supplier per part within a
    * region. The reference semantics is a correlated MIN subquery over
    * the part-supplier cost relation (`cost = (SELECT min(cost) ...
    * WHERE ps2.partkey = ps.partkey)` — the oracle is written in
    * literally that form, with the cost relation derived from lineitem
    * since the test schema carries no partsupp). The engine plans the
    * decorrelated rewrite: region-pruned suppliers broadcast into the
    * (partkey, suppkey) cost agg, the per-part min as a KEYED WINDOW
    * over that relation (one exchange, one pass, no self-join — the
    * min-agg-join-back alternative re-materializes the cost relation:
    * A/B at sf0.1 1.15 → 0.84 s min-of-6), and the size-filtered part
    * dim broadcast last. Ties keep every min-cost supplier (set
    * semantics, both engines). `cost` is min of identical doubles —
    * no summation, so equality can never flip. */
  def q196MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost"))
    val rsupp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(spark, dir, "region")
        .where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    val psr = ps.join(broadcast(rsupp), col("l_suppkey") === col("s_suppkey"))
    val w = Window.partitionBy(col("l_partkey"))
    psr.withColumn("__min_cost", min(col("cost")).over(w))
      .filter(col("cost") === col("__min_cost"))
      .join(broadcast(Tables.load(spark, dir, "part")
        .where(col("p_size") === 25)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("cost"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  /** TPC-H Q18-shape (X188): large-quantity orders. The reference
    * semantics is an IN subquery over a HAVING-filtered aggregate
    * (`o_orderkey IN (SELECT l_orderkey ... HAVING sum(l_quantity) >
    * 200)` — the oracle is written literally so). The engine plans the
    * rewrite a 100 TB join graph needs: the fact aggregates to order
    * grain ONCE (map-side combinable) and the filtered survivors —
    * tiny, the >200 tail — drive the joins, carrying total_qty so the
    * fact is never rejoined for the output sum; orders joins co-keyed
    * on orderkey (AQE broadcasts the survivor side), customer joins
    * last at the already-tiny grain. Quantities are integer-valued
    * doubles, so the per-order sum is order-free exact and the
    * threshold can never flip between engines. */
  def q197LargeQtyOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 200)
    big.join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_date"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q22-shape (X189): well-funded dormant customers — above
    * global-average balance, no order in the recent window. The
    * reference semantics is a scalar AVG subquery plus NOT EXISTS
    * (the oracle is written literally so); the engine plans the
    * broadcast-scalar + anti-join shape: the one-row average crosses
    * as a broadcast nested loop (a scalar, not a cartesian), the
    * recent-order keys anti-join on custkey, nation broadcasts.
    * Float discipline: the threshold compare runs on exact cents
    * (bigint) against one identical division — a double AVG would be
    * summation-order-dependent and could flip boundary customers
    * between engines (the q158/q194 cents rule). */
  def q198DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        round(col("c_acctbal") * 100).cast("long").as("__cents"))
    val thr = cust.filter(col("c_acctbal") > 0)
      .agg((sum(col("__cents")).cast("double") / count(lit(1))).as("__thr"))
    val recent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(thr))
      .filter(col("__cents") > col("__thr"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("cntry"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy("cntry")
  }

  /** TPC-H Q11-shape (X190): parts whose inventory value exceeds a
    * multiple of the MEAN per-part value — a grouped aggregate
    * filtered against a scalar aggregate of itself (Q11's literal
    * `> 0.0001 × total` is SF-pinned; per TPC-H the fraction shrinks
    * with SF, and the mean-relative form is exactly that made
    * scale-invariant: 1.25 × total/n_parts). The oracle is the
    * literal HAVING-with-scalar-subquery form (two logical fact
    * reads); the engine derives the threshold FROM the per-part
    * aggregate (a |parts|-row re-agg, not a second fact pass) and
    * broadcasts the one-row scalar, so the fact is scanned once and
    * the plan's second branch reuses the per-part exchange. Value is
    * summed in exact cents (bigint) — mean = one identical division,
    * threshold = one identical double product, in both engines. */
  def q199ValueShare(spark: SparkSession, dir: String): DataFrame = {
    val pp = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("__cents"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("__cents")).as("value_cents"))
    val tot = pp.agg((sum(col("value_cents")).cast("double") /
      count(lit(1))).as("__mean"))
    pp.crossJoin(broadcast(tot))
      .filter(col("value_cents").cast("double") > lit(1.25) * col("__mean"))
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(desc("value_cents"), col("l_partkey"))
      .limit(100)
  }

  /** TPC-H Q15-shape (X191): the top-revenue supplier(s) of a quarter —
    * a derived revenue view compared against its own MAX (the oracle is
    * the literal scalar-subquery form). The engine computes the
    * |suppliers|-row view once, broadcasts the one-row max, and keeps
    * every tied supplier (set semantics). Revenue through
    * DECIMAL(18,2) (the q01/q190 rule) — max/equality on decimals is
    * exact, so the tie set can never differ between engines; the
    * shipdate filter pushes into the scan. */
  def q200TopRevenueSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) *
        (dec(lit(1)) - dec(col("l_discount")))).as("__rev"))
    val mx = rev.agg(max(col("__rev")).as("__mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("__rev") === col("__mx"))
      .join(broadcast(Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("__rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q20-shape (X192): suppliers holding excess stock of a part
    * family — a nested semi chain (supplier IN → part IN → correlated
    * availability-vs-shipped threshold). The oracle is the literal
    * nested form, whose correlated subquery re-reads the fact per
    * (part, supplier); the engine folds BOTH sums into one conditional
    * aggregate over a single fact scan — avail = Σqty, shipped₉₆ =
    * Σqty·[1996] — so the correlation costs nothing extra, the part
    * family broadcasts as a semi filter, and the qualifying supplier
    * ids (k rows) semi-join the supplier dim. Pairs with NO 1996
    * shipments drop in both engines (NULL comparison ⟂ false — the
    * SQL semantics the conditional agg reproduces exactly); quantities
    * integer-valued, sums order-free exact. */
  def q201ExcessStock(spark: SparkSession, dir: String): DataFrame = {
    val in96 = col("l_shipdate") >= lit("1996-01-01") &&
      col("l_shipdate") < lit("1997-01-01")
    val ps = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("avail"),
        sum(when(in96, col("l_quantity"))).as("shipped96"))
    val fam = Tables.load(spark, dir, "part")
      .filter(col("p_name").startsWith("large"))
      .select(col("p_partkey"))
    val qual = ps
      .join(broadcast(fam), col("l_partkey") === col("p_partkey"), "left_semi")
      .filter(col("avail") > lit(8.0) * col("shipped96"))
      .select(col("l_suppkey")).distinct()
    Tables.load(spark, dir, "supplier")
      .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  /** CUBE multi-grain aggregation (X193; the all-grains complement of
    * X172's fact ROLLUP): one pass emits every grouping-set grain —
    * (flag, status), (flag), (status), () — with `grouping_id()`
    * disambiguating CUBE-generated NULLs from data NULLs, the exact
    * contract BI tools read. Spark expands CUBE before the aggregate
    * (an Expand node: 4 grains per input row) and the whole lattice
    * rides ONE exchange (map-side partial aggs on 4·|keys| groups);
    * bit order — first cube column = most significant — matches
    * DuckDB/Postgres `GROUPING()`, which the hash gate pins. Money in
    * exact cents (the q158/q194 rule). */
  def q202CubeAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_extendedprice") * 100).cast("long").as("__cents"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(col("__cents")).as("cents"))
      .select(col("gid"), col("l_returnflag"), col("l_linestatus"),
        col("n"), col("cents"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q13-shape (X194): the customer order-count DISTRIBUTION —
    * a left-join-preserving double aggregation whose signature bucket
    * is the customers with ZERO matching orders (an inner join or a
    * plain orders agg would silently drop them; Q13 exists to pin
    * exactly that). The oracle is the literal left-join + count +
    * re-count form; the engine aggregates orders to custkey grain
    * FIRST (map-side combinable — at 100 TB the raw order rows never
    * cross against customer) and left-joins the counts, zero-coalesced,
    * before the tiny count-of-counts agg (|distinct counts| rows). */
  def q203OrderCountHist(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("__n"))
    Tables.load(spark, dir, "customer")
      .join(cnt, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("__n"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(desc("n_customers"), desc("c_count"))
  }

  /** TPC-H Q7-shape (X195): two-nation volume shipping — the census row
    * for DISJUNCTIVE join predicates. The literal form's
    * `(n1=A AND n2=B) OR (n1=B AND n2=A)` cannot key a hash join (an
    * OR across both sides degenerates to a cartesian if planned as the
    * join condition); the engine's shape is the Q7 lesson: restrict
    * each dim to the UNION of the two nations first (broadcast — the
    * disjunction's per-side projection is a plain IN filter), join the
    * fact on pure equi-keys, and apply the cross-pair disjunction as a
    * post-join FILTER on the two attached nation names. Fact joins
    * orders co-keyed on orderkey; customer/supplier dims broadcast.
    * Revenue through DECIMAL(18,2) (q01 rule); year() on the shipdate
    * is exact integer arithmetic in both engines. */
  def q204VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_18", "NATION_19")
    val n = Tables.load(spark, dir, "nation")
      .filter(col("n_name").isin(nations: _*))
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.load(spark, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) *
          (dec(lit(1)) - dec(col("l_discount")))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Equi-WIDTH histogram (X177; the value-grid complement of q91's
    * equi-depth): 8 equal price ranges per flag, bucket id by EXACT
    * integer arithmetic `((v−mn)·8) div (mx−mn+1)` — no float in the
    * bucketing, so the histogram replays bit-for-bit. One stats agg
    * (3 rows, broadcast) + one |keys|·8-group agg. */
  def q186EquiwidthHist(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val stats = li.groupBy("l_returnflag")
      .agg(min("cents").as("mn"), max("cents").as("mx"))
    li.join(broadcast(stats), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"),
        (((col("cents") - col("mn")) * 8).cast("long") /
          (col("mx") - col("mn") + 1)).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), min("cents").as("lo"), max("cents").as("hi"))
      .orderBy("l_returnflag", "bucket")
  }

  /** UNPIVOT (X178; q183's inverse — the wide→long melt): the pivoted
    * per-segment counts stack back to (segment, event_type, n) rows,
    * 0-count combinations INCLUDED (pivot semantics round-trip, which
    * a plain group-by would silently drop). `unpivot` is pure
    * projection work — one Expand node over the 8-row pivoted table. */
  def q187Unpivot(spark: SparkSession, dir: String): DataFrame =
    q183Pivot(spark, dir)
      .unpivot(Array(col("segment")),
        Array(col("click"), col("error"), col("purchase"),
          col("signup"), col("view")),
        "event_type", "n")
      .orderBy("segment", "event_type")

  /** Boolean / conditional aggregate suite (X179: bool_and, bool_or,
    * count_if — the remaining standard aggregates): per-flag data-
    * quality style verdicts, all exact (no floats in any verdict). */
  def q188BoolAggs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        bool_and(col("l_quantity") > 0).as("all_qty_pos"),
        bool_or(col("l_discount") > lit(0.05)).as("any_deep_discount"),
        count_if(col("l_tax") === 0).as("n_tax_free"),
        count_if(col("l_quantity") >= 25).as("n_bulk"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** NULL-semantics census row 1 (X198): the classic NOT-IN-with-NULL
    * trap (TPC-H Q16 family — the cross-engine migration bug most
    * likely to bite in practice). The subquery
    * `CASE WHEN o_orderstatus='F' THEN o_custkey END` contains NULLs,
    * so by three-valued logic `x NOT IN (subquery)` is never TRUE and
    * the literal query returns ZERO rows — while the null-guarded form
    * returns the real "customers with no F-order" set, and plain IN is
    * unaffected by the extra NULLs. One labeled count+checksum row per
    * variant pins all three semantics in one oracle row.
    *
    * Engine shape: Spark's own NOT-IN planning is a null-aware anti
    * join that requires a BROADCASTABLE build side (else BNLJ); the
    * decorrelated rewrite here is the scale-safe equivalent — the
    * build side's null count crosses as a broadcast 1-row scalar that
    * guards (empties) the probe, and the key match itself is a plain
    * LeftAnti/LeftSemi on the distinct non-null keys, shuffleable at
    * any size. The only nested loop is that broadcast ONE-ROW scalar
    * crossing the probe (the q198 device); no cartesian over data.
    * Probe keys (c_custkey) are non-null by schema here; the
    * nullable-PROBE half of the trap is pinned by
    * [[q213NotInProbeNull]] (round 10). */
  def q207NotInNullCensus(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"))
    val sub = Tables.load(spark, dir, "orders")
      .select(when(col("o_orderstatus") === "F", col("o_custkey")).as("k"))
    // one pass over sub for both the null guard and the key set
    val nullCount = sub.agg(
      sum(col("k").isNull.cast("long")).as("n_nulls"))
    val keys = sub.filter(col("k").isNotNull).distinct()
    def summarize(df: DataFrame, label: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("c_custkey")), lit(0L)).as("chk"))
        .select(lit(label).as("variant"), col("n_rows"), col("chk"))
    val trap = summarize(
      cust.crossJoin(broadcast(nullCount))
        .filter(col("n_nulls") === 0L)
        .join(keys, col("c_custkey") === col("k"), "left_anti"),
      "not_in_with_nulls")
    val guarded = summarize(
      cust.join(keys, col("c_custkey") === col("k"), "left_anti"),
      "not_in_null_guarded")
    val positive = summarize(
      cust.join(keys, col("c_custkey") === col("k"), "left_semi"),
      "in_with_nulls")
    trap.unionAll(guarded).unionAll(positive).orderBy("variant")
  }

  /** NULL-semantics census row 2 (X199): null-safe equality join
    * (`<=>` / IS NOT DISTINCT FROM) vs the null-dropping plain join,
    * divergence pinned row-for-row — the null-key group exists ONLY in
    * the nullsafe variant. Both sides pre-aggregate to (key, count)
    * BELOW the join (the q194 rule), which is also the null-skew
    * guard: a raw null-safe join would cross-product the two null
    * groups, |nulls_a|·|nulls_b| rows; pre-aggregated, the null group
    * is ONE row per side and n_pairs is a product of counts. Null-safe
    * equality is hashable, so both variants plan as hash joins — never
    * BNLJ (asserted in Round9PlanSpec). */
  def q208NullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    def keyed(df: DataFrame, c: String): DataFrame =
      df.select(when(col(c) % 100 =!= 13, col(c) % 100).as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
    val a = keyed(Tables.load(spark, dir, "orders"), "o_custkey")
      .withColumnRenamed("cnt", "na")
    val b = keyed(Tables.load(spark, dir, "customer"), "c_custkey")
      .withColumnRenamed("cnt", "nb")
    val nullsafe = a.join(b, a("k") <=> b("k"))
      .select(lit("nullsafe").as("variant"), a("k").as("key"),
        (col("na") * col("nb")).as("n_pairs"))
    val plain = a.join(b, a("k") === b("k"))
      .select(lit("plain").as("variant"), a("k").as("key"),
        (col("na") * col("nb")).as("n_pairs"))
    nullsafe.unionAll(plain)
      .orderBy(col("variant"), col("key").asc_nulls_first)
  }

  /** TPC-H Q16-shape (X202): supplier-count-by-part-attribute with a
    * NOT IN exclusion — the census shape q207's trap row left open (the
    * subquery here is null-free, so NOT IN degenerates to a plain anti
    * join; q207 pins the null case). ENGINE: the attribute-filtered
    * part dim and the excluded-supplier key set both broadcast, the
    * fact is scanned ONCE, and count(DISTINCT suppkey) runs as Spark's
    * two-phase distinct aggregate — the (brand, size, suppkey) distinct
    * pass and the final count ride one exchange chain, never a
    * re-scan. Plan-asserted: one fact scan, LeftAnti, no cartesian. */
  def q211SupplierCountByPart(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.load(spark, dir, "supplier")
      .filter(col("s_name").endsWith("7"))
      .select(col("s_suppkey"))
    val p = Tables.load(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 9, 13, 21, 30))
      .select("p_partkey", "p_brand", "p_size")
    Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_size"))
  }

  /** TPC-H Q19-shape (X203): an OR of per-brand (size band × quantity
    * band) conjunctions — the disjunctive-predicate complement of
    * q204's two-nation pair. The disjunction must NOT break the equi
    * join: the ENGINE pushes the UNION of the part-side disjuncts into
    * the broadcast dim filter (brand IN (...), size ≤ max band — these
    * reach the part scan as pushed filters), joins the fact on the
    * plain partkey equi-key, and applies the full cross-side
    * disjunction as a post-join filter. Revenue through DECIMAL(18,2)
    * (q01 rule). Plan-asserted: BroadcastHashJoin, no cartesian/BNLJ,
    * one fact scan. */
  def q212BandedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .filter(col("p_brand").isin("Brand#2", "Brand#3", "Brand#4") &&
        col("p_size") <= 30)
      .select("p_partkey", "p_brand", "p_size")
    Tables.load(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20, 35)))
      .groupBy("p_brand")
      .agg(sum(dec(col("l_extendedprice")) *
          (dec(lit(1)) - dec(col("l_discount")))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  /** NULL-semantics census row 3 (X205, round 10): the PROBE-side half
    * of the NOT-IN trap — [[q207NotInNullCensus]] pins a NULL-bearing
    * SUBQUERY; here the subquery is null-free and the PROBE key is
    * nullable (`CASE WHEN c_custkey % 97 <> 3 THEN c_custkey END`).
    * Under NOT IN a NULL probe key yields NULL (never TRUE) against a
    * non-empty subquery, so those rows are silently DROPPED; the
    * anti-join / NOT EXISTS equality form finds no match for a NULL
    * key and KEEPS them — the exact divergence a cross-engine port of
    * "WHERE x NOT IN (...)" to "LEFT ANTI JOIN" introduces on nullable
    * columns. One labeled count+checksum row per variant.
    *
    * Engine shape (the q207 discipline): the subquery's row count
    * crosses as a broadcast 1-row scalar whose only job is the
    * empty-subquery edge (NOT IN over an EMPTY set keeps everything,
    * nulls included); the key match is a plain LeftAnti on distinct
    * keys, shuffleable at any size; no cartesian over data
    * (plan-asserted in Round10Spec). */
  def q213NotInProbeNull(spark: SparkSession, dir: String): DataFrame = {
    val probe = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_custkey") % 97 =!= 3, col("c_custkey")).as("pk"))
    val sub = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    val subCount = sub.agg(count(lit(1)).as("n_sub"))
    val keys = sub.distinct()
    def summarize(df: DataFrame, label: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("c_custkey")), lit(0L)).as("chk"))
        .select(lit(label).as("variant"), col("n_rows"), col("chk"))
    val notIn = summarize(
      probe.crossJoin(broadcast(subCount))
        .filter(col("n_sub") === 0L || col("pk").isNotNull)
        .join(keys, col("pk") === col("k"), "left_anti"),
      "not_in_drops_probe_nulls")
    val anti = summarize(
      probe.join(keys, col("pk") === col("k"), "left_anti"),
      "anti_join_keeps_probe_nulls")
    notIn.unionAll(anti).orderBy("variant")
  }

  /** Schema-drift ingest census (X214, round 11): read a two-epoch
    * parquet corpus written across a schema change (epoch-1 files
    * PREDATE `o_orderpriority`; see
    * [[graft.sources.SchemaDrift.stageOrdersDrift]]) via Spark's
    * explicit `mergeSchema` union-by-name, then census per status: how
    * many rows predate the column (it reads as NULL exactly for
    * epoch-1 files), how many carry it, how many distinct values, plus
    * a key checksum pinning that no row was dropped or duplicated by
    * the footer-union. The oracle replays epoch membership from the
    * source table by the staging rule (o_orderkey parity) — the same
    * semantics DuckDB's `union_by_name` applies to the files
    * themselves. Staging is memoized per (app, dir): a fixed ingest
    * cost paid in the warmup, the q120-drain precedent. Column
    * pruning survives the footer-union (verified plan: the merged
    * FileScan reads exactly [o_orderkey, o_orderstatus,
    * o_orderpriority]) — a drifted 100 TB corpus scans no wider than
    * a homogeneous one. */
  def q220SchemaDrift(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.sources.SchemaDrift.stageOrdersDrift(spark, dir)
    graft.sources.SchemaDrift.readMerged(spark, corpus)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L))
          .as("n_pre_drift"),
        sum(when(col("o_orderpriority").isNotNull, 1L).otherwise(0L))
          .as("n_post_drift"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status")
  }

  /** Type-widening schema-drift census (X217, round 12): read a
    * two-epoch parquet corpus whose producer WIDENED its types
    * mid-corpus (epoch-1 files carry o_custkey as INT and o_totalprice
    * as FLOAT, and predate o_orderpriority; see
    * [[graft.sources.SchemaDrift.stageOrdersWiden]]) via the explicit
    * cast-to-widest read ([[graft.sources.SchemaDrift.readWidened]] —
    * `mergeSchema` hard-fails on conflicting parquet types, pinned by
    * Round12Spec's loud-failure test). The census pins all three drift
    * semantics at once: row/key conservation (n, key_sum), the
    * int32→int64 leg (custkey_sum — exact bigint arithmetic over the
    * widened column), the float→double leg (cents_sum — epoch-1 prices
    * round-tripped through FLOAT are VALUE-CHANGED, and the oracle
    * replays exactly that with `CAST(x AS REAL)::DOUBLE`, proving the
    * engine surfaces the file's actual narrowed value), and the
    * addition leg (n_pre_drift / n_priorities, q220's shape). All
    * aggregates integer-exact — no float summation order in the hash.
    * Scale: the widened read is per-epoch footer schemas + codegen'd
    * casts; no extra pass, no driver data. */
  def q221WidenedDrift(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.sources.SchemaDrift.stageOrdersWiden(spark, dir)
    graft.sources.SchemaDrift.readWidened(spark, corpus)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L))
          .as("n_pre_drift"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sum(col("o_custkey")).as("custkey_sum"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_sum"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status")
  }

  /** Deliberate big-dimension join regime (X218, round 12): nearly
    * every other join row plan-asserts BroadcastHashJoin because its
    * dim FITS — this row is the regime a 100 TB fact ⋈ 10 GB dim
    * actually runs, where the dim is ABOVE the broadcast threshold and
    * the right plan is a shuffle on the join key. Declared with the
    * `merge` (SHUFFLE_MERGE) hint — the idiomatic Spark way to state
    * "this side is too big to broadcast" per-join without touching the
    * session threshold — so the physical plan is SortMergeJoin with
    * both sides exchanged on o_orderkey, AQE free to coalesce or
    * skew-split the exchanges at runtime (Round12Spec plan-asserts
    * SMJ present / no broadcast). The aggregate rides the join's
    * own partitioning: sum/count per o_orderpriority after the key
    * shuffle, partial-aggregated map-side. */
  def q222BigDimJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    li.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) *
            (dec(lit(1)) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Epoch-pruned drift read (X220, round 12 — the planning-time face
    * of the schema-drift family): the q220 corpus read as the
    * partitioned table its `epoch=N` layout declares
    * ([[graft.sources.SchemaDrift.readPartitioned]]), with the census
    * restricted to the POST-drift epoch by a partition predicate —
    * pre-drift files are pruned at planning time (`PartitionFilters`
    * in the scan, plan-asserted in Round12Spec), so the post-drift
    * slice costs the slice, not the corpus. The oracle replays epoch
    * membership by the staging parity rule (odd o_orderkey =
    * post-drift), never reading the files. */
  def q223DriftPrune(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.sources.SchemaDrift.stageOrdersDrift(spark, dir)
    graft.sources.SchemaDrift.readPartitioned(spark, corpus)
      .where(col("epoch") === 2)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status")
  }

  /** Nested-struct schema-drift census (X221, round 13): the
    * reference's raw layer is deeply nested (`track.album.artists[]`),
    * and real landing zones drift INSIDE structs — epoch-1 files carry
    * `meta = struct(status, price)`, epoch-2's meta gains
    * `o_orderpriority` (see
    * [[graft.sources.SchemaDrift.stageOrdersNested]]). Spark's
    * `mergeSchema` merges StructTypes recursively, so the union-by-name
    * contract extends one level down: pre-drift files read the nested
    * field as NULL, post-drift files carry it — pinned per status by
    * the same census shape as q220, plus an exact cents sum through the
    * nested numeric access (nested-schema pruning keeps the scan
    * reading only the accessed leaf columns; Round13Spec plan-asserts
    * the pruned ReadSchema). The oracle replays epoch membership from
    * the flat source table by the staging parity rule. */
  def q224NestedDrift(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.sources.SchemaDrift.stageOrdersNested(spark, dir)
    graft.sources.SchemaDrift.readMerged(spark, corpus)
      .groupBy(col("meta.o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("meta.o_orderpriority").isNull, 1L).otherwise(0L))
          .as("n_pre_drift"),
        countDistinct(col("meta.o_orderpriority")).as("n_priorities"),
        sum(round(col("meta.o_totalprice") * 100).cast("long"))
          .as("cents_sum"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status")
  }

  /** Column-DROP drift census (X222, round 13): the inverse face of
    * q220 — the producer REMOVED `o_orderpriority` mid-corpus
    * ([[graft.sources.SchemaDrift.stageOrdersDrop]]), so union-by-name
    * reads it as NULL on POST-drift files. The census pins exactly that
    * inversion: `n_post_drop` counts NULL-priority rows (odd keys —
    * where q220's add-NULLs sat on EVEN keys), `n_priorities` counts
    * the distinct values the PRE-drop half still carries, and the key
    * checksum pins row conservation. Distinguishing drop-NULLs from
    * add-NULLs matters because a census that can't tells the wrong
    * story about which half of a 100 TB corpus predates the change. */
  def q225DropDrift(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.sources.SchemaDrift.stageOrdersDrop(spark, dir)
    graft.sources.SchemaDrift.readMerged(spark, corpus)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L))
          .as("n_post_drop"),
        sum(when(col("o_orderpriority").isNotNull, 1L).otherwise(0L))
          .as("n_pre_drop"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status")
  }

  /** Deterministically SKEWED big-dim join (X223, round 13 — the AQE
    * proof leg of the q222 SMJ regime): at 100 TB the shuffled fact
    * side IS skewed, and the claim "AQE is free to skew-split the
    * exchanges" needs a metrics assert, not a scaladoc. The fact maps
    * ~three quarters of lineitem onto ONE hot join key (orderkeys not
    * divisible by 4 collapse to key 0 — the X35 salt-fixture
    * convention: skew planted by a deterministic rule any engine can
    * replay); the dim covers the same key domain as plain rows (the
    * kept orders plus one declared row for the hot key — deliberately
    * NOT an aggregate, because `OptimizeSkewedJoin` only rewrites an
    * SMJ whose children are bare Sort-over-Exchange; an agg riding the
    * dim's exchange would sit between them and mask the skew from the
    * rule).
    *
    * TWO FACES, one result. The ORACLE face (`fanOut = 0`) leaves the
    * plan to Spark: the dim here is tiny, so the right plan is the
    * broadcast join Spark picks — the SMJ regime's COST is already
    * q222's oracle-gated row, and re-paying it here against a
    * hash-join DuckDB twin would only fail the floor-adjusted weak
    * rule for a plan no engine would choose on this dim. The PROBE
    * face (`fanOut > 0`, Round13Spec) is where the skew claim lives:
    * the fact is fanned out (skew splits happen at MAPPER boundaries,
    * and the local single-row-group parquet scans as ONE task — one
    * mapper leaves the hot partition nothing to split at, while a
    * 100 TB fact arrives as thousands of row-group parts), the join is
    * declared `merge` exactly like q222, the AQE skew knobs drop to
    * local scale, and the executed plan must show the skew-split SMJ
    * (`skew=true`) with the result EQUAL to the oracle face — the
    * split is proven result-invariant, which is what makes it safe to
    * rely on at 100 TB. */
  def q226SkewedBigDim(spark: SparkSession, dir: String,
      fanOut: Int = 0): DataFrame = {
    val hot = (k: org.apache.spark.sql.Column) =>
      when(pmod(k, lit(4)) === 0, k).otherwise(lit(0L))
    val li0 = Tables.load(spark, dir, "lineitem")
    val li = (if (fanOut > 0) li0.repartition(fanOut) else li0)
      .select(hot(col("l_orderkey")).as("k"),
        col("l_extendedprice"), col("l_discount"))
    val d0 = Tables.load(spark, dir, "orders")
      .where(pmod(col("o_orderkey"), lit(4)) === 0)
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"))
      .unionAll(spark.range(1)
        .select(lit(0L).as("k"), lit("0-HOT").as("prio")))
    val d = if (fanOut > 0) d0.hint("merge") else d0
    // revenue in exact INTEGER-CENTS arithmetic: extprice×(1−discount)
    // = cents(extprice) × (100 − cents(discount)) / 10⁴ as rationals,
    // so summing the long products and dividing once at the end is
    // value-identical to the q01 decimal rule — and a long multiply per
    // row where Spark's Decimal path allocates per-row BigDecimals (the
    // arithmetic regime q222 deliberately keeps; this row's claim is
    // the skew handling, not decimal execution). Max |sum| ≈ 2×10¹⁴ at
    // sf0.1 (2×10¹⁵ at the sweep's sf1 rung) — inside the 2⁵³ double
    // window AND the long range, so the final double is the correctly
    // rounded value of the exact rational in both engines.
    li.join(d, "k")
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(round(col("l_extendedprice") * 100).cast("long") *
             (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .cast("double") / lit(10000.0)).as("revenue"))
      .orderBy("prio")
  }

  def q55SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey").as("suppkey"),
        col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val s = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    graft.operators.Skew.saltedJoin(li, s, "suppkey", salts = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy("s_name")
  }

  /** CSV schema-drift census (X224, round 14): the Glue-crawler leg of
    * the reference drifts in CSV, not parquet (README.md:5-7 — the
    * crawlers infer schemas over the transformed CSVs), so the drift
    * family gets its CSV face: a two-epoch CSV corpus whose producer
    * added a column AND whose price column widens integer→double
    * VISIBLE ONLY THROUGH INFERENCE (epoch-1 wrote whole-dollar
    * integrals; see [[graft.sources.SchemaDrift.stageOrdersCsvDrift]]),
    * read per-epoch with crawler-inferred schemas, cast to the widest
    * lattice type and unioned by name
    * ([[graft.sources.SchemaDrift.readCsvMerged]]). The census pins all
    * three semantics at once: row/key conservation (n, key_sum), the
    * addition leg (n_pre_drift / n_priorities — NULLs sit exactly on
    * pre-drift files), and the inference-widening leg (cents_sum —
    * epoch-1 prices are the files' ACTUAL whole-dollar values, replayed
    * by the oracle as round(price)::BIGINT::DOUBLE). All aggregates
    * integer-exact. */
  def q227CsvDrift(spark: SparkSession, dir: String): DataFrame = {
    val corpus = graft.sources.SchemaDrift.stageOrdersCsvDrift(spark, dir)
    graft.sources.SchemaDrift.readCsvMerged(spark, corpus)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L))
          .as("n_pre_drift"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_sum"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status")
  }

  /** CSV rename-face drift census (X224 rename leg, round 15): epoch 2
    * RENAMED the price column (`total_price`) while its values widened
    * integer→double through inference
    * ([[graft.sources.SchemaDrift.stageOrdersCsvRenameDrift]]); the
    * declared rename map folds the new name back onto the canonical one
    * BEFORE widening, so the census reads ONE price column spanning both
    * epochs. `n_null_price` is the unification gate: a read without the
    * map forks the price into two half-null columns (rename ≡ drop+add
    * to the lattice — Round15Spec pins the fork), which would surface
    * here as non-zero nulls and a halved cents_sum; the oracle replays
    * zero nulls and the full epoch-aware sum from the flat table. */
  def q228CsvRenameDrift(spark: SparkSession, dir: String): DataFrame = {
    val corpus =
      graft.sources.SchemaDrift.stageOrdersCsvRenameDrift(spark, dir)
    graft.sources.SchemaDrift.readCsvMerged(spark, corpus,
        renames = Map("total_price" -> "o_totalprice"))
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L))
          .as("n_null_price"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_sum"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status")
  }
}
