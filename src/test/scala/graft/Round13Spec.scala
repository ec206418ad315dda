package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SchemaDrift
import graft.operators.AnnSearch

/** Round-13 contracts: the long-vs-float widening fallback (the r12
  * ADVICE reader-upcast hole), nested-struct drift (widen recursion +
  * the q224 census), column-drop drift (q225), the AQE skew-split
  * proof on the big-dim SMJ regime (q226), the exact-vs-LSH cosine
  * auto-route, and the Caching.scoped forked-thread escape pinned as a
  * negative spec. */
class Round13Spec extends AnyFunSuite {
  import TestSpark._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // action on THIS QueryExecution — AQE finalizes in place
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  test("long-vs-float drift: readWidened refuses the lossy int64->double requested-schema read and takes the union path, values exact") {
    // the r12 ADVICE hole: Spark's vectorized parquet reader does NOT
    // perform the lossy int64→double promotion — a LONG epoch next to a
    // FLOAT/DOUBLE epoch must go through the explicit per-epoch
    // cast+union, not a declared-schema single scan that would fail at
    // read time with SchemaColumnConvertNotSupportedException
    val out = java.nio.file.Files.createTempDirectory("graft-longfloat").toString
    val o = Tables.load(spark, sf, "orders").limit(200)
    o.where(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"), col("o_custkey")) // bigint epoch
      .write.mode("overwrite").parquet(s"$out/epoch=1")
    o.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"),
        col("o_custkey").cast("float").as("o_custkey")) // float epoch
      .write.mode("overwrite").parquet(s"$out/epoch=2")
    val got = SchemaDrift.readWidened(spark, out)
    assert(got.schema("o_custkey").dataType == DoubleType)
    val plan = finalPlan(got)
    assert(plan.contains("Union"),
      s"long-vs-float drift must take the per-epoch union path:\n$plan")
    val want = o.select(col("o_orderkey"),
      when(pmod(col("o_orderkey"), lit(2)) === 0,
        col("o_custkey").cast("double"))
        .otherwise(col("o_custkey").cast("float").cast("double"))
        .as("o_custkey"))
      .collect().map(_.toString).sorted
    assert(got.collect().map(_.toString).sorted.sameElements(want))
  }

  test("widen lattice: nested struct recursion — shared fields widen, added fields union, cross-kind refuses, arrays by element") {
    val s1 = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    val s2 = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("c", DoubleType)))
    assert(SchemaDrift.widen(s1, s2).contains(StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))))
    // identical structs are the identity
    assert(SchemaDrift.widen(s1, s1).contains(s1))
    // nested cross-kind drift refuses exactly like a top-level one
    val bad = StructType(Seq(StructField("a", StringType)))
    assert(SchemaDrift.widen(s1, bad).isEmpty)
    // arrays widen by element; element refusal propagates
    assert(SchemaDrift.widen(ArrayType(IntegerType), ArrayType(LongType))
      .contains(ArrayType(LongType, containsNull = true)))
    assert(SchemaDrift.widen(ArrayType(IntegerType), ArrayType(StringType)).isEmpty)
    // struct-of-array-of-struct: recursion composes
    val deep1 = StructType(Seq(StructField("xs",
      ArrayType(StructType(Seq(StructField("v", IntegerType)))))))
    val deep2 = StructType(Seq(StructField("xs",
      ArrayType(StructType(Seq(StructField("v", LongType),
        StructField("w", StringType)))))))
    assert(SchemaDrift.widen(deep1, deep2).contains(StructType(Seq(
      StructField("xs", ArrayType(StructType(Seq(StructField("v", LongType),
        StructField("w", StringType)))))))))
  }

  test("nested widen probe: declared struct schema reads a missing nested field as NULL and upcasts nested int32 per file") {
    // pins the Spark-4 reader capability the recursive readerUpcastable
    // relies on (the nested analogue of WidenProbeSpec)
    val dir = java.nio.file.Files.createTempDirectory("nestedprobe").toString
    spark.range(3)
      .selectExpr("named_struct('v', cast(id as int)) as m")
      .write.parquet(s"$dir/f")
    val declared = StructType(Seq(StructField("m", StructType(Seq(
      StructField("v", LongType), StructField("w", StringType))))))
    val rows = spark.read.schema(declared).parquet(s"$dir/f")
      .select(col("m.v"), col("m.w")).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(rows.forall(_.isNullAt(1)))
  }

  test("readWidened over a nested-addition corpus: ONE declared-schema scan, rows == replay") {
    val corpus = SchemaDrift.stageOrdersNested(spark, sf)
    val got = SchemaDrift.readWidened(spark, corpus)
    val mt = got.schema("meta").dataType.asInstanceOf[StructType]
    assert(mt.fieldNames.toSeq ==
      Seq("o_orderstatus", "o_totalprice", "o_orderpriority"))
    val plan = finalPlan(got)
    assert(!plan.contains("Union"),
      s"nested addition should ride the single declared-schema scan:\n$plan")
    val o = Tables.load(spark, sf, "orders")
    val want = o.select(col("o_orderkey"),
      struct(col("o_orderstatus"), col("o_totalprice"),
        when(pmod(col("o_orderkey"), lit(2)) === 1, col("o_orderpriority"))
          .as("o_orderpriority")).as("meta"))
      .collect().map(_.toString).sorted
    assert(got.collect().map(_.toString).sorted.sameElements(want))
  }

  test("readWidened over nested TYPE WIDENING: struct field int->long widens through the recursion, single scan, values exact") {
    // the recursion path Round13Spec's addition test doesn't reach:
    // epochs disagree on a NESTED field's type (meta.v int vs long) —
    // widen() recurses to LongType, readerUpcastable recurses (the
    // reader upcasts nested int32 per file, pinned by the probe row),
    // so the corpus still reads as ONE declared-schema scan
    val out = java.nio.file.Files.createTempDirectory("graft-nestwiden").toString
    val o = Tables.load(spark, sf, "orders").limit(200)
    o.where(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"),
        struct(col("o_custkey").cast("int").as("v")).as("meta"))
      .write.mode("overwrite").parquet(s"$out/epoch=1")
    o.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"),
        struct(col("o_custkey").as("v"),
          col("o_orderstatus").as("s")).as("meta"))
      .write.mode("overwrite").parquet(s"$out/epoch=2")
    val got = SchemaDrift.readWidened(spark, out)
    val mt = got.schema("meta").dataType.asInstanceOf[StructType]
    assert(mt("v").dataType == LongType, mt.toString)
    assert(mt.fieldNames.toSeq == Seq("v", "s"))
    val plan = finalPlan(got)
    assert(!plan.contains("Union"),
      s"nested widening should ride the single declared-schema scan:\n$plan")
    val want = o.select(col("o_orderkey"),
      struct(col("o_custkey").as("v"),
        when(pmod(col("o_orderkey"), lit(2)) === 1, col("o_orderstatus"))
          .as("s")).as("meta"))
      .collect().map(_.toString).sorted
    assert(got.collect().map(_.toString).sorted.sameElements(want))
    // and a nested DECIMAL re-scale (a widening the reader can't do)
    // falls back to the per-epoch alignColumn union, still exact
    val out2 = java.nio.file.Files.createTempDirectory("graft-nestdec").toString
    o.where(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"),
        struct(col("o_totalprice").cast(DecimalType(12, 2)).as("p")).as("meta"))
      .write.mode("overwrite").parquet(s"$out2/epoch=1")
    o.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"),
        struct(col("o_totalprice").cast(DecimalType(14, 4)).as("p")).as("meta"))
      .write.mode("overwrite").parquet(s"$out2/epoch=2")
    val got2 = SchemaDrift.readWidened(spark, out2)
    assert(got2.schema("meta").dataType.asInstanceOf[StructType]("p")
      .dataType == DecimalType(14, 4))
    val plan2 = finalPlan(got2)
    assert(plan2.contains("Union"),
      s"nested decimal re-scale must take the aligned union path:\n$plan2")
    val want2 = o.select(col("o_orderkey"),
      struct(when(pmod(col("o_orderkey"), lit(2)) === 0,
          col("o_totalprice").cast(DecimalType(12, 2)).cast(DecimalType(14, 4)))
        .otherwise(col("o_totalprice").cast(DecimalType(14, 4))).as("p"))
        .as("meta"))
      .collect().map(_.toString).sorted
    assert(got2.collect().map(_.toString).sorted.sameElements(want2))
  }

  test("q224 nested-drift census == flat replay; nested-schema pruning reaches the scan") {
    val got = SparkEntry.queries("q224_nested_drift")(spark, sf).collect()
    assert(got.nonEmpty)
    val o = Tables.load(spark, sf, "orders")
    val want = o.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(when(pmod(col("o_orderkey"), lit(2)) === 0, 1L).otherwise(0L))
          .as("n_pre_drift"),
        countDistinct(when(pmod(col("o_orderkey"), lit(2)) === 1,
          col("o_orderpriority"))).as("n_priorities"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents_sum"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    // nested-schema pruning: a probe touching ONE leaf reads one leaf —
    // a drifted nested corpus scans no wider than the fields asked for
    val corpus = SchemaDrift.stageOrdersNested(spark, sf)
    val probe = SchemaDrift.readMerged(spark, corpus)
      .groupBy(col("meta.o_orderstatus").as("status")).count()
    val plan = finalPlan(probe)
    val readSchema = plan.split('\n').find(_.contains("ReadSchema"))
      .getOrElse(plan.substring(plan.indexOf("ReadSchema")).takeWhile(_ != '\n'))
    assert(readSchema.contains("o_orderstatus"), readSchema)
    assert(!readSchema.contains("o_totalprice"),
      s"unaccessed nested leaf survived pruning: $readSchema")
  }

  test("q225 drop-drift census == flat replay; the NULLs sit on POST-drift files (the q220 inversion)") {
    val got = SparkEntry.queries("q225_drop_drift")(spark, sf).collect()
    assert(got.nonEmpty)
    val o = Tables.load(spark, sf, "orders")
    val want = o.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(when(pmod(col("o_orderkey"), lit(2)) === 1, 1L).otherwise(0L))
          .as("n_post_drop"),
        sum(when(pmod(col("o_orderkey"), lit(2)) === 0, 1L).otherwise(0L))
          .as("n_pre_drop"),
        countDistinct(when(pmod(col("o_orderkey"), lit(2)) === 0,
          col("o_orderpriority"))).as("n_priorities"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
    // the inversion itself, row-level: priority is NULL exactly on odd
    // (post-drop) keys in the merged read
    val corpus = SchemaDrift.stageOrdersDrop(spark, sf)
    val merged = SchemaDrift.readMerged(spark, corpus)
    assert(merged.where(col("o_orderpriority").isNull &&
      pmod(col("o_orderkey"), lit(2)) === 0).count() == 0)
    assert(merged.where(col("o_orderpriority").isNotNull &&
      pmod(col("o_orderkey"), lit(2)) === 1).count() == 0)
  }

  test("q226 skewed big-dim SMJ: AQE OptimizeSkewedJoin fires at local thresholds, oracle row unchanged") {
    // baseline result under the session defaults (what the driver's
    // correctness gate sees)
    val base = SparkEntry.queries("q226_skewed_bigdim")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(base.nonEmpty)
    // the default 256 MB skew threshold can't see local-SF skew, so the
    // probe lowers AQE's knobs to the data's scale — the planted skew
    // (3/4 of lineitem on one key) is then exactly what
    // OptimizeSkewedJoin exists to split. forceOptimizeSkewedJoin keeps
    // the rule from declining over the extra-shuffle cost heuristic at
    // toy sizes.
    val knobs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "3k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1k")
    val prev = knobs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    knobs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fanOut recreates the multi-part cluster layout: skew splits
      // happen at mapper boundaries, and the local single-row-group
      // file scans as one task (see the q226 scaladoc)
      val df = graft.queries.StarQueries.q226SkewedBigDim(spark, sf,
        fanOut = 8)
      val plan = finalPlan(df)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"dim was broadcast despite the merge declaration:\n$plan")
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire (no skew=true in the final plan):\n$plan")
      // and splitting the hot partition changed nothing — the oracle
      // row is independent of AQE's slicing
      assert(df.collect().map(_.toString).toSeq == base)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("cosine auto-route: threshold rule picks the exact grid, size rule picks LSH, both plans asserted") {
    val e = Tables.load(spark, sf, "embeddings")
    // θ < 0.8 → exact block-grid, no count job, regardless of size
    val exact = AnnSearch.cosineNearDupPairsAuto(e, threshold = 0.4,
      knownRows = Long.MaxValue)
    val exactPlan = exact.queryExecution.optimizedPlan.toString
    assert(!exactPlan.toLowerCase.contains("paircombinations"),
      s"low threshold must not route to LSH:\n$exactPlan")
    assert(exactPlan.contains("sequence"), // the grid replication key
      s"expected the block-grid shape:\n$exactPlan")
    // θ ≥ 0.8 and a corpus above the exact bound → LSH buckets
    val lsh = AnnSearch.cosineNearDupPairsAuto(e, threshold = 0.9,
      knownRows = (1L << 20) + 1)
    val lshPlan = lsh.queryExecution.optimizedPlan.toString
    assert(lshPlan.toLowerCase.contains("paircombinations"),
      s"high threshold + big corpus must route to LSH buckets:\n$lshPlan")
    // θ ≥ 0.8 but a small corpus → exact (flops are affordable)
    val smallExact = AnnSearch.cosineNearDupPairsAuto(e, threshold = 0.9,
      knownRows = 100)
    assert(!smallExact.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("paircombinations"))
    // and q33's oracle face is byte-identical through the route
    val viaRoute = graft.queries.CorpusQueries.embedNearDup(spark, sf)
      .collect().map(_.toString).toSeq
    val direct = AnnSearch.cosineNearDupPairs(e, 0.4)
      .orderBy("vec_a", "vec_b").collect().map(_.toString).toSeq
    assert(viaRoute == direct)
  }

  test("Caching.scoped: a forked-thread persist ESCAPES the scope; a same-thread one is released (the documented contract, pinned)") {
    import org.apache.spark.storage.StorageLevel
    // forked thread: tracked() registers nothing (plain ThreadLocal —
    // the deliberate InheritableThreadLocal trade-off in the scaladoc),
    // so the persist survives scope exit. This spec DEMONSTRATES the
    // escape so the contract can't rot silently.
    @volatile var forked: org.apache.spark.sql.DataFrame = null
    Caching.scoped {
      val t = new Thread(() => {
        forked = Caching.tracked(
          Tables.load(spark, sf, "nation").select(col("n_nationkey") + 13))
        forked.count()
        (): Unit
      })
      t.start(); t.join()
    }
    try {
      assert(forked.storageLevel != StorageLevel.NONE,
        "forked-thread persist was released by a scope that never tracked " +
          "it — the documented escape no longer holds; update " +
          "Caching.scala's contract and this spec together")
    } finally forked.unpersist(blocking = true)
    // same thread: tracked + released on scope exit (async — poll)
    var same: org.apache.spark.sql.DataFrame = null
    Caching.scoped {
      same = Caching.tracked(
        Tables.load(spark, sf, "nation").select(col("n_nationkey") + 29))
      same.count()
    }
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (same.storageLevel != StorageLevel.NONE &&
           System.nanoTime() < deadline) Thread.sleep(50)
    assert(same.storageLevel == StorageLevel.NONE,
      "same-thread tracked persist survived its scope")
  }
}
