package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NearDup, PrefixSum, Skyline}
import graft.queries.CorpusQueries
import graft.sources.SchemaDrift

/** Round-14 contracts: the two-phase grouped prefix sum replacing the
  * per-source single-task admission window (q69/q82/q191), the CSV
  * face of schema drift (q227 — inference-driven widening), the
  * two-token NULL_IF parity on CSV ingest, the bounded Skyline merge,
  * the exact-vs-MinHash Jaccard auto-route, struct-level NULL
  * preservation on the drift union fallback, and the generator
  * reuse-row / iterator contracts (r13 ADVICE). */
class Round14Spec extends AnyFunSuite {
  import TestSpark._

  // ---- PrefixSum: the X41/X119 two-phase device for running SUMs ----

  test("PrefixSum.groupedRunningSum equals the window formulation on a skewed-source fixture") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one source ≫ others — exactly the heavy-tailed mix that collapses
    // Window.partitionBy("source") onto one task at 100 TB
    val rows = (1 to 5000).map(i => ("big", i.toLong, (i % 7 + 1).toLong)) ++
      (1 to 13).flatMap(i => Seq(
        (s"s${i % 4}", 100000L + i, (i % 5 + 1).toLong))) ++
      // null group key: must form its own group, like the window does
      (1 to 7).map(i => (null.asInstanceOf[String], 200000L + i, 2L))
    val df = rows.toDF("source", "doc_id", "n_tok").repartition(16)
    // AQE would coalesce this byte-small fixture's range exchange to one
    // partition and make the spans-partitions assert vacuous; at real
    // scale the range partitioner's split is the point being pinned
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      val got = PrefixSum.groupedRunningSum(
        df, Seq("source"), Seq(col("doc_id")), "n_tok", "cum")
      // schema passthrough: all input columns + the appended cum
      assert(got.columns.toSeq == df.columns.toSeq :+ "cum")
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum", sum("n_tok").over(w))
      assert(got.collect().map(_.toString).sorted.toSeq ==
        want.collect().map(_.toString).sorted.toSeq)
      // and the dominant source really spans partitions: more than one
      // range partition holds 'big' rows (the whole point of the device)
      val parts = got.where(col("source") === "big")
        .select(spark_partition_id()).distinct().count()
      assert(parts > 1, s"'big' collapsed onto $parts partition(s)")
    } finally prev.fold(spark.conf.unset(coalesceKey))(
      spark.conf.set(coalesceKey, _))
  }

  test("PrefixSum: multi-column + integer group keys, negative values — equals the window formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // (string, int) composite group key, values spanning negative —
    // running sums must fold signed longs exactly like the window does
    val rows = for (s <- Seq("a", "b", null.asInstanceOf[String]);
                    g <- 0 to 2; i <- 1 to 40)
      yield (s, g, (s + "_" + g + "_" + i).hashCode.toLong,
        (i % 9 - 4).toLong)
    val df = rows.toDF("source", "grp", "doc_id", "v").repartition(7)
    val got = PrefixSum.groupedRunningSum(
      df, Seq("source", "grp"), Seq(col("doc_id")), "v", "run")
    val w = Window.partitionBy("source", "grp").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("run", sum("v").over(w))
    assert(got.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
    // the prefix-COUNT face: groupedRank == row_number over the same
    // window, and the internal ones column does not leak
    val gotR = PrefixSum.groupedRank(
      df, Seq("source", "grp"), Seq(col("doc_id")), "rn")
    assert(gotR.columns.toSeq == df.columns.toSeq :+ "rn")
    val wantR = df.withColumn("rn",
      row_number().over(Window.partitionBy("source", "grp")
        .orderBy("doc_id")).cast("long"))
    assert(gotR.collect().map(_.toString).sorted.toSeq ==
      wantR.collect().map(_.toString).sorted.toSeq)
  }

  test("PrefixSum: binary group keys are refused loudly (reference equality would fork groups)") {
    import spark.implicits._
    val df = Seq((Array[Byte](1), 1L, 2L), (Array[Byte](1), 2L, 3L))
      .toDF("k", "doc_id", "v")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.groupedRunningSum(df, Seq("k"), Seq(col("doc_id")), "v")
    }
    assert(e.getMessage.contains("unsupported group key type"))
  }

  test("PrefixSum: NULL values count as 0 (the documented contract)") {
    import spark.implicits._
    val df = Seq(("a", 1L, Some(5L)), ("a", 2L, None), ("a", 3L, Some(7L)))
      .toDF("source", "doc_id", "n_tok")
    val got = PrefixSum.groupedRunningSum(
        df, Seq("source"), Seq(col("doc_id")), "n_tok", "cum")
      .orderBy("doc_id").select("cum").as[Long].collect().toSeq
    assert(got == Seq(5L, 5L, 12L))
  }

  test("q69/q82/q191 + q135/q159/q168: no unbounded window partitions the doc stream by source alone") {
    // the r13 VERDICT's one plan-grade weakness: the admission cut must
    // ride the two-phase prefix sum, not Window.partitionBy("source") —
    // and the per-source RANK rows (prefix COUNT, the same cliff) ride
    // the same device (q88's rank window deliberately stays: its
    // rnk<=k filter plans through the bounded TopKPerKey rewrite)
    for ((name, df) <- Seq(
        "q69" -> CorpusQueries.tokenBudget(spark, sf),
        "q191" -> CorpusQueries.bpeBudget(spark, sf),
        "q82" -> CorpusQueries.curate(spark, sf),
        "q135" -> CorpusQueries.curriculumSchedule(spark, sf),
        "q159" -> CorpusQueries.kFold(spark, sf),
        "q168" -> CorpusQueries.vocabGrowth(spark, sf))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name still plans a Window:\n$plan")
    }
  }

  // ---- CSV face of schema drift (q227) ----

  test("csv drift: per-epoch inference disagrees, widest lattice type wins, merged read replays exactly") {
    val corpus = SchemaDrift.stageOrdersCsvDrift(spark, sf)
    val (epochs, schemas, widest) = SchemaDrift.csvEpochSchemas(spark, corpus)
    assert(epochs.size == 2)
    val s1 = schemas.head; val s2 = schemas.last
    // addition leg: the crawler sees the new column only in epoch 2
    assert(!s1.fieldNames.contains("o_orderpriority"))
    assert(s2.fieldNames.contains("o_orderpriority"))
    // widening leg: whole-dollar epoch infers INTEGRAL, decimal epoch
    // infers DOUBLE — the drift is visible ONLY through inference
    assert(Seq(IntegerType, LongType).contains(s1("o_totalprice").dataType),
      s"epoch-1 price inferred ${s1("o_totalprice").dataType}")
    assert(s2("o_totalprice").dataType == DoubleType)
    assert(widest("o_totalprice").dataType == DoubleType)
    // value replay: merged read == parity replay from the source table
    val got = SchemaDrift.readCsvMerged(spark, corpus)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .collect().map(_.toString).sorted.toSeq
    val o = Tables.load(spark, sf, "orders")
    val even = pmod(col("o_orderkey"), lit(2)) === 0
    val want = o.select(col("o_orderkey"),
        when(even, round(col("o_totalprice")).cast("long").cast("double"))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        when(even, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("o_orderpriority"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  // ---- NULL_IF two-token parity (S8/D5) ----

  test("csv ingest: BOTH reference null tokens ('NULL','null') read as NULL, in string and typed columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nullif").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.csv"),
      "a,b,c\nNULL,x,1\nnull,y,2\nz,null,null\n")
    val schema = StructType(Seq(StructField("a", StringType),
      StructField("b", StringType), StructField("c", IntegerType)))
    val got = graft.sources.Sinks.readCsv(spark, dir, schema)
      .orderBy(asc_nulls_last("b")).collect()
    assert(got.length == 3)
    assert(got(0).isNullAt(0) && got(0).getString(1) == "x" && got(0).getInt(2) == 1)
    assert(got(1).isNullAt(0) && got(1).getString(1) == "y" && got(1).getInt(2) == 2)
    assert(got(2).getString(0) == "z" && got(2).isNullAt(1) && got(2).isNullAt(2))
    // crawler face: inference + the same normalization
    graft.sources.Sinks.crawlCsv(spark, dir, "nullif_crawl_r14")
    val crawled = spark.table("nullif_crawl_r14")
      .orderBy(asc_nulls_last("b")).collect()
    assert(crawled(0).isNullAt(0) && crawled(1).isNullAt(0))
    assert(crawled(2).isNullAt(1))
    spark.sql("DROP TABLE IF EXISTS nullif_crawl_r14")
  }

  // ---- bounded Skyline merge ----

  test("skyline: near-anti-chain input engages the tree merge, frontier unchanged") {
    val n = 1000L
    // quality monotone in cost: nothing dominates anything — every row
    // is a local survivor, the adversarial case for the single merge
    val df = spark.range(n).select(
      col("id").cast("double").as("q"),
      col("id").cast("double").as("c")).repartition(8)
    val (bounded, levels) =
      Skyline.paretoFrontierStats(df, "q", "c", mergeBound = 50L, fanIn = 2)
    assert(levels >= 1, "survivor bound never engaged the tree merge")
    assert(bounded.count() == n) // a true anti-chain's frontier IS the input
    // default bound: direct merge, same frontier
    val (direct, l0) = Skyline.paretoFrontierStats(df, "q", "c", 1L << 20, 8)
    assert(l0 == 0)
    assert(direct.count() == n)
    // and on a normal (dominated) input the bounded path agrees too
    val mixed = spark.range(n).select(
      col("id").cast("double").as("q"),
      (lit(n.toDouble) - col("id")).cast("double").as("c")).repartition(8)
    val want = Skyline.paretoFrontier(mixed, "q", "c")
      .collect().map(_.toString).sorted.toSeq
    val got = Skyline.paretoFrontierStats(mixed, "q", "c", 10L, 2)._1
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  // ---- exact-vs-MinHash Jaccard auto-route ----

  test("jaccard auto-route: low threshold or bounded corpus -> exact; high threshold at scale -> MinHash-LSH") {
    val docs = Tables.load(spark, sf, "documents")
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.analyzed.toString
    // low threshold routes EXACT even at a declared-huge corpus: LSH's
    // S-curve (21 bands x 3 rows centers ~0.36) loses near-threshold
    // pairs below ~0.5
    val lowTheta = plan(NearDup.jaccardPairsAuto(docs, "doc_id", "text",
      threshold = 0.3, knownDocs = 1L << 40))
    assert(lowTheta.contains("n_common") && !lowTheta.contains("band_key"))
    // high threshold, bounded corpus: exact (free exactness)
    val smallCorpus = plan(NearDup.jaccardPairsAuto(docs, "doc_id", "text",
      threshold = 0.8, knownDocs = 1000L))
    assert(smallCorpus.contains("n_common") && !smallCorpus.contains("band_key"))
    // high threshold at scale: LSH banding
    val atScale = plan(NearDup.jaccardPairsAuto(docs, "doc_id", "text",
      threshold = 0.8, knownDocs = 1L << 40))
    assert(atScale.contains("band_key") && !atScale.contains("n_common"))
    // and the routed result IS the routed operator's result (q29/q30's
    // oracles stay the ground truth; this pins the dispatch, values too)
    val got = NearDup.jaccardPairsAuto(docs, "doc_id", "text",
        threshold = 0.8, knownDocs = 1L << 40)
      .collect().map(_.toString).sorted.toSeq
    val want = NearDup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  // ---- struct-level NULL on the drift union fallback (r13 ADVICE medium) ----

  test("readWidened union fallback preserves struct-level NULL (nested decimal re-scale)") {
    val out = java.nio.file.Files.createTempDirectory("graft-structnull").toString
    // nested decimal re-scale is NOT reader-upcastable -> per-epoch
    // cast+union fallback, where struct reassembly must not turn a NULL
    // struct into a non-null struct of all-NULL fields
    spark.range(9).select(col("id"),
        when(pmod(col("id"), lit(3)) === 0,
          lit(null).cast("struct<p:decimal(10,2)>"))
          .otherwise(struct((col("id") * 100).cast("decimal(10,2)").as("p")))
          .as("meta"))
      .write.mode("overwrite").parquet(s"$out/epoch=1")
    spark.range(9, 12).select(col("id"),
        struct((col("id") * 100).cast("decimal(12,4)").as("p")).as("meta"))
      .write.mode("overwrite").parquet(s"$out/epoch=2")
    val got = SchemaDrift.readWidened(spark, out)
    assert(got.schema("meta").dataType ==
      StructType(Seq(StructField("p", DecimalType(12, 4)))))
    val plan = got.queryExecution.analyzed.toString
    assert(plan.contains("Union"), s"expected the union fallback:\n$plan")
    val nulls = got.where(col("meta").isNull).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(nulls == Seq(0L, 3L, 6L),
      s"struct-level NULLs not preserved: $nulls")
    // non-null rows carry the re-scaled value
    val v = got.where(col("id") === 1).select(col("meta.p").cast("string"))
      .collect().head.getString(0)
    assert(v == "100.0000")
  }

  // ---- generator contracts (r13 ADVICE lows) ----

  test("SimHashBandPairs: next() on an exhausted iterator throws, not a stale row") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val bucketType = ArrayType(StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("h", LongType, nullable = false))))
    val bucket = Literal(new GenericArrayData(Array[Any](
      InternalRow(1L, 0L), InternalRow(2L, 0L))), bucketType)
    val masks = Seq(0xFFFFL, 0xFFFF0000L, 0xFFFF00000000L, 0xFFFF000000000000L)
    val expr = graft.functions.SimHashBandPairs(
      bucket, Literal(0), masks, maxHamming = 3)
    val it = expr.eval(InternalRow.empty).iterator
    assert(it.hasNext)
    val r = it.next()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L && r.getLong(2) == 0L)
    assert(!it.hasNext)
    intercept[NoSuchElementException] { it.next() }
  }

  test("reuse-row generators: CodegenFallback is load-bearing — buffering eval() without copy collapses pairs") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val pc = graft.functions.PairCombinations(
      Literal(new GenericArrayData(Array(1L, 2L, 3L)), ArrayType(LongType)))
    // the reuse contract: both generators MUST stay CodegenFallback —
    // GenerateExec's row-based path unsafe-projects each emission
    // before pulling the next, which is what makes the reused output
    // row safe; a codegen'd Generate would buffer raw references
    assert(pc.isInstanceOf[CodegenFallback])
    assert(graft.functions.SimHashBandPairs(
        Literal(new GenericArrayData(Array.empty[Any]),
          ArrayType(StructType(Seq(
            StructField("doc_id", LongType, nullable = false),
            StructField("h", LongType, nullable = false))))),
        Literal(0), Seq(0xFFFFL), 3)
      .isInstanceOf[CodegenFallback])
    // DEMONSTRATE the hazard the contract guards: buffering without
    // copy aliases every entry to the reused row (reads as the LAST
    // pair) — any consumer other than GenerateExec must copy()
    val aliased = pc.eval(InternalRow.empty).iterator.toSeq
    assert(aliased.length == 3)
    assert(aliased.forall(r => r.getLong(0) == 2L && r.getLong(1) == 3L))
    val copied = pc.eval(InternalRow.empty).iterator.map(_.copy()).toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(copied == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
