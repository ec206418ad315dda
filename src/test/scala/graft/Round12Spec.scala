package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SchemaDrift

/** Round-12 contracts: type-widening schema drift (the loud
  * mergeSchema failure + the cast-to-widest read), the streaming face
  * of column-addition drift (checkpointed parity with the batch
  * mergeSchema read), the deliberate big-dim SortMergeJoin regime, and
  * the q80 estimates/probes split (same output, fixture-clean cache). */
class Round12Spec extends AnyFunSuite {
  import TestSpark._

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // action on THIS QueryExecution — AQE finalizes in place
    val p = df.queryExecution.executedPlan.toString
    val cut = p.indexOf("== Initial Plan ==")
    if (cut >= 0) p.substring(0, cut) else p
  }

  test("widen lattice: integral and float chains, cross-kind, decimal, refusal") {
    assert(SchemaDrift.widen(IntegerType, LongType).contains(LongType))
    assert(SchemaDrift.widen(LongType, ShortType).contains(LongType))
    assert(SchemaDrift.widen(FloatType, DoubleType).contains(DoubleType))
    assert(SchemaDrift.widen(StringType, StringType).contains(StringType))
    // int next to float surfaces as double (SQL numeric promotion)
    assert(SchemaDrift.widen(IntegerType, FloatType).contains(DoubleType))
    assert(SchemaDrift.widen(DoubleType, LongType).contains(DoubleType))
    // decimal: max integer digits + max scale, capped at 38
    assert(SchemaDrift.widen(DecimalType(12, 2), DecimalType(18, 2))
      .contains(DecimalType(18, 2)))
    // (12,2) has 10 integer digits, (14,4) has 10: widest = 10 + scale 4
    assert(SchemaDrift.widen(DecimalType(12, 2), DecimalType(14, 4))
      .contains(DecimalType(14, 4)))
    // cross-kind drift is a producer bug, not evolution: refuse
    assert(SchemaDrift.widen(IntegerType, StringType).isEmpty)
    assert(SchemaDrift.widen(StringType, DoubleType).isEmpty)
    // decimal whose widest form exceeds the precision cap has NO
    // lossless target — refuse, never clamp (a clamped type would
    // silently overflow epoch values)
    assert(SchemaDrift.widen(DecimalType(38, 0), DecimalType(20, 10)).isEmpty)
  }

  test("decimal widening reads through the explicit-cast union path, values exact") {
    // the parquet reader's own upcasts don't cover decimal re-scaling
    // (WidenProbeSpec pins only int/float), so a decimal-drifted corpus
    // must take the per-epoch cast path — and still come out exact
    val out = java.nio.file.Files.createTempDirectory("graft-decwiden").toString
    val o = Tables.load(spark, sf, "orders").limit(200)
    o.where(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("price"))
      .write.mode("overwrite").parquet(s"$out/epoch=1")
    o.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(14, 4)).as("price"))
      .write.mode("overwrite").parquet(s"$out/epoch=2")
    val got = SchemaDrift.readWidened(spark, out)
    assert(got.schema("price").dataType == DecimalType(14, 4))
    val plan = finalPlan(got)
    assert(plan.contains("Union"), s"expected the per-epoch union path:\n$plan")
    val want = o.select(col("o_orderkey"),
      when(pmod(col("o_orderkey"), lit(2)) === 0,
        col("o_totalprice").cast(DecimalType(12, 2)).cast(DecimalType(14, 4)))
        .otherwise(col("o_totalprice").cast(DecimalType(14, 4))).as("price"))
      .collect().map(_.toString).sorted
    assert(got.collect().map(_.toString).sorted.sameElements(want))
  }

  test("mergeSchema HARD-FAILS on the type-widened corpus (the loud contract)") {
    val corpus = SchemaDrift.stageOrdersWiden(spark, sf)
    val e = intercept[Throwable] {
      SchemaDrift.readMerged(spark, corpus).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.contains("merge"),
      s"expected a schema-merge failure, got: ${e.getClass.getName}: $msg")
  }

  test("readWidened == the cast-to-widest replay from the source table") {
    val corpus = SchemaDrift.stageOrdersWiden(spark, sf)
    val got = SchemaDrift.readWidened(spark, corpus)
    // widened schema: custkey back to bigint, totalprice back to double,
    // the added column present
    val st = got.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(st("o_custkey") == LongType, st.toString)
    assert(st("o_totalprice") == DoubleType, st.toString)
    assert(st.contains("o_orderpriority"))
    val o = Tables.load(spark, sf, "orders")
    val expected = o.select(
      col("o_orderkey"),
      col("o_custkey"), // int→bigint is value-preserving
      col("o_orderstatus"),
      // epoch-1 prices round-tripped through FLOAT — the file's actual value
      when(pmod(col("o_orderkey"), lit(2)) === 0,
        col("o_totalprice").cast("float").cast("double"))
        .otherwise(col("o_totalprice")).as("o_totalprice"),
      when(pmod(col("o_orderkey"), lit(2)) === 1, col("o_orderpriority"))
        .as("o_orderpriority"))
    val g = got.collect().map(_.toString).sorted
    val w = expected.collect().map(_.toString).sorted
    assert(g.length == w.length, s"${g.length} vs ${w.length} rows")
    assert(g.sameElements(w),
      s"first diff: ${g.zip(w).find(p => p._1 != p._2)}")
    // and the float leg genuinely changed values (the drift is REAL:
    // at least one epoch-1 price differs from its double original)
    val diffCount = o.select(col("o_orderkey"), col("o_totalprice"))
      .where(pmod(col("o_orderkey"), lit(2)) === 0 &&
        col("o_totalprice").cast("float").cast("double") =!= col("o_totalprice"))
      .count()
    assert(diffCount > 0, "float round-trip changed no value — the widening leg is vacuous")
  }

  test("readWidened rename map: a renamed column unifies instead of forking into two half-NULL ones") {
    val out = java.nio.file.Files.createTempDirectory("graft-rename").toString
    val o = Tables.load(spark, sf, "orders").limit(100)
    // epoch 1: the producer's old name (and old INT type — rename and
    // widening compose); epoch 2: the canonical name
    o.select(col("o_orderkey"),
        col("o_custkey").cast("int").as("cust_id"))
      .where(pmod(col("o_orderkey"), lit(2)) === 0)
      .write.mode("overwrite").parquet(s"$out/epoch=1")
    o.select(col("o_orderkey"), col("o_custkey"))
      .where(pmod(col("o_orderkey"), lit(2)) === 1)
      .write.mode("overwrite").parquet(s"$out/epoch=2")
    val got = SchemaDrift.readWidened(spark, out,
      renames = Map("cust_id" -> "o_custkey"))
    assert(got.columns.toSeq == Seq("o_orderkey", "o_custkey"))
    assert(got.schema("o_custkey").dataType == LongType)
    // every row carries a custkey — no half-NULL fork
    assert(got.where(col("o_custkey").isNull).count() == 0)
    val want = o.select("o_orderkey", "o_custkey")
      .collect().map(_.toString).sorted
    assert(got.collect().map(_.toString).sorted.sameElements(want))
    // and WITHOUT the mapping the fork is visible (the reason the
    // mapping must be declared): two columns, each half NULL
    val forked = SchemaDrift.readWidened(spark, out)
    assert(forked.columns.toSet == Set("o_orderkey", "cust_id", "o_custkey"))
    assert(forked.where(col("cust_id").isNull).count() > 0)
  }

  test("readWidened refuses a corpus with non-widenable drift, naming the column") {
    val out = java.nio.file.Files.createTempDirectory("graft-badwiden").toString
    val o = Tables.load(spark, sf, "orders").limit(10)
    o.select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$out/epoch=1")
    o.select(col("o_orderkey").cast("string").as("o_orderkey"),
        col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$out/epoch=2")
    val e = intercept[IllegalArgumentException] {
      SchemaDrift.readWidened(spark, out)
    }
    assert(e.getMessage.contains("o_orderkey"))
  }

  test("streaming drift face: checkpointed ingest across a column addition == batch mergeSchema read") {
    // a landing zone that drifts WHILE a checkpointed stream ingests it:
    // epoch-1 files land and are processed; the producer adds a column;
    // epoch-2 files land; the stream resumes from the SAME checkpoint
    // with the refreshed merged schema. Exactly-once requires epoch-1
    // to not replay; per-file NULL semantics require the union of all
    // processed rows to equal the batch mergeSchema read of the final
    // corpus.
    val corpus = java.nio.file.Files.createTempDirectory("graft-driftstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-driftstream-ckpt").toString
    val o = Tables.load(spark, sf, "orders")
    o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .where(pmod(col("o_orderkey"), lit(2)) === 0)
      .write.mode("overwrite").parquet(s"$corpus/epoch=1")

    val gotRows = scala.collection.mutable.ArrayBuffer.empty[String]
    val batchesSeen = scala.collection.mutable.ArrayBuffer.empty[Long]
    // the FULL post-drift schema, declared up front (the producer's
    // contract announcement); epoch-1 files read the missing column as NULL
    val fullSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderpriority", StringType)))
    def drain(): Unit = {
      val q = SchemaDrift.readMergedStream(spark, corpus, fullSchema)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batchesSeen += id
          gotRows ++= df.collect().map(_.toString)
          (): Unit
        }
        .start()
      q.awaitTermination()
    }
    drain() // epoch 1 only
    val afterEpoch1 = gotRows.size
    assert(afterEpoch1 > 0)
    o.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .where(pmod(col("o_orderkey"), lit(2)) === 1)
      .write.mode("overwrite").parquet(s"$corpus/epoch=2")
    drain() // resume: must pick up ONLY epoch 2
    val batch = SchemaDrift.readMerged(spark, corpus)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .collect().map(_.toString)
    assert(gotRows.size == batch.length,
      s"exactly-once violated: streamed ${gotRows.size} vs batch ${batch.length} " +
        s"(epoch-1 gave $afterEpoch1)")
    assert(gotRows.sorted.sameElements(batch.sorted))
  }

  test("streaming widening face: checkpointed ingest across a TYPE-widening boundary == batch readWidened") {
    // the widening counterpart of the addition-drift stream test: the
    // producer's old files carry (o_custkey INT, o_totalprice FLOAT);
    // the stream declares the WIDEST schema up front (what
    // widenedSchema derives), so Spark's per-file upcast reads the
    // narrow epoch directly — then the widened epoch lands and the
    // stream resumes from the same checkpoint
    val corpus = java.nio.file.Files.createTempDirectory("graft-widenstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-widenstream-ckpt").toString
    val o = Tables.load(spark, sf, "orders")
    o.where(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"),
        col("o_custkey").cast("int").as("o_custkey"),
        col("o_totalprice").cast("float").as("o_totalprice"))
      .write.mode("overwrite").parquet(s"$corpus/epoch=1")
    val fullSchema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderpriority", StringType)))
    val gotRows = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit = {
      val q = SchemaDrift.readMergedStream(spark, corpus, fullSchema)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          gotRows ++= df.collect().map(_.toString)
          (): Unit
        }
        .start()
      q.awaitTermination()
    }
    drain()
    val afterEpoch1 = gotRows.size
    assert(afterEpoch1 > 0)
    o.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$corpus/epoch=2")
    drain()
    val batch = SchemaDrift.readWidened(spark, corpus)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      .collect().map(_.toString)
    assert(gotRows.size == batch.length,
      s"exactly-once violated: ${gotRows.size} vs ${batch.length} (epoch-1 $afterEpoch1)")
    assert(gotRows.sorted.sameElements(batch.sorted))
  }

  test("q221 plan shape: the widened read is ONE declared-schema scan, no per-epoch union") {
    val df = SparkEntry.queries("q221_widened_drift")(spark, sf)
    val plan = finalPlan(df)
    assert(!plan.contains("Union"), s"per-epoch union survived:\n$plan")
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"expected exactly one parquet scan:\n$plan")
  }

  test("q221 widened-drift census: exact replay of both widening legs") {
    val got = SparkEntry.queries("q221_widened_drift")(spark, sf).collect()
    assert(got.nonEmpty)
    // replay from the source table (the oracle's rule, Spark-side)
    val o = Tables.load(spark, sf, "orders")
    val want = o.groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(when(pmod(col("o_orderkey"), lit(2)) === 0, 1L).otherwise(0L))
          .as("n_pre_drift"),
        countDistinct(when(pmod(col("o_orderkey"), lit(2)) === 1,
          col("o_orderpriority"))).as("n_priorities"),
        sum(col("o_custkey")).as("custkey_sum"),
        sum(round(when(pmod(col("o_orderkey"), lit(2)) === 0,
            col("o_totalprice").cast("float").cast("double"))
          .otherwise(col("o_totalprice")) * 100).cast("long")).as("cents_sum"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy("status").collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq)
  }

  test("q222 big-dim join: SortMergeJoin regime, no broadcast") {
    val df = SparkEntry.queries("q222_bigdim_join")(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"dim was broadcast despite the big-dim declaration:\n$plan")
  }

  test("q223 epoch pruning: partition predicate prunes pre-drift files at planning time") {
    val df = SparkEntry.queries("q223_drift_prune")(spark, sf)
    val plan = finalPlan(df)
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n$plan")
    val pf = plan.substring(plan.indexOf("PartitionFilters"))
      .takeWhile(_ != '\n')
    assert(pf.contains("epoch"), s"epoch not in partition filters: $pf")
    // executed-scan proof that pre-drift files were PRUNED, not
    // filtered: the scan's numFiles metric equals the on-disk epoch=2
    // file count and is strictly below the corpus total (inputFiles
    // would not do — it lists pre-pruning metadata)
    val corpus = SchemaDrift.stageOrdersDrift(spark, sf)
    def parquetFiles(p: java.io.File): Seq[java.io.File] =
      if (p.isDirectory) p.listFiles().toSeq.flatMap(parquetFiles)
      else if (p.getName.endsWith(".parquet")) Seq(p) else Nil
    val all = parquetFiles(new java.io.File(corpus))
    val epoch2 = all.count(_.getPath.contains("epoch=2"))
    assert(epoch2 > 0 && epoch2 < all.size)
    // AQE wraps stages so the scan exec isn't reachable by a plain
    // collect — disable it for this metrics probe only (partition
    // pruning is a planning-time property, unaffected)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      val probe = SchemaDrift.readPartitioned(spark, corpus)
        .where(col("epoch") === 2)
        .groupBy("o_orderstatus").count()
      probe.collect()
      probe.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    assert(scans.nonEmpty, "no FileSourceScan found")
    assert(scans.map(_.metrics("numFiles").value).sum == epoch2,
      s"scan read ${scans.map(_.metrics("numFiles").value).sum} files, " +
        s"expected only the $epoch2 epoch-2 files of ${all.size}")
    // row census: epoch-2 rows only (odd orderkeys), none dropped
    val got = df.collect()
    val o = Tables.load(spark, sf, "orders")
    val wantKeySum = o.where(pmod(col("o_orderkey"), lit(2)) === 1)
      .agg(sum("o_orderkey")).head.getLong(0)
    assert(got.map(_.getLong(3)).sum == wantKeySum)
    // and the flat-files face deliberately has NO epoch column (the
    // recursiveFileLookup contrast documented on readPartitioned)
    assert(!SchemaDrift.readMerged(spark, corpus).columns.contains("epoch"))
  }

  test("cachedRddIds: resolves exactly the persisted dataset's cache entry") {
    val df = Tables.load(spark, sf, "nation").select("n_nationkey", "n_name")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      df.count()
      val ids = org.apache.spark.sql.graftsql.cachedRddIds(df)
      assert(ids.size == 1, s"expected exactly one cached RDD id, got $ids")
      assert(ids.subsetOf(spark.sparkContext.getPersistentRDDs.keySet.toSet))
      // an uncached plan resolves to nothing (no false pins)
      val other = Tables.load(spark, sf, "region").select("r_name")
      assert(org.apache.spark.sql.graftsql.cachedRddIds(other).isEmpty)
    } finally df.unpersist(blocking = true)
    assert(org.apache.spark.sql.graftsql.cachedRddIds(df).isEmpty)
  }

  test("q80 split: estimates ⋈ probe fixture == the inline qdigestChecked output") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val fracs = Seq("p50" -> 0.5, "p90" -> 0.9)
    val inline = operators.Sketches.qdigestChecked(li, "l_returnflag",
        "cents", fracs)
      .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val split = SparkEntry.queries("q80_quantile_sketch")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(split == inline)
    // run it twice: the fixture memoizes, output identical, and the
    // only surviving cache entries are pinned fixture RDDs (the
    // builder's scoped block released its tracked intermediate)
    val again = SparkEntry.queries("q80_quantile_sketch")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(again == split)
    // cache discipline: sibling suites sharing the session may hold
    // their own entries, so the scoped assertion is differential —
    // another q80 run must not GROW the unpinned cached set (the
    // fixture is memoized + pinned; the probe pass's tracked
    // intermediate released inside the builder's scope)
    def unpinned(): Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
        .filter(id => !operators.CurationOps.pinnedRddIds.contains(id))
    val before = unpinned()
    SparkEntry.queries("q80_quantile_sketch")(spark, sf).collect()
    val after = unpinned()
    assert(after.subsetOf(before),
      s"q80 re-run grew the unpinned cache: ${after -- before}")
  }
}
