package graft

import org.apache.spark.sql.SparkSession

/** Scratch component-timing harness for perf A/Bs (not part of the
  * SparkEntry contract; QBench times whole registered queries, this
  * times ad-hoc sub-plans named on the command line). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        println(f"[probe] $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    args.foreach {
      case "lsh" => time("lshTopK only") {
        val e = Tables.load(spark, sfDir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("q"))
        val c = e.filter(col("vec_id") >= 10).select("vec_id", "embedding")
        graft.operators.AnnSearch.lshTopK(q, c, k = 5, numTables = 8, planesPerTable = 6)
      }
      case "dim" =>
        (1 to reps).foreach { i =>
          val t0 = System.nanoTime()
          val e = Tables.load(spark, sfDir, "embeddings")
          e.filter(col("vec_id") >= 10)
            .agg(min(size(col("embedding"))), max(size(col("embedding")))).head()
          println(f"[probe] corpusDim rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      case "cand" => time("buckets+distinct") {
        val e = Tables.load(spark, sfDir, "embeddings")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("q"))
        val c = e.filter(col("vec_id") >= 10)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val planes = graft.operators.AnnSearch.lshPlanes(8, 6, 64, 42L)
        def sigs(vec: org.apache.spark.sql.Column) = array(planes.zipWithIndex.map {
          case (ps, t) => struct(lit(t).as("t"),
            graft.operators.AnnSearch.lshSignature(vec, ps).as("sig"))
        }: _*)
        val cbuck = c.select(col("vec_id"), explode(sigs(col("embedding"))).as("b"))
          .select(col("vec_id"), col("b.t"), col("b.sig"))
        val qbuck = q.select(col("query_id"), explode(sigs(col("q"))).as("b"))
          .select(col("query_id"), col("b.t"), col("b.sig"))
        qbuck.join(cbuck, Seq("t", "sig")).select("query_id", "vec_id").distinct()
      }
      case "cbuck" => time("corpus bucket projection only") {
        val e = Tables.load(spark, sfDir, "embeddings")
        val c = e.filter(col("vec_id") >= 10)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val planes = graft.operators.AnnSearch.lshPlanes(8, 6, 64, 42L)
        def sigs(vec: org.apache.spark.sql.Column) = array(planes.zipWithIndex.map {
          case (ps, t) => struct(lit(t).as("t"),
            graft.operators.AnnSearch.lshSignature(vec, ps).as("sig"))
        }: _*)
        c.select(col("vec_id"), explode(sigs(col("embedding"))).as("b"))
          .select(col("vec_id"), col("b.t"), col("b.sig"))
      }
      case "split" =>
        (1 to reps).foreach { i =>
          val e = Tables.load(spark, sfDir, "embeddings")
          val c = e.filter(col("vec_id") >= 10)
            .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
          val planes = graft.operators.AnnSearch.lshPlanes(8, 6, 64, 42L)
          def sigs(vec: org.apache.spark.sql.Column) = array(planes.zipWithIndex.map {
            case (ps, t) => struct(lit(t).as("t"),
              graft.operators.AnnSearch.lshSignature(vec, ps).as("sig"))
          }: _*)
          val df = c.select(col("vec_id"), explode(sigs(col("embedding"))).as("b"))
            .select(col("vec_id"), col("b.t"), col("b.sig"))
          val t0 = System.nanoTime()
          df.queryExecution.executedPlan // analysis + optimize + physical plan
          val t1 = System.nanoTime()
          df.collect()
          val t2 = System.nanoTime()
          println(f"[probe] split rep $i: plan ${(t1 - t0) / 1e9}%.2f s exec ${(t2 - t1) / 1e9}%.2f s")
          if (i == reps) println(df.queryExecution.executedPlan.toString.take(2500))
        }
      case "q80parts" =>
        import org.apache.spark.sql.graftsql.{columnExpr, exprColumn}
        val li = Tables.load(spark, sfDir, "lineitem")
          .select(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"))
        (1 to reps).foreach { i =>
          val pre = li.repartition(cpus.toInt)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val t0 = System.nanoTime()
          pre.count()
          val t1 = System.nanoTime()
          val sk = pre.groupBy(col("l_returnflag")).agg(
            exprColumn(graft.functions.QDigestAgg(columnExpr(col("cents")), 24, 2048)
              .toAggregateExpression()).as("__sk"),
            count(lit(1)).as("__n"))
          sk.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          val gridWidth = math.pow(2.0, 12.0)
          val bucketed = pre.select(col("l_returnflag"), col("cents").cast("double").as("__v"))
            .withColumn("__b", floor(col("__v") / lit(gridWidth)).cast("long"))
          bucketed.groupBy(col("l_returnflag"), col("__b"))
            .agg(count(lit(1)).as("__bn"))
            .write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          println(f"[probe] q80 rep $i: persist ${(t1 - t0) / 1e9}%.2f sketch ${(t2 - t1) / 1e9}%.2f grid ${(t3 - t2) / 1e9}%.2f")
          pre.unpersist(blocking = true)
        }
      case "rddparts" =>
        (1 to reps).foreach { i =>
          val li = Tables.load(spark, sfDir, "lineitem")
            .select(col("l_returnflag"),
              round(col("l_extendedprice") * 100).cast("long").as("cents"))
          val t0 = System.nanoTime()
          val np = li.rdd.getNumPartitions
          val t1 = System.nanoTime()
          val nf = li.inputFiles.length
          val t2 = System.nanoTime()
          println(f"[probe] rddparts rep $i: .rdd $np parts ${(t1 - t0) / 1e9}%.3f s; inputFiles $nf ${(t2 - t1) / 1e9}%.3f s")
        }
      case other => println(s"[probe] unknown: $other")
    }
    spark.stop()
  }
}
