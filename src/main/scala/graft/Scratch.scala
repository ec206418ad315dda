package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.useV1SourceList", "")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(nm: String)(df: => DataFrame): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 0) println(f"[scratch] $nm rep$i: $dt%.3f s")
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }

    import graft.operators.NearDup
    val docs = Tables.load(spark, sfDir, "documents")
    val n = 4
    val threshold = 0.6
    def sh = NearDup.hashedShingles(docs, "doc_id", "text", n)
    time("sh_only")(sh)
    def dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq)
    def withDf = sh.join(dfreq, Seq("h"))
    def prefixes = withDf
      .groupBy(col("doc_id"))
      .agg(max(col("n_sh")).as("n_sh"),
        sort_array(collect_list(struct(col("df"), col("h")))).as("ordered"))
      .select(col("doc_id"), col("n_sh"),
        explode(transform(
          slice(col("ordered"), lit(1),
            (col("n_sh") - ceil(col("n_sh") * lit(threshold)) + lit(1)).cast("int")),
          s => s.getField("h"))).as("h"))
    time("prefixes")(prefixes)
    def buckets = prefixes.groupBy("h")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ds"))
      .filter(size(col("ds")) > 1)
    time("buckets")(buckets)
    time("full_q78")(queries.CorpusQueries.setsimJoin(spark, sfDir))
    spark.stop()
  }
}
