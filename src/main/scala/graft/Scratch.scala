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
    def sh = NearDup.shingles(docs, "doc_id", "text", 3)
    time("sh3")(sh)
    time("full_q30")(queries.CorpusQueries.minhashLsh(spark, sfDir))
    time("full_q120")(queries.CorpusQueries.streamingNearDedup(spark, sfDir))
    time("full_q161")(graft.SparkEntry.queries.toMap.apply("q161_winsorized")(spark, sfDir))
    time("full_q47")(graft.SparkEntry.queries.toMap.apply(
      graft.SparkEntry.queries.keys.find(_.startsWith("q47")).get)(spark, sfDir))
    spark.stop()
  }
}
