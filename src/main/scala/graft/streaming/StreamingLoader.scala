package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Spotify
import graft.operators.Flatten
import graft.sources.RawJsonReader

/** Incremental ingest (SURVEY §2.1 S7/S10, §2.10 T2-T5).
  *
  * Replaces the reference's three mechanisms with one checkpointed
  * Structured Streaming file source:
  *  - S3KeySensor polling (orchestrate-lambda-Glue.py:35-43) → the file
  *    source discovers new files itself;
  *  - Snowpipe AUTO_INGEST pipes ×3 (spotify-analysis.sql:58-74) → one
  *    writeStream per table;
  *  - copy-to-processed/delete (spotify-airflow-pipeline.py:166-183) →
  *    the checkpoint offset log gives file-name-level exactly-once (T5:
  *    a re-delivered file name is skipped, same as Snowpipe's dedup).
  *
  * `Trigger.AvailableNow` = the daily batch cadence (T1): drain everything
  * available, then stop — restartable, incremental, no sensor.
  */
object StreamingLoader {

  /** Raw landing dir → streaming DataFrame of playlist items with the
    * same shape RawJsonReader produces for batch. */
  def readRawStream(spark: SparkSession, landingDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .format("text")
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.json")
      .load(landingDir)
      .select(
        input_file_name().as("src_file"),
        from_json(col("value"), Spotify.rawFile).as("items"))
      .select(
        col("src_file"),
        to_date(
          unix_timestamp(
            regexp_extract(col("src_file"), "spotify_raw_(\\d{14})", 1),
            "yyyyMMddHHmmss").cast("timestamp")).as("scrape_date"),
        posexplode(col("items")).as(Seq("ord", "item")))
      .select(col("src_file"), col("scrape_date"), col("ord"),
        col("item.added_at").as("added_at"), col("item.track").as("track"))
  }

  /** Start one incremental load: landing dir → parquet table dir. The
    * songs transform runs per micro-batch via foreachBatch because the
    * rank window needs the whole day's file — which is exactly one
    * micro-batch element under file-granularity triggers. */
  def loadSongs(spark: SparkSession, landingDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    readRawStream(spark, landingDir).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Flatten.songs(batch).write.mode("append")
          .partitionBy("scrape_date").parquet(outDir)
      }
      .start()
}
