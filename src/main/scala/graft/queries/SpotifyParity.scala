package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's literal analysis workload (Q1–Q4 at
  * snowflake-pipeline-query/spotify-analysis.sql:92-126), hash-gated by
  * the DuckDB oracle.
  *
  * The driver's oracle sees only the ten synthetic parquet tables, so the
  * spotify star schema is DERIVED — identically in both engines — from
  * lineitem/part: `songs` is the daily top-50 chart of parts by shipped
  * quantity (parts recur across days, so rank trajectories exist — the
  * property Q2/Q4 are about, and which the reference's per-scrape_date
  * rank generation produces), `album` is the brand dimension. On top of
  * that derivation each query keeps the reference SQL's literal shape
  * with two determinism anchors (SURVEY §3.3): CURRENT_DATE becomes the
  * corpus max date, and ORDER BY ties get the id tiebreak the reference
  * leaves unspecified.
  *
  * Scale notes: the chart derivation is a two-level hash aggregate
  * followed by the native TopKPerKey rewrite (the `rank <= 50` filter
  * over row_number fires plans/TopKPerKey.scala — at most 50 rows per
  * (mapper, day) reach the exchange); the album/artist attach is a
  * broadcast hash join on the part dimension.
  */
object SpotifyParity {

  /** Daily top-50 chart: (song_id, song_name, artist_id, album_id, rank,
    * scrape_date). The chart covers the corpus's last 60 days — the
    * reference's songs table is what a daily scrape DAG accumulates, a
    * rolling recent window, not all of history; the window also keeps
    * the per-query derivation cost proportional to the chart, not the
    * fact table. Quantity is summed as DECIMAL then cast to double
    * (exact in both engines → deterministic rank order with the song_id
    * tiebreak). */
  private def songs(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val mx = li.agg(max(to_date(col("l_shipdate"))).as("chart_end"))
    val daily = li
      .crossJoin(broadcast(mx))
      .filter(to_date(col("l_shipdate")) >= col("chart_end") - expr("INTERVAL 60 DAYS"))
      .groupBy(
        to_date(col("l_shipdate")).as("scrape_date"),
        col("l_partkey").as("song_id"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
    val w = Window.partitionBy(col("scrape_date")).orderBy(desc("qty"), asc("song_id"))
    val ranked = daily
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 50)
    val p = Tables.load(spark, dir, "part")
    ranked.join(
        p.select(col("p_partkey").as("song_id"), col("p_name").as("song_name"),
          col("p_type").as("artist_id"), col("p_brand").as("album_id")),
        Seq("song_id"))
      .select("song_id", "song_name", "artist_id", "album_id", "rank", "scrape_date")
  }

  private def album(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(col("p_brand").as("album_id")).distinct()
      .select(col("album_id"), concat(lit("Album "), col("album_id")).as("album_name"))

  /** Q1 — top 10 trending songs in the last 7 days
    * (spotify-analysis.sql:92-97). */
  def q1TrendingSongs(spark: SparkSession, dir: String): DataFrame = {
    val s = songs(spark, dir)
    val mx = s.agg(max(col("scrape_date")).as("max_d"))
    s.crossJoin(broadcast(mx))
      .filter(col("scrape_date") >= col("max_d") - expr("INTERVAL 7 DAYS"))
      .select("song_id", "song_name", "artist_id", "album_id", "rank", "scrape_date")
      .orderBy(asc("rank"), asc("scrape_date"), asc("song_id"))
      .limit(10)
  }

  /** Q2 — album popularity (avg rank) over time
    * (spotify-analysis.sql:99-108). */
  def q2AlbumPopularity(spark: SparkSession, dir: String): DataFrame =
    songs(spark, dir)
      .join(album(spark, dir), Seq("album_id"))
      .groupBy("album_id", "album_name", "scrape_date")
      .agg(avg(col("rank")).as("avg_rank"))
      .orderBy("album_id", "scrape_date")

  /** Q3 — artists with the most top-10 entries
    * (spotify-analysis.sql:110-117). */
  def q3TopArtists(spark: SparkSession, dir: String): DataFrame =
    songs(spark, dir)
      .filter(col("rank") <= 10)
      .groupBy("artist_id")
      .agg(count(lit(1)).as("top_10_appearances"))
      .orderBy(desc("top_10_appearances"), asc("artist_id"))
      .limit(10)

  /** Q4 — daily chart movement of a song (spotify-analysis.sql:119-126);
    * the reference's `<song_id_here>` placeholder becomes the
    * deterministic pick "most charted song" (ties → lowest id). */
  def q4ChartMovement(spark: SparkSession, dir: String): DataFrame = {
    val s = songs(spark, dir)
    val pick = s.groupBy("song_id").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("song_id")).limit(1).select("song_id")
    s.join(broadcast(pick), Seq("song_id"))
      .select("scrape_date", "rank")
      .orderBy("scrape_date")
  }

  /** Shared derivation CTE for the DuckDB oracle — the exact twin of
    * [[songs]]/[[album]]. */
  private val derivationCte: String =
    """WITH daily AS (
         SELECT CAST(l_shipdate AS DATE) AS scrape_date, l_partkey AS song_id,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >=
               (SELECT max(CAST(l_shipdate AS DATE)) FROM lineitem) - INTERVAL 60 DAY
         GROUP BY 1, 2),
       ranked AS (
         SELECT scrape_date, song_id,
                CAST(row_number() OVER (PARTITION BY scrape_date
                     ORDER BY qty DESC, song_id) AS BIGINT) AS rank
         FROM daily),
       songs AS (
         SELECT r.song_id, p.p_name AS song_name, p.p_type AS artist_id,
                p.p_brand AS album_id, r.rank, r.scrape_date
         FROM ranked r JOIN part p ON r.song_id = p.p_partkey
         WHERE r.rank <= 50),
       album AS (
         SELECT album_id, 'Album ' || album_id AS album_name
         FROM (SELECT DISTINCT p_brand AS album_id FROM part))"""

  val oracle: Map[String, String] = Map(
    "q62_spotify_q1" ->
      s"""$derivationCte
         SELECT song_id, song_name, artist_id, album_id, rank, scrape_date
         FROM songs
         WHERE scrape_date >= (SELECT max(scrape_date) FROM songs) - INTERVAL 7 DAY
         ORDER BY rank ASC, scrape_date, song_id
         LIMIT 10""",

    "q63_spotify_q2" ->
      s"""$derivationCte
         SELECT s.album_id, a.album_name, s.scrape_date, AVG(s.rank) AS avg_rank
         FROM songs s JOIN album a ON s.album_id = a.album_id
         GROUP BY s.album_id, a.album_name, s.scrape_date
         ORDER BY s.album_id, s.scrape_date""",

    "q64_spotify_q3" ->
      s"""$derivationCte
         SELECT artist_id, COUNT(*) AS top_10_appearances
         FROM songs
         WHERE rank <= 10
         GROUP BY artist_id
         ORDER BY top_10_appearances DESC, artist_id
         LIMIT 10""",

    "q65_spotify_q4" ->
      s"""$derivationCte
         SELECT scrape_date, rank
         FROM songs
         WHERE song_id = (SELECT song_id FROM songs GROUP BY song_id
                          ORDER BY count(*) DESC, song_id LIMIT 1)
         ORDER BY scrape_date""",
  )
}
