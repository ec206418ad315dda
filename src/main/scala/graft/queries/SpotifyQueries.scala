package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's analysis workload, Q0-Q4 (SURVEY §3.3), as DataFrame
  * programs over the flat tables. SQL twins in `sql` run via `spark.sql`
  * after `register`.
  *
  * Sources: snowflake-pipeline-query/spotify-analysis.sql:84-126 ≡
  * GlueCrawler-Athena/athena_spotify_analysis.sql:1-40, with the §1.4
  * reconciliation (`album.name`, engine-generated rank/scrape_date).
  *
  * Q2's broken `a.album_name` reference (spotify-analysis.sql:102 vs DDL
  * `name_` :29) is fixed per SURVEY §1.4.2: the column is `name`, aliased
  * `album_name` in the output.
  */
object SpotifyQueries {

  def register(spark: SparkSession, album: DataFrame, artist: DataFrame,
      songs: DataFrame): Unit = {
    album.createOrReplaceTempView("album")
    artist.createOrReplaceTempView("artist")
    songs.createOrReplaceTempView("songs")
  }

  /** Q0: count(*) smoke ×3 (spotify-analysis.sql:84-88). */
  def q0Counts(album: DataFrame, artist: DataFrame, songs: DataFrame): DataFrame = {
    def one(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("tbl"), col("n"))
    one(album, "album").unionAll(one(artist, "artist")).unionAll(one(songs, "songs"))
      .orderBy("tbl")
  }

  /** Q1: top-10 trending songs, last 7 days of data
    * (spotify-analysis.sql:92-97). CURRENT_DATE in the reference; anchored
    * to max(scrape_date) here so results are reproducible. */
  def q1Trending(songs: DataFrame): DataFrame = {
    val anchor = songs.agg(max(col("scrape_date")).as("max_d"))
    songs.crossJoin(broadcast(anchor))
      .filter(col("scrape_date") >= date_sub(col("max_d"), 7))
      .select("song_name", "rank", "scrape_date", "song_id")
      .orderBy(asc("rank"), asc("scrape_date"), asc("song_id"))
      .limit(10)
  }

  /** Q2: album popularity over time — join + group-avg + multi-column sort
    * (spotify-analysis.sql:99-108). Dims are ≤50 rows/day → broadcast. */
  def q2AlbumPopularity(songs: DataFrame, album: DataFrame): DataFrame =
    songs.join(broadcast(album), Seq("album_id"))
      .groupBy(col("album_id"), col("name").as("album_name"), col("scrape_date"))
      .agg(avg(col("rank")).as("avg_rank"))
      .orderBy("album_id", "scrape_date")

  /** Q3: artists with most top-10 appearances
    * (spotify-analysis.sql:110-118); artist name resolved via the implied
    * FK join (SURVEY §2.4 J2). */
  def q3TopArtists(songs: DataFrame, artist: DataFrame): DataFrame =
    songs.filter(col("rank") <= 10)
      .join(broadcast(artist), Seq("artist_id"))
      .groupBy(col("artist_id"), col("artist_name"))
      .agg(count(lit(1)).as("top_10_appearances"))
      .orderBy(desc("top_10_appearances"), asc("artist_id"))
      .limit(10)

  /** Q4: daily chart movement of one song (spotify-analysis.sql:120-126),
    * plus the lag delta the query invites (SURVEY §2.8 W3). */
  def q4ChartMovement(songs: DataFrame, songId: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("song_id")).orderBy(col("scrape_date"))
    songs.filter(col("song_id") === lit(songId))
      .select(col("song_id"), col("song_name"), col("rank"), col("scrape_date"))
      .withColumn("rank_change", col("rank") - lag(col("rank"), 1).over(w))
      .orderBy("scrape_date")
  }

  /** SQL twins (runnable via spark.sql after register). */
  val sql: Map[String, String] = Map(
    "q0" -> ("SELECT 'album' AS tbl, count(*) AS n FROM album UNION ALL " +
      "SELECT 'artist', count(*) FROM artist UNION ALL " +
      "SELECT 'songs', count(*) FROM songs ORDER BY tbl"),
    "q1" -> """SELECT song_name, rank, scrape_date, song_id FROM songs
      WHERE scrape_date >= date_sub((SELECT max(scrape_date) FROM songs), 7)
      ORDER BY rank ASC, scrape_date ASC, song_id ASC LIMIT 10""",
    "q2" -> """SELECT s.album_id, a.name AS album_name, s.scrape_date,
        avg(s.rank) AS avg_rank
      FROM songs s JOIN album a ON s.album_id = a.album_id
      GROUP BY s.album_id, a.name, s.scrape_date
      ORDER BY s.album_id, s.scrape_date""",
    "q3" -> """SELECT s.artist_id, a.artist_name,
        count(*) AS top_10_appearances
      FROM songs s JOIN artist a ON s.artist_id = a.artist_id
      WHERE s.rank <= 10
      GROUP BY s.artist_id, a.artist_name
      ORDER BY top_10_appearances DESC, s.artist_id ASC LIMIT 10""",
    "q4" -> """SELECT song_id, song_name, rank, scrape_date,
        rank - lag(rank, 1) OVER (PARTITION BY song_id ORDER BY scrape_date) AS rank_change
      FROM songs WHERE song_id = {songId} ORDER BY scrape_date""")
}
