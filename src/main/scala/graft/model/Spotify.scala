package graft.model

import org.apache.spark.sql.types._

/** Data model of the reference pipeline (SURVEY.md §1, FIXTURES.md §A1).
  *
  * Raw layer: one JSON array per daily scrape, ≤50 playlist items
  * (reference: Airflow-docker/dags/spotify-airflow-pipeline.py:66).
  * The production reader uses this explicit schema — a missing key becomes
  * a null, not a crash (the reference's raw dict-walk hard-fails).
  */
object Spotify {

  val artistRef: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("href", StringType)))

  private val albumStruct: StructType = StructType(Seq(
    StructField("id", StringType), // :98
    StructField("name", StringType), // :99
    StructField("release_date", StringType), // "1999"|"1999-03"|"1999-03-02" (:100)
    StructField("total_tracks", IntegerType), // :101
    StructField("external_urls", MapType(StringType, StringType)), // :102
    StructField("artists", ArrayType(artistRef)))) // [0] used (:151)

  private val trackStruct: StructType = StructType(Seq(
    StructField("id", StringType), // :144
    StructField("name", StringType), // :145
    StructField("duration_ms", LongType), // :146
    StructField("popularity", IntegerType), // :148
    StructField("external_urls", MapType(StringType, StringType)), // :147
    StructField("album", albumStruct),
    StructField("artists", ArrayType(artistRef)))) // exploded (:123-127)

  /** Schema of one playlist item (spotify-airflow-pipeline.py:96-158). */
  val rawItem: StructType = StructType(Seq(
    StructField("added_at", StringType), // ISO-8601 (:149)
    StructField("track", trackStruct)))

  /** Raw file = a JSON array of items. */
  val rawFile: ArrayType = ArrayType(rawItem)

  // Typed API boundary (SURVEY §1.5). Warehouse semantics per
  // snowflake-pipeline-query/spotify-analysis.sql:27-56, with the §1.4
  // reconciliations: normalized column names, engine-generated
  // rank/scrape_date.
  case class Album(
      album_id: String,
      name: String,
      release_date: java.sql.Date,
      total_tracks: Integer,
      url: String)

  case class Artist(
      artist_id: String,
      artist_name: String,
      external_url: String) // holds the API href, reference behavior (:126)

  case class SongPlay(
      song_id: String,
      song_name: String,
      duration_ms: java.lang.Long,
      url: String,
      popularity: Integer,
      song_added: java.sql.Timestamp,
      album_id: String,
      artist_id: String,
      rank: Integer, // 1-based position in the day's chart (W1)
      scrape_date: java.sql.Date)
}
