package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.operators.Flatten
import graft.sources.{Archiver, RawJsonReader, Sinks}

/** End-to-end daily batch (SURVEY §2.12 G1-G3, §3.1).
  *
  * The reference runs this as 8 Airflow tasks in separate worker
  * processes, shipping every intermediate through XCom rows in Postgres.
  * Here it is one driver program: parse once, persist, derive the three
  * tables (DAG fan-out), write, archive (fan-in). The only process
  * boundaries left are the dedup/rank shuffles inside the transforms.
  */
object Runner {

  case class Result(albums: Long, artists: Long, songs: Long, archived: Int)

  /** Run one daily batch: landingDir *.json files → out/{album,artist,songs}. */
  def runBatch(spark: SparkSession, landingDir: String, outDir: String,
      processedDir: Option[String] = None, alsoCsv: Boolean = false): Result = {
    val raw = RawJsonReader.read(spark, landingDir)
      .persist(StorageLevel.MEMORY_AND_DISK) // G1: parse once, fan out 3×

    val album = Flatten.albums(raw)
    val artist = Flatten.artists(raw)
    val songs = Flatten.songs(raw)

    def write(df: DataFrame, name: String, partition: Seq[String]): Unit = {
      Sinks.writeParquet(df, s"$outDir/$name", partitionCols = partition)
      if (alsoCsv) Sinks.writeCsv(df, s"$outDir/csv/$name")
    }
    write(album, "album", Nil)
    write(artist, "artist", Nil)
    write(songs, "songs", Seq("scrape_date"))

    val nAlbum = album.count()
    val nArtist = artist.count()
    val nSongs = songs.count()
    raw.unpersist()

    // fan-in barrier: archive only after every branch wrote (T3)
    val archived = processedDir.map(Archiver.archive(spark, landingDir, _)).getOrElse(0)
    Result(nAlbum, nArtist, nSongs, archived)
  }
}
