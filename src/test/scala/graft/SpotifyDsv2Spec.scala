package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 face of the REST source: spark.read.format("spotify"). */
class SpotifyDsv2Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def searchJson(ids: Seq[String]): String =
    ids.map(id => s"""{"id":"$id","name":"pl-$id"}""")
      .mkString("""{"playlists":{"items":[""", ",", "]}}")

  private def load(n: Int) = spark.read.format("spotify")
    .option("searchJson", searchJson(Seq("a", "b", "c", "d", "e", "top", "g")))
    .option("tracksJson", s"""{"items":${SpotifyFixture.itemsJson("2025-07-20", n)}}""")
    .load()

  test("short name resolves; slice + ordinal + explicit nested schema") {
    val df = load(60)
    assert(df.columns.toSeq == Seq("ord", "added_at", "track"))
    assert(df.count() == 50) // limit default = reference's [0:50] slice
    val rows = df.select("ord", "track.id").orderBy("ord").collect()
    assert(rows.head.getInt(0) == 0 && rows.head.getString(1) == "t2025-07-20-0")
    assert(rows.last.getInt(0) == 49 && rows.last.getString(1) == "t2025-07-20-49")
  }

  test("items distribute across input partitions") {
    val parts = load(60).select(spark_partition_id().as("p")).distinct().count()
    assert(parts > 1) // numPartitions default 4
  }

  test("nested projections work straight off the source (P1/P3/P5)") {
    val r = load(20)
      .select(col("track.album.id").as("album_id"),
        element_at(col("track.album.artists"), 1).getField("id").as("artist_id"),
        element_at(col("track.external_urls"), "spotify").as("url"))
      .orderBy("album_id").collect()
    assert(r.length == 20 && r.forall(x => x.getString(0).startsWith("al")))
  }

  test("missing keys arrive as nulls, not crashes (explicit schema)") {
    val df = spark.read.format("spotify")
      .option("searchJson", searchJson(Seq("a", "b", "c", "d", "e", "top")))
      .option("tracksJson", """{"items":[{"added_at":"2025-07-20T00:00:00Z"}]}""")
      .load()
    val row = df.select("ord", "added_at", "track").head()
    assert(row.getInt(0) == 0 && row.isNullAt(2))
  }
}
