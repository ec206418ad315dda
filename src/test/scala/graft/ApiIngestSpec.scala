package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Runner
import graft.sources.{ApiIngest, FakeSpotifyApi}

/** S1/S2 source behavior against the recorded-fixture fake: search picks
  * item 5, tracks get sliced to the first 50, the landed file feeds the
  * batch Runner end-to-end. */
class ApiIngestSpec extends AnyFunSuite {

  private def searchJson(ids: Seq[String]): String =
    ids.map(id => s"""{"id":"$id","name":"pl-$id"}""")
      .mkString("""{"playlists":{"items":[""", ",", "]}}")

  private def tracksJson(day: String, n: Int): String =
    s"""{"items":${SpotifyFixture.itemsJson(day, n)}}"""

  private val api = new FakeSpotifyApi(
    searchJson(Seq("p0", "p1", "p2", "p3", "p4", "top50", "p6")),
    Map("top50" -> tracksJson("2025-07-20", 60)))

  test("search response item 5 is the chart playlist (reference :53)") {
    assert(ApiIngest.pickPlaylistId(api.searchPlaylists("top songs global")) == "top50")
  }

  test("extractRaw slices to the first 50 items (reference :66)") {
    val raw = ApiIngest.extractRaw(api, "top songs global")
    val items = new com.fasterxml.jackson.databind.ObjectMapper().readTree(raw)
    assert(items.isArray && items.size() == 50)
    assert(items.get(0).path("track").path("id").asText() == "t2025-07-20-0")
    assert(items.get(49).path("track").path("id").asText() == "t2025-07-20-49")
  }

  test("extract → land → runBatch end-to-end") {
    // getOrCreate shares the suite-wide context — never stop() it here
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = SpotifyFixture.tempDir("api-ingest")
    val landing = dir.resolve("to_process").toString
    val raw = ApiIngest.extractRaw(api, "top songs global")
    val path = ApiIngest.land(raw, landing, "20250720141551")
    assert(path.endsWith("spotify_raw_20250720141551.json"))

    val res = Runner.runBatch(spark, landing, dir.resolve("out").toString)
    assert(res.songs == 50) // sliced, not the fake's 60
    assert(res.albums == 10 && res.artists == 7) // fixture dedup cycles

    val songs = spark.read.parquet(dir.resolve("out/songs").toString)
    import org.apache.spark.sql.functions._
    val ranks = songs.agg(min("rank"), max("rank")).head()
    assert(ranks.getInt(0) == 1 && ranks.getInt(1) == 50) // W1 ordinal rank
  }
}
