package graft.sources

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

/** REST API source (SURVEY §2.1 S1/S2): the driver-side extraction step
  * that produces the raw landing files the distributed pipeline reads.
  *
  * The reference fetches the chart with spotipy: OAuth2 client-credentials
  * token, playlist search picking result item 5, then the playlist's
  * tracks (reference: Airflow-docker/dags/spotify-airflow-pipeline.py:
  * 23-53 search + token, :55-63 tracks, :66 first-50 slice, :68-72 dump to
  * `spotify_raw_<ts>.json`).
  *
  * The API sits behind a trait so unit tests and the batch Runner use a
  * recorded-fixture fake (SURVEY §7.4 risk 5: nondeterministic,
  * auth-bearing HTTP never runs in the test hot path). Extraction is
  * deliberately driver-side — one ≤50-item payload per day is control-plane
  * work; the cluster-scale path starts at the landing directory, where
  * thousands of daily files fan out across executors (RawJsonReader).
  */
trait SpotifyApi {
  /** JSON body of `GET /v1/search?q=<query>&type=playlist`. */
  def searchPlaylists(query: String): String
  /** JSON body of `GET /v1/playlists/<id>/tracks`. */
  def playlistItems(playlistId: String): String
}

/** Real HTTP client (JDK built-in, no extra deps). Token flow =
  * client-credentials grant against the public accounts endpoint
  * (reference :28-32); requests carry the Bearer header (:58-60). */
final class HttpSpotifyApi(
    clientId: String,
    clientSecret: String,
    accountsBase: String = "https://accounts.spotify.com",
    apiBase: String = "https://api.spotify.com") extends SpotifyApi {

  require(clientId != null && clientId.nonEmpty,
    "HttpSpotifyApi: clientId is null/empty (set credentials or use FakeSpotifyApi)")
  require(clientSecret != null && clientSecret.nonEmpty,
    "HttpSpotifyApi: clientSecret is null/empty (set credentials or use FakeSpotifyApi)")

  private val http = HttpClient.newHttpClient()

  private def checked(resp: HttpResponse[String], what: String): String = {
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"$what failed: HTTP ${resp.statusCode()} — ${resp.body().take(300)}")
    resp.body()
  }

  private lazy val token: String = {
    val basic = Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes(StandardCharsets.UTF_8))
    val req = HttpRequest.newBuilder(URI.create(s"$accountsBase/api/token"))
      .header("Authorization", s"Basic $basic")
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString("grant_type=client_credentials"))
      .build()
    val body = checked(
      http.send(req, HttpResponse.BodyHandlers.ofString()), "token grant")
    val tok = new ObjectMapper().readTree(body).path("access_token").asText()
    if (tok.isEmpty)
      throw new RuntimeException(
        s"token grant returned no access_token: ${body.take(300)}")
    tok
  }

  private def get(url: String): String = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Authorization", s"Bearer $token")
      .GET().build()
    checked(http.send(req, HttpResponse.BodyHandlers.ofString()), s"GET $url")
  }

  override def searchPlaylists(query: String): String = {
    // F5: URL-encode the free-text query (reference :38)
    val q = URLEncoder.encode(query, StandardCharsets.UTF_8)
    get(s"$apiBase/v1/search?q=$q&type=playlist")
  }

  override def playlistItems(playlistId: String): String =
    get(s"$apiBase/v1/playlists/$playlistId/tracks")
}

/** Recorded-fixture fake: canned JSON per endpoint, fully deterministic. */
final class FakeSpotifyApi(
    searchJson: String,
    tracksById: Map[String, String]) extends SpotifyApi {
  override def searchPlaylists(query: String): String = searchJson
  override def playlistItems(playlistId: String): String = tracksById(playlistId)
}

/** Extraction orchestration: API → sliced raw JSON array → landing file.
  * Mirrors the reference's fetch task byte-for-byte in structure:
  * playlists.items[5].id (:53), items[0:50] (:66), serialized array to
  * `<landing>/spotify_raw_<yyyyMMddHHmmss>.json` (:68, :203). */
object ApiIngest {

  private val mapper = new ObjectMapper()

  /** Playlist id at `playlists.items[index]` of a search response. */
  def pickPlaylistId(searchJson: String, index: Int = 5): String =
    mapper.readTree(searchJson).path("playlists").path("items")
      .path(index).path("id").asText()

  /** Raw file body: the first `limit` entries of the tracks `items` array,
    * re-serialized as one JSON array (the raw-layer contract, SURVEY §1.1).
    */
  def extractRaw(api: SpotifyApi, query: String, limit: Int = 50,
      searchIndex: Int = 5): String = {
    val playlistId = pickPlaylistId(api.searchPlaylists(query), searchIndex)
    val items = mapper.readTree(api.playlistItems(playlistId)).path("items")
    val out = mapper.createArrayNode()
    var i = 0
    while (i < limit && i < items.size()) { out.add(items.get(i)); i += 1 }
    mapper.writeValueAsString(out)
  }

  /** Write one day's raw body into the landing dir (S3-sink equivalent);
    * returns the file path. `tsNodash` = yyyyMMddHHmmss (F4). */
  def land(rawJson: String, landingDir: String, tsNodash: String): String = {
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    val p = dir.resolve(s"spotify_raw_$tsNodash.json")
    Files.writeString(p, rawJson)
    p.toString
  }
}
