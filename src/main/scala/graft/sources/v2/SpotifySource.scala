package graft.sources.v2

import java.util

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JSONOptions, JacksonParser}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.Spotify
import graft.sources.{ApiIngest, FakeSpotifyApi, HttpSpotifyApi, SpotifyApi}

/** DataSource V2 face of the S1/S2 REST source: `spark.read.format
  * ("spotify")` (SURVEY §2.1 S1 "custom DataSource V2 TableProvider").
  *
  * The HTTP extraction (search → pick item 5 → tracks → slice 50,
  * reference: Airflow-docker/dags/spotify-airflow-pipeline.py:23-66) runs
  * ONCE on the driver at scan planning — it is control-plane metadata, one
  * ≤50-item payload. The item JSON strings are then distributed across
  * `numPartitions` input partitions and parsed on executors with Spark's
  * own JacksonParser against the explicit raw schema (missing key → null,
  * never a crash). The ordinal survives as `ord` (chart position, W1).
  *
  * Options:
  *  - `query` (default "top songs global"), `limit` (default 50),
  *    `searchIndex` (default 5), `numPartitions` (default 4)
  *  - fixture mode: `searchJson` + `tracksJson` inline payloads (tests,
  *    offline runs)
  *  - live mode: `clientId` + `clientSecret` (OAuth client-credentials)
  */
class SpotifyTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "spotify"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpotifySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SpotifyTable(new CaseInsensitiveStringMap(properties))
}

object SpotifySource {
  /** One row per playlist item: ordinal + the raw-item fields. */
  val schema: StructType = StructType(
    StructField("ord", IntegerType, nullable = false) +: Spotify.rawItem.fields)

  def api(o: CaseInsensitiveStringMap): SpotifyApi =
    if (o.containsKey("searchJson"))
      new FakeSpotifyApi(o.get("searchJson"),
        Map.empty.withDefaultValue(o.get("tracksJson")))
    else
      new HttpSpotifyApi(o.get("clientId"), o.get("clientSecret"))
}

private class SpotifyTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  override def name(): String = "spotify"
  override def schema(): StructType = SpotifySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new SpotifyScan(options)
}

private class SpotifyScan(options: CaseInsensitiveStringMap)
  extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = SpotifySource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side extraction at planning time (control plane, ≤50 items)
    val raw = ApiIngest.extractRaw(
      SpotifySource.api(options),
      options.getOrDefault("query", "top songs global"),
      options.getInt("limit", 50),
      options.getInt("searchIndex", 5))
    val mapper = new ObjectMapper()
    val items = mapper.readTree(raw)
    val itemJson = (0 until items.size()).map(i => mapper.writeValueAsString(items.get(i)))
    val slices = options.getInt("numPartitions", 4).max(1)
    itemJson.zipWithIndex
      .grouped((itemJson.size + slices - 1).max(1) / slices.min(itemJson.size.max(1)))
      .map(chunk => SpotifyPartition(chunk.toArray): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SpotifyReaderFactory()
}

private case class SpotifyPartition(items: Array[(String, Int)]) extends InputPartition

private class SpotifyReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SpotifyReader(partition.asInstanceOf[SpotifyPartition])
}

/** Parses each item with Spark's JacksonParser (the engine the built-in
  * JSON reader uses) against the explicit item schema, then prepends the
  * chart ordinal. */
private class SpotifyReader(partition: SpotifyPartition)
  extends PartitionReader[InternalRow] {

  private val parser = new JacksonParser(
    Spotify.rawItem,
    new JSONOptions(Map.empty[String, String], "UTC"),
    allowArrayAsStructs = false,
    Nil)
  private val toParser = CreateJacksonParser.utf8String _
  private var i = -1
  private var row: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= partition.items.length) return false
    val (json, ord) = partition.items(i)
    val parsed = parser.parse(UTF8String.fromString(json), toParser,
      identity[UTF8String]).headOption
    val out = new GenericInternalRow(1 + Spotify.rawItem.fields.length)
    out.update(0, ord)
    parsed.foreach { r =>
      var f = 0
      while (f < Spotify.rawItem.fields.length) {
        out.update(f + 1, r.get(f, Spotify.rawItem.fields(f).dataType))
        f += 1
      }
    }
    row = out
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
