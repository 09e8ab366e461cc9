package graft.sources

import java.util

import graft.pipeline.DataApiIngest
import graft.pipeline.Json.{JArr, JVal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 REST source for the chunked video fetch — the AT-SCALE
  * ingest shape SURVEY §2.1/S1 names: where the reference (and
  * [[DataApiIngest.fetchVideosByIds]]) walks the 50-id chunks sequentially
  * on the driver (`job_tasks/bronze/ingest_data_api_to_bronze.py:158-182`),
  * this source plans ONE INPUT PARTITION PER CHUNK, so a 100k-video fetch
  * issues its 2000 independent requests from the executors in parallel and
  * the items land as a distributed DataFrame without ever bottlenecking on
  * one connection.
  *
  * The chunked-id fetch is the partitionable half of the Data API surface:
  * chunk membership is known up front, requests are independent, and
  * responses are order-insensitive (each row carries its (chunk_idx,
  * item_idx) provenance). Token-following playlist pagination is
  * inherently sequential and stays driver-side.
  *
  * Output schema: `chunk_idx INT, item_idx INT, item_json STRING` — one
  * row per returned video item, `item_json` rendered with the same
  * sorted-key serializer as the driver-side path, so reassembling rows in
  * (chunk_idx, item_idx) order reproduces the sequential envelope
  * byte-for-byte ([[DataApiIngest.fetchVideosByIdsParallel]] does exactly
  * that, and ApiIngestSpec pins the equality).
  *
  * Transport: executors obtain their [[DataApiIngest.DataApiClient]] from
  * [[RestClientRegistry]] by key — in-JVM for local[] and tests; a
  * cluster deployment registers a factory that builds an HTTP client from
  * connection options instead (the factory, not the client, is shared, so
  * each task gets its own connection).
  *
  * Options: `clientKey` (registry key), `videoIds` (comma-joined),
  * `chunkSize` (default 50).
  */
class RestVideosSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RestVideosSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestVideosTable(new CaseInsensitiveStringMap(properties))
}

object RestVideosSource {
  val Schema: StructType = new StructType()
    .add("chunk_idx", IntegerType, nullable = false)
    .add("item_idx", IntegerType, nullable = false)
    .add("item_json", StringType, nullable = false)
}

/** Executor-reachable client factories, keyed by an opaque token carried in
  * the reader options. Factories (not clients) are registered so every
  * task constructs its own client — the connection-per-task model a real
  * HTTP transport needs. */
object RestClientRegistry {
  private val factories =
    new java.util.concurrent.ConcurrentHashMap[String, () => DataApiIngest.DataApiClient]()

  def register(factory: () => DataApiIngest.DataApiClient): String = {
    val key = java.util.UUID.randomUUID().toString
    factories.put(key, factory)
    key
  }

  def lookup(key: String): () => DataApiIngest.DataApiClient = {
    val f = factories.get(key)
    require(f != null,
      s"no DataApiClient factory registered under '$key' — register one via " +
        "RestClientRegistry.register (cluster deployments construct clients from options instead)")
    f
  }

  def unregister(key: String): Unit = factories.remove(key)
}

private[sources] class RestVideosTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_rest_videos"
  override def schema(): StructType = RestVideosSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = RestVideosSource.Schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val clientKey = options.get("clientKey")
        require(clientKey != null, "RestVideosSource requires a clientKey option")
        val chunkSize = options.getInt("chunkSize", DataApiIngest.ChunkSize)
        require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
        val ids = Option(options.get("videoIds")).getOrElse("")
          .split(",").iterator.filter(_.nonEmpty).toArray
        ids.grouped(chunkSize).zipWithIndex
          .map { case (chunk, i) => RestChunkPartition(i, chunk, chunkSize, clientKey): InputPartition }
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory = new RestChunkReaderFactory
    }
}

/** One 50-id chunk = one partition = one API request. */
private[sources] final case class RestChunkPartition(
    chunkIdx: Int, ids: Array[String], chunkSize: Int, clientKey: String) extends InputPartition

private[sources] class RestChunkReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = partition.asInstanceOf[RestChunkPartition]
      // the request fires on FIRST next() — task-side, not planning-side
      private lazy val rows: Iterator[InternalRow] = {
        val client = RestClientRegistry.lookup(part.clientKey)()
        // identical request shape to the sequential fetch (reference :158-182)
        val page = client.getJson("videos", Map(
          "part" -> "id,snippet,contentDetails,statistics,status,topicDetails",
          "id" -> part.ids.mkString(","),
          "maxResults" -> part.chunkSize.toString))
        val items: Seq[JVal] = page("items") match {
          case JArr(xs) => xs
          case _ => Seq.empty
        }
        items.iterator.zipWithIndex.map { case (item, j) =>
          InternalRow(part.chunkIdx, j, UTF8String.fromString(item.render))
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean = { val has = rows.hasNext; if (has) current = rows.next(); has }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}
