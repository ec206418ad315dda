package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns next to typed
  * metadata; decode / feature-extract / resize / frame-sample run
  * partition-local over batches of blobs.
  *
  * Two codecs sit behind the same batched `mapPartitions` seam:
  *  - [[imageDecode]] — a REAL decoder (`javax.imageio`, in the JDK):
  *    sniffs the container from the bytes, reads true width/height/frame
  *    count from the image HEADER without materializing pixel rasters —
  *    at 100 TB the features cost header-parse, not full decode;
  *  - [[fakeDecode]] — the deterministic stand-in for modalities whose
  *    codecs this container lacks (audio/video): pseudo-features from the
  *    blob's md5, exactly reproducible in a SQL oracle. The oracle-gated
  *    queries (q36/q37) run this one so the cross-engine hash compare
  *    replays the same math.
  *
  * Scale notes (100 TB of media):
  *  - blobs never pass through the driver; `mapPartitions` keeps decode
  *    distributed and pipelined with the parquet scan;
  *  - batching (`batchSize`) amortizes per-call codec setup exactly like
  *    an arrow-batched pandas UDF would;
  *  - features are tiny relative to blobs, so the decode stage is also the
  *    projection: downstream stages shuffle features, not media.
  */
object Multimodal {

  /** Typed decoded-media features. `width`/`height`/`nFrames` come from the
    * (stubbed) codec; `checksum`/`nBytes` from the blob itself. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, checksum: String,
      width: Long, height: Long, n_frames: Long)

  /** Wrap a text table as a blob table: (doc_id, modality, blob). Stands in
    * for reading real media parquet with a `binary` column. */
  def asBlobTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("text/plain").as("modality"),
      encode(col(textCol), "UTF-8").as("blob"))

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map(b => f"$b%02x").mkString

  /** Deterministic stand-in for a codec: md5 the bytes, derive fake
    * dimensions from the top 56 bits. Mirrors `TextFunctions.md5Hash56`
    * so a SQL oracle can reproduce the values exactly. */
  private[graft] def fakeDecode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val hex = md5Hex(bytes)
    val h = (java.lang.Long.parseLong(hex.substring(0, 7), 16) << 28) +
      java.lang.Long.parseLong(hex.substring(7, 14), 16)
    MediaFeatures(
      doc_id = docId, n_bytes = bytes.length.toLong, checksum = hex,
      width = h % 640 + 64, height = h % 480 + 64, n_frames = h % 30 + 1)
  }

  /** Real image codec on the JDK's `javax.imageio`: container sniffed
    * from the bytes (PNG/JPEG/GIF/BMP…), width/height/frame-count read
    * from the image HEADER via an `ImageReader` — `ImageIO.read`'s full
    * raster decode is exactly what a metadata pass over 100 TB of media
    * must not pay. Bytes that no installed reader recognizes fall back to
    * [[fakeDecode]] (a real pipeline would route them to the next
    * modality's codec), so mixed-modality batches never throw. */
  private[graft] def imageDecode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) fakeDecode(docId, bytes)
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val frames = try r.getNumImages(true) catch { case _: Exception => 1 }
          MediaFeatures(
            doc_id = docId, n_bytes = bytes.length.toLong, checksum = md5Hex(bytes),
            width = r.getWidth(0).toLong, height = r.getHeight(0).toLong,
            n_frames = frames.toLong.max(1L))
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Decode features from a blob table, batching `batchSize` blobs per
    * codec call. `codec` is the per-blob decoder: [[imageDecode]] (real,
    * javax.imageio) for image corpora, [[fakeDecode]] (default) for the
    * oracle-replayable stub path. Partition-local, no shuffle: output
    * order within a partition follows input order. */
  def decodeFeatures(blobs: DataFrame, batchSize: Int = 64,
      codec: (Long, Array[Byte]) => MediaFeatures = fakeDecode): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one grouped slice per codec invocation: a native codec would
          // be handed the whole batch here (arrow-UDF shape)
          batch.map { case (id, bytes) => codec(id, bytes) }
        }
      }
  }

  /** Pure-column twin of `decodeFeatures` (no mapPartitions): the same
    * feature math as Catalyst expressions, codegen'd end-to-end. Used both
    * as the fast path when the "decode" is expressible and as the oracle
    * cross-check for the mapPartitions path. */
  def decodeFeaturesColumnar(blobs: DataFrame): DataFrame = {
    val h = TextFunctions.md5Hash56(col("blob"))
    blobs.select(
      col("doc_id").cast("long").as("doc_id"),
      length(col("blob")).cast("long").as("n_bytes"),
      md5(col("blob")).as("checksum"),
      (h % 640 + 64).as("width"),
      (h % 480 + 64).as("height"),
      (h % 30 + 1).as("n_frames"))
  }

  /** Stub "resize": crop blobs to at most `maxBytes` (a real pipeline would
    * re-encode); demonstrates blob-in/blob-out partition-local transforms. */
  def resizeBlobs(blobs: DataFrame, maxBytes: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val resized = blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => (id, b.take(maxBytes)) })
      .toDF("doc_id", "blob")
    resized.withColumn("modality", lit("text/plain"))
  }

  /** Stub "frame sample": every `stride`-th byte as one "frame" row —
    * the generator shape (1 blob → N frame rows) of real video sampling. */
  def sampleFrames(blobs: DataFrame, stride: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        Iterator.range(0, b.length, stride).map(i => (id, i.toLong, b(i).toLong))
      }
      .toDF("doc_id", "frame_offset", "frame_byte")
  }
}
