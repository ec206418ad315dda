package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `binary` columns next to typed
  * metadata; decode / feature-extract / resize / frame-sample run
  * partition-local over batches of blobs.
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-features from the
  * blob's md5, so every downstream op — schema, partitioning, batch shape,
  * join-back — is real and testable, and the feature values are exactly
  * reproducible in a SQL oracle. Swap `fakeDecode` for a real codec call
  * per batch in production; nothing else changes.
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

  /** Deterministic stand-in for a codec: md5 the bytes, derive fake
    * dimensions from the top 56 bits. Mirrors `TextFunctions.md5Hash56`
    * so a SQL oracle can reproduce the values exactly. */
  private[graft] def fakeDecode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    val h = (java.lang.Long.parseLong(hex.substring(0, 7), 16) << 28) +
      java.lang.Long.parseLong(hex.substring(7, 14), 16)
    MediaFeatures(
      doc_id = docId, n_bytes = bytes.length.toLong, checksum = hex,
      width = h % 640 + 64, height = h % 480 + 64, n_frames = h % 30 + 1)
  }

  /** Decode features from a blob table, batching `batchSize` blobs per
    * codec call (the real-codec integration point). Partition-local, no
    * shuffle: output order within a partition follows input order. */
  def decodeFeatures(blobs: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one codec invocation per batch in production; here per-row stub
          batch.map { case (id, bytes) => fakeDecode(id, bytes) }
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
