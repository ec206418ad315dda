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

  /** Typed decoded-audio features: exact integer readings (sum of
    * squared samples instead of a float RMS, so every field is
    * reduction-order-free and engine-portable). */
  final case class AudioFeatures(
      doc_id: Long, n_bytes: Long, sample_rate: Long, n_channels: Long,
      bits_per_sample: Long, n_samples: Long, peak: Long, sum_sq: Long)

  /** REAL RIFF/WAVE PCM parser — pure JVM byte arithmetic, no codec
    * library: walks the chunk list (never assumes fixed offsets, so
    * LIST/fact chunks between `fmt ` and `data` parse fine), reads the
    * PCM-16 format block, and folds the sample payload into exact
    * integer features (per-sample peak |amplitude| and Σs² — the audio
    * analog of the image path's header-only metadata, except PCM has
    * no cheaper header to stop at). Anything that is not a PCM-16 WAV
    * falls back to [[fakeDecode]]-style md5 pseudo-features (marked by
    * sample_rate = −1), so mixed batches never throw. */
  private[graft] def wavDecode(docId: Long, bytes: Array[Byte]): AudioFeatures = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (le16(o) & 0xffffL) | ((le16(o + 2) & 0xffffL) << 16)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    def fallback: AudioFeatures = {
      val hex = md5Hex(bytes)
      val h = java.lang.Long.parseLong(hex.substring(0, 14), 16)
      AudioFeatures(docId, bytes.length.toLong, -1L, h % 2 + 1, 16L,
        h % 1000, h % 32768, 0L)
    }
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return fallback
    var off = 12
    var rate = -1L; var channels = -1L; var bps = -1L; var fmt = -1
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = le32(off + 4).toInt
      if (id == "fmt " && off + 8 + 16 <= bytes.length) {
        fmt = le16(off + 8)
        channels = le16(off + 10).toLong
        rate = le32(off + 12)
        bps = le16(off + 22).toLong
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(sz, bytes.length - dataOff)
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (fmt != 1 || bps != 16L || channels < 1 || dataOff < 0) return fallback
    val nSamples = dataLen / (channels.toInt * 2)
    var peak = 0L
    var sumSq = 0L
    var i = dataOff
    val end = dataOff + nSamples * channels.toInt * 2
    while (i + 1 < end + 1) {
      val s = (le16(i) << 16) >> 16 // sign-extend
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      sumSq += s.toLong * s.toLong
      i += 2
    }
    AudioFeatures(docId, bytes.length.toLong, rate, channels, bps,
      nSamples.toLong, peak, sumSq)
  }

  /** Decode audio features from a blob table — the audio face of
    * [[decodeFeatures]], same batched `mapPartitions` seam (blobs never
    * pass the driver; features are the projection). */
  def decodeAudio(blobs: DataFrame, batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, b) => wavDecode(id, b) })
      }
  }

  /** Deterministic PCM-16 WAV synthesizer (test/fixture use): a
    * triangle wave of `n` samples — integer sample math, so the decoded
    * features are exactly predictable. */
  private[graft] def synthWav(n: Int, rate: Int, amplitude: Int,
      period: Int, extraChunk: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val dataLen = n * 2
    val listLen = if (extraChunk) 12 else 0
    tag("RIFF"); w32(4 + 24 + listLen + 8 + dataLen); tag("WAVE")
    tag("fmt "); w32(16); w16(1); w16(1); w32(rate); w32(rate * 2); w16(2); w16(16)
    if (extraChunk) { tag("LIST"); w32(4); tag("INFO") }
    tag("data"); w32(dataLen)
    var i = 0
    while (i < n) {
      val ph = i % period
      val tri = if (ph < period / 2) ph else period - ph
      w16(((tri * 2 * amplitude / period) * (if ((i / period) % 2 == 0) 1 else -1)) & 0xffff)
      i += 1
    }
    bos.toByteArray
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
