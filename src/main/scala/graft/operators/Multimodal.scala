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

  // ImageIO defaults every encode/decode stream to a FILE-backed cache
  // (a temp file created, locked, and deleted per call) — pure overhead
  // and a disk-I/O serializer for blob work that is in-memory by
  // design (byte-array in, byte-array out, 32 concurrent tasks). The
  // flag is JVM-global; in-memory streams are strictly what every
  // caller of these codecs wants.
  javax.imageio.ImageIO.setUseCache(false)

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
  /** Parsed PCM-16 WAV geometry: the chunk walk shared by
    * [[wavDecode]] and [[audioFingerprint]]. None when the bytes are
    * not a PCM-16 RIFF/WAVE. */
  private final case class WavPcm(
      rate: Long, channels: Int, dataOff: Int, nSamples: Int)

  private def parseWavPcm16(bytes: Array[Byte]): Option[WavPcm] = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (le16(o) & 0xffffL) | ((le16(o + 2) & 0xffffL) << 16)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
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
    if (fmt != 1 || bps != 16L || channels < 1 || dataOff < 0) None
    else Some(WavPcm(rate, channels.toInt, dataOff,
      dataLen / (channels.toInt * 2)))
  }

  private def sampleAt(bytes: Array[Byte], o: Int): Int =
    ((((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)) << 16) >> 16) // sign-extend

  private[graft] def wavDecode(docId: Long, bytes: Array[Byte]): AudioFeatures = {
    def fallback: AudioFeatures = {
      val hex = md5Hex(bytes)
      val h = java.lang.Long.parseLong(hex.substring(0, 14), 16)
      AudioFeatures(docId, bytes.length.toLong, -1L, h % 2 + 1, 16L,
        h % 1000, h % 32768, 0L)
    }
    parseWavPcm16(bytes) match {
      case None => fallback
      case Some(w) =>
        var peak = 0L
        var sumSq = 0L
        var i = w.dataOff
        val end = w.dataOff + w.nSamples * w.channels * 2
        while (i + 1 < end + 1) {
          val s = sampleAt(bytes, i)
          val a = math.abs(s.toLong)
          if (a > peak) peak = a
          sumSq += s.toLong * s.toLong
          i += 2
        }
        AudioFeatures(docId, bytes.length.toLong, w.rate, w.channels.toLong,
          16L, w.nSamples.toLong, peak, sumSq)
    }
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
    * features are exactly predictable. `boostFirst`/`boost` add a
    * transient (+boost on the first `boostFirst` samples) — the
    * planted-near-dup device for [[audioFingerprint]]: it perturbs
    * only the leading energy windows, flipping ≤2 fingerprint bits. */
  private[graft] def synthWav(n: Int, rate: Int, amplitude: Int,
      period: Int, extraChunk: Boolean = false,
      boostFirst: Int = 0, boost: Int = 0): Array[Byte] = {
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
      val base = (tri * 2 * amplitude / period) * (if ((i / period) % 2 == 0) 1 else -1)
      w16((if (i < boostFirst) base + boost else base) & 0xffff)
      i += 1
    }
    bos.toByteArray
  }

  /** Per-blob acoustic fingerprint. `afp` = −1 marks the sentinel
    * (non-PCM-16 or fewer than 57 samples). */
  final case class AudioFingerprint(doc_id: Long, n_samples: Long, afp: Long)

  /** 56-bit acoustic fingerprint — the AUDIO leg of the perceptual
    * near-dup family (text SimHash / image dHash / video frame dHash):
    * the int16 sample stream is cut into 57 contiguous windows
    * (sample j → window (j·57) div total — pure integer arithmetic, so
    * a SQL oracle replays the cut exactly), each window reduced to its
    * exact energy Σs², and bit k = [e(k) > e(k+1)] — the dHash
    * sign-of-gradient idiom over time instead of space. Loudness-scale
    * changes move energies monotonically and mostly preserve the
    * gradient signs; a local transient flips only the bits whose
    * windows it touches, which is what makes hamming distance a
    * near-dup signal. Integer end-to-end: engine-portable,
    * hash-oracle-exact. */
  private[graft] def audioFingerprint(docId: Long, bytes: Array[Byte]): AudioFingerprint =
    parseWavPcm16(bytes) match {
      case Some(w) if w.nSamples * w.channels >= 57 =>
        val total = w.nSamples * w.channels
        val e = new Array[Long](57)
        var j = 0
        while (j < total) {
          val s = sampleAt(bytes, w.dataOff + 2 * j).toLong
          e(((j.toLong * 57L) / total).toInt) += s * s
          j += 1
        }
        var fp = 0L
        var k = 0
        while (k < 56) {
          if (e(k) > e(k + 1)) fp |= 1L << k
          k += 1
        }
        AudioFingerprint(docId, total.toLong, fp)
      case _ => AudioFingerprint(docId, -1L, -1L)
    }

  /** Acoustic fingerprints from a blob table — the audio-dedup face of
    * [[decodeImageHashes]], same batched `mapPartitions` seam (blobs
    * never pass the driver; one long per clip is the projection — pair
    * the `afp` column with [[NearDup.hammingPairs]]). */
  def decodeAudioFingerprints(blobs: DataFrame,
      batchSize: Int = 64): Dataset[AudioFingerprint] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, b) => audioFingerprint(id, b) })
      }
  }

  /** Typed perceptual-hash features: 56-bit aHash (mean-threshold) and
    * dHash (row-wise gradient) over the decoded raster's 8×8
    * block-average grid — integer arithmetic end-to-end (floor
    * divisions, no floats), so the hashes are exactly replayable by a
    * SQL oracle and engine-portable. 56 bits (8 rows × 7 columns)
    * keeps the value a non-negative BIGINT in every engine — the
    * repo-wide md5Hash56 convention. */
  final case class ImageHashes(
      doc_id: Long, width: Long, height: Long, ahash: Long, dhash: Long)

  /** Deterministic grayscale test pattern: pixel (x,y) of the image for
    * `seed`, with an optional perturbation confined to the top-left 4×4
    * block (`pert` — the planted-near-dup device: it moves exactly one
    * cell of the 8×8 block-average grid, so the dHash of a perturbed
    * twin differs in ≤1 bit while aHash may drift a couple of
    * borderline bits through the mean). The product term wraps mod 256
    * frequently, so grids of different seeds decorrelate — unrelated
    * images land ~28 bits apart, far outside any sane hamming radius. */
  private[graft] def synthPixel(seed: Long, pert: Boolean, x: Int, y: Int): Int = {
    val a = (seed % 7 + 1).toInt
    val b = (seed % 11 + 2).toInt
    val c = (seed % 251).toInt
    val base = ((x + 1) * (y + 3) * a + b * x + c) % 256
    if (pert && x < 4 && y < 4) (base + 128) % 256 else base
  }

  /** Deterministic 32×32 grayscale PNG synthesizer (fixture use): doc_id
    * arithmetic only — docs with doc_id % 10 == 1 are planted near-dups
    * of doc_id − 1 (same pattern seed, one perturbed 4×4 block). A REAL
    * `javax.imageio` PNG encode, so [[imagePerceptualHash]] exercises a
    * genuine codec round trip (PNG is lossless; the raster survives
    * exactly, which is what makes the SQL oracle possible). */
  private[graft] def synthPng(docId: Long): Array[Byte] = {
    val seed = if (docId % 10 == 1) docId - 1 else docId
    val pert = docId % 10 == 1
    encodeGrayPng(32, 32, (x, y) => synthPixel(seed, pert, x, y))
  }

  /** aHash/dHash from a REAL raster decode (`ImageIO.read` — unlike the
    * metadata path this one must pay the pixel decode; the hashes are
    * the projection, so 100 TB of blobs reduce to 2 longs per image
    * inside the partition). Grid: 8×8 block means (integer floor), then
    *  - aHash bit r·7+c  =  g(r,c) > floor(Σg / 64)
    *  - dHash bit r·7+c  =  g(r,c) > g(r,c+1)
    * Non-images or rasters smaller than 8×8 yield the −1 sentinel row
    * (mixed batches never throw). */
  private[graft] def imagePerceptualHash(docId: Long, bytes: Array[Byte]): ImageHashes = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null || img.getWidth < 8 || img.getHeight < 8)
      return ImageHashes(docId, -1L, -1L, -1L, -1L)
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val bw = w / 8
    val bh = h / 8
    val g = new Array[Long](64)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        var s = 0L
        var dy = 0
        while (dy < bh) {
          var dx = 0
          while (dx < bw) {
            s += raster.getSample(c * bw + dx, r * bh + dy, 0)
            dx += 1
          }
          dy += 1
        }
        g(r * 8 + c) = s / (bw * bh)
        c += 1
      }
      r += 1
    }
    val mean = g.sum / 64
    var ahash = 0L
    var dhash = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        val k = r * 7 + c
        if (g(r * 8 + c) > mean) ahash |= 1L << k
        if (g(r * 8 + c) > g(r * 8 + c + 1)) dhash |= 1L << k
        c += 1
      }
      r += 1
    }
    ImageHashes(docId, w.toLong, h.toLong, ahash, dhash)
  }

  /** Perceptual hashes from a blob table — the image-dedup face of
    * [[decodeFeatures]], same batched `mapPartitions` seam (blobs never
    * pass the driver; two longs per image are the projection). */
  def decodeImageHashes(blobs: DataFrame, batchSize: Int = 64): Dataset[ImageHashes] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, b) => imagePerceptualHash(id, b) })
      }
  }

  /** REAL raster resize (round 10 — replaces the byte-crop stand-in):
    * `javax.imageio` decode → integer block-mean decimation by `factor`
    * (output pixel (x,y) = FLOOR of the factor×factor input block's
    * mean — integer arithmetic end-to-end, so a SQL oracle replays
    * every output pixel) → REAL PNG re-encode. Operates on the
    * grayscale band 0, the repo's media convention ([[synthPng]]).
    * Blobs no reader decodes, or rasters smaller than `factor`, yield
    * a (−1, −1) sentinel with an empty blob (mixed batches never
    * throw). Returns None for the sentinel case. */
  private[graft] def resizeRaster(bytes: Array[Byte],
      factor: Int): Option[(Array[Byte], Int, Int)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null || img.getWidth < factor || img.getHeight < factor) None
    else {
      val w2 = img.getWidth / factor
      val h2 = img.getHeight / factor
      val in = img.getRaster
      val out = new java.awt.image.BufferedImage(
        w2, h2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val or = out.getRaster
      val area = factor * factor
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          var s = 0L
          var dy = 0
          while (dy < factor) {
            var dx = 0
            while (dx < factor) {
              s += in.getSample(x * factor + dx, y * factor + dy, 0)
              dx += 1
            }
            dy += 1
          }
          or.setSample(x, y, 0, (s / area).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some((bos.toByteArray, w2, h2))
    }
  }

  /** Blob-in/blob-out image downscale over a (doc_id, blob) table —
    * the batched `mapPartitions` seam of [[decodeFeatures]]: blobs are
    * decoded, decimated and re-encoded inside the partition and never
    * pass the driver; at 100 TB the resized blobs are the projection
    * (factor² smaller than the input). Output: (doc_id, blob, width,
    * height) of the RESIZED image; sentinel rows carry (empty, −1, −1). */
  def resizeImages(blobs: DataFrame, factor: Int,
      batchSize: Int = 64): DataFrame = {
    require(factor >= 1, s"resizeImages: factor=$factor")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, b) =>
          resizeRaster(b, factor) match {
            case Some((nb, w, h)) => (id, nb, w.toLong, h.toLong)
            case None => (id, Array.emptyByteArray, -1L, -1L)
          }
        })
      }
      .toDF("doc_id", "blob", "width", "height")
  }

  /** Shared grayscale-PNG encoder for the synthetic fixtures: raster
    * filled from `px(x, y)`, encoded through the REAL codec. */
  private[graft] def encodeGrayPng(w: Int, h: Int,
      px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, px(x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL JPEG encode at an explicit quality — the LOSSY leg of the
    * image fixture family (round 11). Everything downstream is the
    * production seam unchanged ([[decodeImageHashes]] already decodes
    * any `ImageIO`-readable format): what this adds is a fixture whose
    * decoded raster does NOT equal the source, so the perceptual-hash
    * near-dup path is exercised under real codec noise. No SQL oracle
    * can exist for a lossy decode (DuckDB cannot replay the DCT), so
    * the JPEG leg is spec-gated — the q35/q44/q49 precedent: planted
    * near-dup pairs must survive the encode→decode→hash→banding
    * pipeline end-to-end (Round11Spec). */
  private[graft] def encodeGrayJpeg(w: Int, h: Int,
      px: (Int, Int) => Int, quality: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, px(x, y))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** [[synthPng]]'s lossy twin: the same planted-near-dup structure
    * (doc_id % 10 == 1 shares doc_id−1's pattern seed with one
    * perturbed 4×4 block), encoded as a REAL JPEG at quality 0.85. */
  private[graft] def synthJpeg(docId: Long): Array[Byte] = {
    val seed = if (docId % 10 == 1) docId - 1 else docId
    val pert = docId % 10 == 1
    encodeGrayJpeg(32, 32, (x, y) => synthPixel(seed, pert, x, y), 0.85f)
  }

  /** Tiny multi-frame media container for the video fixtures: magic
    * "GFV0", big-endian int32 frame count, int32 byte length per frame,
    * then the frames — each a REAL PNG. The format is deliberately
    * minimal: the point is the 1-blob→N-decoded-frames dataflow, not
    * container archaeology; a production pipeline swaps [[parseFrames]]
    * for its demuxer behind the same seam. */
  private[graft] def synthVideo(docId: Long): Array[Byte] = {
    val nFrames = (1 + docId % 3).toInt
    val seed0 = if (docId % 10 == 1) docId - 1 else docId
    val frames = (0 until nFrames).map { f =>
      // frame f's pattern seed = seed0·8 + f: docs with doc_id%10==1
      // share every frame seed with doc_id−1 (nFrames may differ), so
      // common frames are EXACT dups except frame 0, whose 4×4
      // perturbation makes it a planted near-dup — the cross-video
      // frame-dedup structure q209's fixture spec asserts
      Multimodal.encodeGrayPng(32, 32,
        (x, y) => synthPixel(seed0 * 8 + f, docId % 10 == 1 && f == 0, x, y))
    }
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeBytes("GFV0")
    dos.writeInt(nFrames)
    frames.foreach(f => dos.writeInt(f.length))
    frames.foreach(dos.write)
    dos.flush()
    bos.toByteArray
  }

  /** Parse a [[synthVideo]]-format container into its frame blobs;
    * None when the magic/lengths don't check out (never throws). */
  private[graft] def parseFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes.length < 8 ||
        new String(bytes, 0, 4, "US-ASCII") != "GFV0") return None
    val buf = java.nio.ByteBuffer.wrap(bytes, 4, bytes.length - 4)
    val n = buf.getInt
    if (n < 0 || n > 4096 || buf.remaining < 4 * n) return None
    val lens = Seq.fill(n)(buf.getInt)
    // Long sum: n can be 4096 and each len up to Int.MaxValue, so an
    // Int sum of valid-looking ints can wrap negative and slip past
    // the bound check — then buf.get throws, breaking the documented
    // never-throws contract on a corrupt container.
    if (lens.exists(_ < 0) || lens.map(_.toLong).sum > buf.remaining) return None
    Some(lens.map { len =>
      val frame = new Array[Byte](len)
      buf.get(frame)
      frame
    })
  }

  /** Per-frame perceptual hashes. */
  final case class FrameHashes(
      doc_id: Long, frame_no: Long, width: Long, height: Long,
      ahash: Long, dhash: Long)

  /** REAL frame extraction (round 10 — replaces the byte-stride
    * stand-in): 1 container blob → N DECODED frame rows, each frame
    * paying the genuine PNG raster decode and reducing to its
    * [[imagePerceptualHash]] — the video leg of the image near-dup
    * family (frame dHashes feed [[NearDup.hammingPairs]] unchanged).
    * Partition-local flatMap: containers are demuxed and frames
    * decoded inside the partition, only (6 longs)/frame leave it.
    * Unparseable blobs yield one (−1, −1, −1, −1, −1) sentinel row. */
  def extractFrameHashes(blobs: DataFrame,
      batchSize: Int = 64): Dataset[FrameHashes] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.iterator.flatMap { case (id, b) =>
          parseFrames(b) match {
            case Some(frames) => frames.iterator.zipWithIndex.map {
              case (fb, i) =>
                val h = imagePerceptualHash(id, fb)
                FrameHashes(id, i.toLong, h.width, h.height, h.ahash, h.dhash)
            }
            case None => Iterator.single(FrameHashes(id, -1L, -1L, -1L, -1L, -1L))
          }
        })
      }
  }
}
