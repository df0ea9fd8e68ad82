package graft.mm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata, processed batch-at-a-time with `mapPartitions` over
  * typed records (the Scala analogue of `mapInPandas` — one decoder
  * instantiation per partition, streamed row iterator, columnar in/out
  * schema).
  *
  * Decoders are REAL and ship with the JDK — `javax.imageio` for
  * PNG/JPEG/GIF/BMP, `javax.sound.sampled` for WAV/AIFF/AU PCM — so
  * width/height/channels/frames and the per-channel-mean feature
  * vector come from actual pixel rasters and PCM frames, not byte
  * hashes. Containers the JDK has no codec for (mp3/mp4/mkv) decode
  * to `decoded = false` with byte-level metadata only — an honest
  * "codec unavailable", not a fake; plugging an ffmpeg-backed decoder
  * in at scale changes only the dispatch in [[decode]].
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      decoded: Boolean, width: Int, height: Int, channels: Int, frames: Int,
      embedding: Array[Float])

  /** Fixed feature-vector width: per-channel means occupy the first
    * `channels` slots, the rest stay 0 — downstream columns get a
    * stable `Array[Float]` shape whatever the medium.
    */
  val EmbeddingDim = 8

  /** Decode one media payload into typed features. Dispatch is on the
    * mime column (set at ingest from the file extension —
    * [[readMedia]]); a payload its decoder cannot parse yields
    * `decoded = false` rather than an exception, so one corrupt file
    * in a 100 TB scan cannot fail the task.
    */
  def decode(rec: MediaRecord): MediaFeatures =
    try {
      if (rec.mime.startsWith("image/")) decodeImage(rec)
      else if (rec.mime == "audio/wav" || rec.mime == "audio/aiff" ||
        rec.mime == "audio/basic") decodePcmAudio(rec)
      else if (rec.mime == "video/x-graft") decodeGvid(rec)
      else undecoded(rec)
    } catch { case _: Exception => undecoded(rec) }

  /** GVID frame-container decode (the deterministic stand-in for the
    * codec-bearing video path — the JDK ships none, so mp4/mkv stay
    * honestly `decoded=false`): frame count from the container,
    * dimensions and channel means from the FIRST frame's real raster
    * (`javax.imageio` — the q156 fixture's frames are true PNGs), so
    * every field is parsed, not inferred.
    */
  def decodeGvid(rec: MediaRecord): MediaFeatures =
    VideoDedup.decodeVideoFrames(rec.media) match {
      case Some(frames) if frames.nonEmpty =>
        val first = decodeImage(MediaRecord(rec.doc_id, "image/png",
          frames.head))
        if (!first.decoded) undecoded(rec)
        else first.copy(mime = rec.mime,
          n_bytes = rec.media.length.toLong, frames = frames.length)
      case _ => undecoded(rec)
    }

  private def undecoded(rec: MediaRecord): MediaFeatures =
    MediaFeatures(rec.doc_id, rec.mime, rec.media.length.toLong,
      decoded = false, width = 0, height = 0, channels = 0, frames = 0,
      embedding = new Array[Float](EmbeddingDim))

  /** `javax.imageio` decode: true raster dimensions, band count from
    * the sample model, and per-band mean sample value (normalized to
    * [0,1] by the 8-bit range) as the feature vector.
    */
  def decodeImage(rec: MediaRecord): MediaFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(rec.media))
    if (img == null) undecoded(rec)
    else {
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      val bands = raster.getNumBands
      val sums = new Array[Double](bands)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) {
            sums(b) += raster.getSample(x, y, b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val emb = new Array[Float](EmbeddingDim)
      var b = 0
      while (b < math.min(bands, EmbeddingDim)) {
        emb(b) = (sums(b) / (w.toLong * h) / 255.0).toFloat
        b += 1
      }
      MediaFeatures(rec.doc_id, rec.mime, rec.media.length.toLong,
        decoded = true, width = w, height = h, channels = bands, frames = 1,
        embedding = emb)
    }
  }

  /** `javax.sound.sampled` decode for the JDK's PCM containers
    * (WAV/AIFF/AU): channel count and frame length from the parsed
    * header, per-channel mean ABSOLUTE amplitude (normalized by the
    * sample range) as the feature vector. 16-bit and 8-bit PCM
    * supported — the formats `AudioSystem.write` itself produces.
    */
  def decodePcmAudio(rec: MediaRecord): MediaFeatures = {
    val ais = AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(rec.media))
    try {
      val fmt = ais.getFormat
      val channels = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      if (bits != 16 && bits != 8) return undecoded(rec)
      // getFrameLength is -1 for streams with unknown length (legal
      // for AU/streamed PCM); trusting it would report decoded=true
      // with a zero embedding. Also guard the Long→Int narrowing.
      val frameLen = ais.getFrameLength
      if (frameLen < 0 ||
          frameLen > Int.MaxValue / math.max(channels, 1) / (bits / 8))
        return undecoded(rec)
      val frames = frameLen.toInt
      val data = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val sums = new Array[Double](channels)
      var i = 0
      val n = frames * channels
      while (i < n) {
        val v =
          if (bits == 8) (data(i) & 0xFF) - 128
          else {
            val off = i * bytesPerSample
            val lo = data(off) & 0xFF
            val hi = data(off + 1)
            if (fmt.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xFF))
            else ((hi << 8) | lo)
          }
        sums(i % channels) += math.abs(v)
        i += 1
      }
      val range = if (bits == 8) 128.0 else 32768.0
      val emb = new Array[Float](EmbeddingDim)
      var c = 0
      while (c < math.min(channels, EmbeddingDim)) {
        if (frames > 0) emb(c) = (sums(c) / frames / range).toFloat
        c += 1
      }
      MediaFeatures(rec.doc_id, rec.mime, rec.media.length.toLong,
        decoded = true, width = 0, height = 0, channels = channels,
        frames = frames, embedding = emb)
    } finally ais.close()
  }

  /** Real ingestion path for media: a directory tree of files → typed
    * [[MediaRecord]]s via Spark's `binaryFile` source (one row per
    * file; splits parallelize on the file listing, content loads
    * lazily per task — at 100 TB parallelism is the file count and no
    * driver ever holds payloads). doc_id is the path hash, mime comes
    * from the extension.
    */
  def readMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    // registered IANA types, not extension echoes (jpg -> image/jpeg,
    // mp3 -> audio/mpeg), so decoder dispatch keyed on standard mimes
    // matches
    val mime = when(ext.isin("jpg", "jpeg"), lit("image/jpeg"))
      .when(ext.isin("png", "gif", "bmp"), concat(lit("image/"), ext))
      .when(ext === "mp3", lit("audio/mpeg"))
      .when(ext.isin("wav", "flac"), concat(lit("audio/"), ext))
      .when(ext.isin("aiff", "aif"), lit("audio/aiff"))
      .when(ext.isin("mp4", "mkv"), concat(lit("video/"), ext))
      .when(ext === "avi", lit("video/x-msvideo"))
      .otherwise(lit("application/octet-stream"))
    spark.read.format("binaryFile").load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        mime.as("mime"),
        col("content").as("media"))
      .as[MediaRecord]
  }

  /** Partition-wise media feature extraction — typed input,
    * per-partition setup, typed columnar output. `ImageIO` scans its
    * plugin registry per lookup, so the cache flag is set once per
    * partition, not per row.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init (one per task, not one per row)
      ImageIO.setUseCache(false)
      it.map(decode)
    }
  }

  /** "Resize"/frame-sample on the binary payload: byte-range slice as
    * the stand-in for pixel-level ops, keeping the binary-in →
    * binary-out contract.
    */
  def frameSample(media: Dataset[MediaRecord], maxBytes: Int)
      : Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(media = r.media.take(maxBytes)))
  }

  // ---- deterministic fixture generators (shared by q26 and specs) ----
  // Real encoders, deterministic content: every byte of the PNG/WAV
  // payload derives from doc_id alone, so decode output is stable
  // across runs with no RNG. These synthesize the media column the
  // sandbox's testdata lacks; production replaces them with binaryFile
  // ingest (readMedia) over an object store.

  /** Width/height a given doc's synthetic PNG is generated at —
    * the spec's independent expectation for decode. */
  def pngDims(id: Long): (Int, Int) =
    (16 + (id % 16).toInt, 16 + ((id / 16) % 16).toInt)

  /** Deterministic RGB PNG: dimensions from [[pngDims]], pixel values
    * a fixed mix of (id, x, y). Encoded with the same `javax.imageio`
    * the decoder reads — a true round-trip. */
  def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = pngDims(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id + x * 31 + y * 7) & 0xFF).toInt
        val g = (((id >> 8) + x * 13 + y * 3) & 0xFF).toInt
        val b = (((id >> 16) + x + y * 17) & 0xFF).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (channels, frames) a given doc's synthetic WAV is generated at. */
  def wavParams(id: Long): (Int, Int) =
    (1 + (id % 2).toInt, 64 + (id % 64).toInt)

  /** Deterministic 16-bit little-endian PCM WAV via
    * `AudioSystem.write` — the header the decoder parses is produced
    * by the JDK's own writer, not hand-rolled bytes. */
  def syntheticWav(id: Long): Array[Byte] = {
    val (channels, frames) = wavParams(id)
    val fmt = new AudioFormat(8000f, 16, channels, true, false)
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames * channels) {
      val v = (((id * 2654435761L + i * 40503L) % 2000L) - 1000L).toShort
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Queries entry: synthesize real PNG (even doc_id) / WAV (odd)
    * payloads per document, run the decode → feature pipeline, emit
    * the feature table. Rows-only check (pixel decoding isn't
    * ANSI-SQL-expressible); StreamingSpec asserts decoded dimensions
    * equal the generators' parameters and channel means match a
    * solid-color oracle.
    */
  val mediaFeatures: QueryDef = QueryDef.rowsOnly("q26_multimodal_features") {
    (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          if (id % 2 == 0) MediaRecord(id, "image/png", syntheticPng(id))
          else MediaRecord(id, "audio/wav", syntheticWav(id))
        }
      extractFeatures(media).toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"), col("decoded"),
          col("width"), col("height"), col("channels"), col("frames"),
          // stringified for the flat-result check; the library API
          // (extractFeatures) keeps the typed Array[Float] column
          to_json(col("embedding")).as("embedding"))
        .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(mediaFeatures)
}
