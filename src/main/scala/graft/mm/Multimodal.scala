package graft.mm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata, processed batch-at-a-time with `mapPartitions` over
  * typed records (the Scala analogue of `mapInPandas` — one decoder
  * instantiation per partition, streamed row iterator, columnar in/out
  * schema).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE standing in for a real decoder
  * (e.g. javax.imageio / ffmpeg bindings); everything around it — the
  * binary column plumbing, partition-wise batching, schema, and
  * downstream feature columns — is real and tested. Swapping in a real
  * decoder changes only the body of `decodeStub`.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, frames: Int,
      embedding: Array[Float])

  /** STUB — deterministic fake "decode": derives pseudo metadata and
    * a tiny feature vector purely from the bytes, so tests are stable.
    * A real implementation would decode the container format here.
    */
  def decodeStub(rec: MediaRecord): MediaFeatures = {
    val bytes = rec.media
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
    def field(i: Int, mod: Int, off: Int) =
      (math.abs((h >>> (i * 8)) % mod) + off).toInt
    val emb = Array.tabulate(8)(i =>
      (((h >>> i) & 0xFFFF).toFloat / 65535f) * 2f - 1f)
    MediaFeatures(rec.doc_id, rec.mime, bytes.length.toLong,
      width = field(0, 1920, 16), height = field(1, 1080, 16),
      channels = if (rec.mime.startsWith("audio")) 2 else 3,
      frames = if (rec.mime.startsWith("video")) field(2, 9000, 1) else 1,
      embedding = emb)
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
      .when(ext.isin("png", "gif"), concat(lit("image/"), ext))
      .when(ext === "mp3", lit("audio/mpeg"))
      .when(ext.isin("wav", "flac"), concat(lit("audio/"), ext))
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

  /** Partition-wise media feature extraction — the Spark-side shape a
    * real decoder plugs into: typed input, per-partition setup, typed
    * columnar output.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (one per task, not
      // one per row)
      it.map(decodeStub)
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

  /** Queries entry: synthesize a binary media column from `documents`
    * (UTF-8 payload, mime by round-robin), run the full decode →
    * feature pipeline, emit the feature table. Rows-only check (the
    * stub's outputs aren't ANSI-SQL-reproducible).
    */
  val mediaFeatures: QueryDef = QueryDef.rowsOnly("q26_multimodal_features") {
    (s, d) =>
      import s.implicits._
      val media = Tables.documents(s, d).select(
        col("doc_id"),
        element_at(array(lit("image/png"), lit("audio/wav"),
          lit("video/mp4")), (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        col("text").cast("binary").as("media"))
        .as[MediaRecord]
      extractFeatures(media).toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"), col("width"),
          col("height"), col("channels"), col("frames"),
          // stringified for the flat-result check; the library API
          // (extractFeatures) keeps the typed Array[Float] column
          to_json(col("embedding")).as("embedding"))
        .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(mediaFeatures)
}
