package graft.streaming

import java.io.ByteArrayInputStream
import java.sql.Timestamp
import javax.imageio.ImageIO

import graft.mm.MediaDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One exploded (modality, band, key) row of a streamed medium's
  * 64-bit perceptual hash.
  */
case class BandedMedia(mod: String, band: Int, key: Long, docId: Long,
    phash: Long, ts: Timestamp)

/** A media near-dup hit: `docB` (later) collided with `docA`
  * (earlier) in band `band` of modality `modality`; `hamming` is the
  * EXACT 64-bit distance (the full hash rides in state — 8 bytes —
  * so unlike the text stream's estimated Jaccard, the streaming
  * verify is exact).
  */
case class MediaDupHit(modality: String, docA: Long, docB: Long,
    hamming: Int, band: Int, ts: Timestamp)

/** Per-bucket state: newest-first ring of (docId, phash, tsMillis). */
case class MediaBucket(members: Seq[(Long, Long, Long)])

/** Streaming perceptual-hash media dedup — [[NearDup]]'s machinery
  * carried to the media pipeline, serving BOTH hash-frame modalities
  * in one topology: each arriving payload is decoded and hashed ONCE
  * (mapPartitions — image → q152's dHash, audio → q154's energy/ZCR
  * contour; rasters and PCM never enter state or the shuffle), its 4
  * banded 16-bit keys probe per-bucket ring state, and collisions
  * against recent earlier media emit exact-verified pairs
  * (`bit_count(xor) ≤ maxHamming`) — the "is this upload a re-encode
  * of something we just crawled?" path a live ingest pipeline runs
  * next to the batch backfill (q152/q154) and the incremental batch
  * probes (q157/q158). Video streams through its own topology
  * ([[VideoNearDup]]): its per-pair score is slot-aware (`match_frac`
  * over frame sets), so it needs per-video-pair slot state — two Long
  * bitmasks — on top of this operator's frame-ring shape.
  *
  * The MODALITY is part of the bucket key, so an image hash and an
  * audio hash that happen to share a band value occupy different
  * state and can never pair — the streaming spelling of q155's
  * namespace-disjoint guarantee.
  *
  * State discipline (identical to the text stream, and what lets
  * this run forever): event-time timeout evicts a bucket once the
  * watermark passes its newest member + horizon (memory ≈ one
  * horizon of 8-byte hashes, not payloads, not the stream's
  * lifetime); `bucketCap` rings a hot bucket (a meme flood) to its
  * newest members so state stays bounded and misses degrade to OLD
  * pairs only. Emission is at-least-once per colliding pair (a pair
  * within Hamming ≤ Bands−1 shares ≥ 1 band by pigeonhole but may
  * share several — each band's bucket is independent state);
  * consumers dedup on (doc_a, doc_b).
  */
object MediaNearDup {

  /** `media` columns: `doc_id: long`, `mime: string`, `media:
    * binary`, `ts: timestamp`. Returns a streaming DataFrame
    * `(modality, doc_a, doc_b, hamming, band, ts)` of exact-verified
    * same-modality pairs. Undecodable payloads and mimes outside the
    * image and audio families drop out at the hash stage.
    */
  def mediaNearDupStream(media: DataFrame, horizon: String = "1 hour",
      bucketCap: Int = 16,
      maxHamming: Int = MediaDedup.MaxHamming,
      standingIndexDir: Option[String] = None): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // Layout resolution (r17 verdict #3): the manual dial
    // spark.graft.media.widePhashBands wins when set — stream AND
    // batch both honor it, so a dialed deployment mines the same
    // candidate space in both paths (StreamingSpec pins the parity).
    // Undialed, the stream resolves from the STANDING phash index
    // count (`standingIndexDir`, or conf
    // spark.graft.media.phashStoreDir — q157's persisted store) at
    // query start, so a stream running next to an auto-wide backfill
    // auto-resolves wide too instead of silently mining a different
    // candidate space. With neither dial nor store: 4×16 — a
    // cold-start stream's population is its horizon-bounded state,
    // not a corpus. Resolved ONCE at plan time: layout must be
    // stable across micro-batches (band keys live in state).
    val (bands, bandBits) =
      MediaDedup.streamPhashBandLayout(spark, standingIndexDir)
    val horizonMs = NearDup.intervalMillis(horizon)

    val hashed = media.select(col("doc_id"), col("mime"), col("media"),
        col("ts"))
      .as[(Long, String, Array[Byte], Timestamp)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.flatMap { case (id, mime, bytes, ts) =>
          if (mime.startsWith("image/")) {
            val img =
              try ImageIO.read(new ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
            if (img == null) None
            else Some(("image", id, MediaDedup.dHash(img), ts))
          } else if (mime.startsWith("audio/"))
            MediaDedup.audioHash(bytes).map(h => ("audio", id, h, ts))
          else None
        }
      }.toDF("mod", "doc_id", "phash", "ts")

    val banded = hashed
      .select(col("mod"), col("doc_id"), col("phash"), col("ts"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("key",
        expr(s"shiftrightunsigned(phash, band * $bandBits)")
          .bitwiseAND(lit((1L << bandBits) - 1)))
      .withWatermark("ts", horizon)
      .select(col("mod"), col("band"), col("key"),
        col("doc_id").as("docId"), col("phash"), col("ts"))
      .as[BandedMedia]

    banded
      .groupByKey(d => (d.mod, d.band, d.key))
      .flatMapGroupsWithState[MediaBucket, MediaDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (String, Int, Long), batch: Iterator[BandedMedia],
         state: GroupState[MediaBucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var members = state.getOption.map(_.members).getOrElse(Seq.empty)
            val out = Seq.newBuilder[MediaDupHit]
            var maxTs = members.headOption.map(_._3).getOrElse(0L)
            batch.toSeq.sortBy(d => (d.ts.getTime, d.docId)).foreach { d =>
              members.foreach { case (earlierId, earlierHash, _) =>
                if (earlierId != d.docId) {
                  val ham = java.lang.Long.bitCount(earlierHash ^ d.phash)
                  if (ham <= maxHamming)
                    out += MediaDupHit(key._1, earlierId, d.docId, ham,
                      d.band, d.ts)
                }
              }
              members = ((d.docId, d.phash, d.ts.getTime) +: members)
                .take(bucketCap)
              maxTs = math.max(maxTs, d.ts.getTime)
            }
            state.update(MediaBucket(members))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.result().iterator
          }
      }
      .toDF("modality", "doc_a", "doc_b", "hamming", "band", "ts")
  }
}
