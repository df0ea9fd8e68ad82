package graft.streaming

import java.sql.Timestamp

import graft.functions.HashFunctions.minhash_sig
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One exploded (band, bucket) row of a document's minhash signature. */
case class BandedDoc(band: Int, bandHash: Long, docId: Long,
    sig: Seq[Long], ts: Timestamp)

/** A near-dup candidate: `docB` (later) collided with `docA` (earlier)
  * in LSH band `band`; `estJaccard` is the Broder signature estimate.
  */
case class NearDupCandidate(docA: Long, docB: Long, estJaccard: Double,
    band: Int, ts: Timestamp)

/** Per-bucket state: newest-first ring of recent members. */
case class BucketMembers(members: Seq[(Long, Seq[Long], Long)])

/** Streaming near-duplicate detection — the streaming analogue of
  * `Dedup.candidatePairs`: each arriving document's banded minhash
  * signature probes per-bucket state (the same (band, band_hash) keys
  * the batch bucket join shuffles on); collisions against recent
  * earlier documents emit candidate pairs with a signature-estimated
  * Jaccard. State is bounded two ways, which is what makes this run
  * forever at ingest scale:
  *
  *   - event-time timeout: a bucket's state is evicted once the
  *     watermark passes its newest member + `horizon` — memory holds
  *     ~one horizon of documents, not the stream's lifetime;
  *   - `bucketCap`: a template-heavy burst can flood one bucket; the
  *     ring keeps the newest `bucketCap` members, so a hot bucket
  *     degrades to missed OLD pairs instead of unbounded state (the
  *     batch path is the backfill for completeness).
  *
  * Emission is at-least-once per colliding pair (a pair sharing m
  * bands can emit up to m times — the batch first-match-band dedup
  * has no one-pass streaming equivalent because each band's bucket is
  * independent state); consumers dedup on (doc_a, doc_b) downstream
  * or treat emissions as idempotent flags. Estimated (not exact)
  * Jaccard keeps state to one signature per member — token sets stay
  * out of the state store; an exact verify join is a batch follow-up
  * over the emitted candidates.
  */
object NearDup {

  /** `docs` columns: `doc_id: long`, `text: string`, `ts: timestamp`.
    * Returns a streaming DataFrame `(doc_a, doc_b, est_jaccard, band,
    * ts)`.
    *
    * Layout resolution (the media-stream contract, r18 carried item):
    * explicit `numHashes`/`bands` win — a dialed deployment mines the
    * stated candidate space. Left at 0 (auto), the layout resolves
    * ONCE at plan time through [[graft.dedup.Dedup
    * .streamTextBandLayout]]: the `spark.graft.text.wideMinhashBands`
    * conf dial if set, else the STANDING signature store's doc count
    * (`standingStoreDir`, or conf `spark.graft.text.sigStoreDir`) —
    * so a stream running next to a crawl-scale corpus auto-resolves
    * the selective 12×12 layout instead of silently mining a
    * different candidate space than the batch tier; with neither,
    * the narrow 8×8 (a cold-start stream's population is its
    * horizon-bounded state, not a corpus). Stable across
    * micro-batches — band keys live in state.
    */
  def nearDupCandidatesStream(docs: DataFrame, numHashes: Int = 0,
      bands: Int = 0, horizon: String = "1 hour", bucketCap: Int = 16,
      minEst: Double = 0.65,
      standingStoreDir: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require((numHashes == 0) == (bands == 0),
      "set numHashes and bands together, or neither (auto)")
    val (k, nb) =
      if (numHashes > 0) (numHashes, bands)
      else graft.dedup.Dedup.streamTextBandLayout(spark, standingStoreDir)
    val rows = k / nb
    require(rows > 0, "numHashes must be >= bands")
    val horizonMs = intervalMillis(horizon)

    val sig = docs.select(col("doc_id"), col("ts"),
      minhash_sig(
        array_sort(array_distinct(transform(split(col("text"), " "),
          t => xxhash64(t)))), k).as("mh"))
    // inline array in the explode (not the attribute) — see
    // Dedup.candidatePairs: the inferred size()>0 filter under a
    // Generate constant-folds on a fixed-length inline array
    def bandHashArr = array((0 until nb).map(b =>
      xxhash64((0 until rows).map(r => col("mh")(b * rows + r)): _*)): _*)
    val banded = sig
      .select(col("doc_id"), col("ts"), col("mh"),
        posexplode(bandHashArr).as(Seq("band", "band_hash")))
      .withWatermark("ts", horizon)
      .select(col("band"), col("band_hash").as("bandHash"),
        col("doc_id").as("docId"), col("mh").as("sig"), col("ts"))
      .as[BandedDoc]

    banded
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState[BucketMembers, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), batch: Iterator[BandedDoc],
         state: GroupState[BucketMembers]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var members = state.getOption.map(_.members).getOrElse(Seq.empty)
            val out = Seq.newBuilder[NearDupCandidate]
            var maxTs = members.headOption.map(_._3).getOrElse(0L)
            batch.toSeq.sortBy(d => (d.ts.getTime, d.docId)).foreach { d =>
              members.foreach { case (earlierId, earlierSig, _) =>
                if (earlierId != d.docId) {
                  val est = estJaccard(earlierSig, d.sig, k)
                  if (est >= minEst)
                    out += NearDupCandidate(earlierId, d.docId, est,
                      d.band, d.ts)
                }
              }
              members = ((d.docId, d.sig, d.ts.getTime) +: members)
                .take(bucketCap)
              maxTs = math.max(maxTs, d.ts.getTime)
            }
            state.update(BucketMembers(members))
            // evict once no in-horizon arrival can collide with the
            // newest member (watermark semantics bound lateness)
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.result().iterator
          }
      }
      .toDF("doc_a", "doc_b", "est_jaccard", "band", "ts")
  }

  private def estJaccard(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    var m = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      if (a(i) == b(i)) m += 1
      i += 1
    }
    m.toDouble / k
  }

  /** Millis of a day-time interval string like "1 hour" / "30 seconds"
    * (no month units — they have no fixed millis).
    */
  private[streaming] def intervalMillis(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(s))
    require(iv.months == 0, s"month-based horizon not supported: $s")
    iv.days * 86400000L + iv.microseconds / 1000L
  }
}
