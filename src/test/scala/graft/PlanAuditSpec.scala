package graft

/** Locks the plan audits' invariants into the suite.
  *
  * 1. Global sorts: NO query may plan a global sort over a
  *    shuffle-free child — that shape's range-bound sampling
  *    re-executes the entire child on every materialization (2× wall,
  *    invisible to `count()` benches — how q127's regression hid for
  *    four rounds; SWEEP_r13 `global_sort_audit`). A future operator
  *    that lands the shape fails here with its name, instead of
  *    waiting for a probe session.
  *
  * 2. Generate-below-broadcast (round 14): a broadcast side whose
  *    payload IS an exploded row stream was sized by Catalyst from
  *    the PRE-explode child estimate (Generate inherits its child's
  *    size) — at scale that "broadcast" can be a >1 GB driver
  *    collect, the failure `ops/FuzzyJoin.scala`'s `shuffle_hash`
  *    hint exists to prevent. Every instance of the shape must be
  *    either hint-pinned away or on the reviewed allowlist below
  *    with a bounded-fanout argument.
  *
  * 3. Neither audit may silently lose coverage: a query whose plan
  *    fails to BUILD is reported by name and fails here (round-14
  *    ADVICE — the invariant used to pass vacuously for skipped
  *    queries).
  */
class PlanAuditSpec extends SparkSpec {

  /** Reviewed `exploded_rows_broadcast` instances (round-14 audit,
    * SWEEP_r14 `generate_broadcast_audit`). Each entry's fanout is
    * bounded, so the size mis-estimate is a small constant — and
    * since the pre-explode estimate scales with the corpus, the
    * planner self-heals to a shuffle join once the side outgrows the
    * broadcast threshold. Arguments per entry:
    *
    *   - constant BAND fanout (a literal/fixed band array explode,
    *     ≤ 8×): q32 simhash bands, q36 LSH bands, q75 minhash delta
    *     bands (also O(Δ) side), q152/q154/q156/q157/q158/q159 media
    *     hash bands (incrementals are additionally delta-sided);
    *   - bounded-by-design probe/driver side: q136/q139 (nprobe
    *     cells × a fixed 10-query probe set), q88 (sketch top-k,
    *     ≤ k rows), q53 (24 literal price bands);
    *   - explicit reviewed `broadcast()` of the benchmark shingle
    *     set: q123 (benchmark suites are fixed-size by design; the
    *     corpus side is never broadcast — `Dedup.benchAttribution`);
    *   - constant BYTE fanout over a corpus scan: q131 (posexplode
    *     of a fixed 64-dim vector, ~4× bytes), q133 (64-token/48-
    *     stride chunking, ~1.3× bytes).
    */
  private val reviewedExplodedBroadcasts = Set(
    "q123_contamination_attrib", "q131_covariance", "q133_chunk_neardup",
    "q136_ann_ivfpq", "q139_ivfpq_incremental",
    "q152_media_perceptual_dedup", "q154_audio_perceptual_dedup",
    "q156_video_frame_dedup", "q157_incremental_media_dedup",
    "q158_incremental_audio_dedup", "q159_incremental_video_dedup",
    "q32_dedup_simhash", "q36_ann_lsh", "q53_range_join",
    "q75_incremental_neardup", "q88_heavy_hitters")

  private def withStaticPlans[A](body: => A): A = {
    // the audits read STATIC plans — AQE's wrapper hides the
    // sort/exchange tree behind unevaluated stages until execution
    val key = "spark.sql.adaptive.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("no query plans a global sort over a shuffle-free child") {
    withStaticPlans {
      val audit = PlanAudit.globalSortAudit(spark, sfTiny)
      assert(audit.skipped.isEmpty,
        s"audit coverage hole — plans failed to build for: " +
          s"${audit.skipped.mkString(", ")}")
      val severe = audit.findings
        .filter(_._2 == "reexecutes_all").map(_._1).distinct
      assert(severe.isEmpty,
        s"global sort with no shuffle below it (whole child re-executes " +
          s"on materialization) in: ${severe.mkString(", ")}")
    }
  }

  test("no unreviewed broadcast of an exploded row stream") {
    withStaticPlans {
      val audit = PlanAudit.generateBroadcastAudit(spark, sfTiny)
      assert(audit.skipped.isEmpty,
        s"audit coverage hole — plans failed to build for: " +
          s"${audit.skipped.mkString(", ")}")
      val severe = audit.findings
        .filter(_._2 == "exploded_rows_broadcast").map(_._1).distinct
      val unreviewed = severe.filterNot(reviewedExplodedBroadcasts)
      assert(unreviewed.isEmpty,
        s"broadcast side is an exploded row stream sized from the " +
          s"PRE-explode estimate (the FuzzyJoin >1 GB-broadcast hazard) " +
          s"in: ${unreviewed.mkString(", ")} — pin a shuffle_hash hint " +
          s"or add a bounded-fanout argument to the allowlist")
    }
  }
}
