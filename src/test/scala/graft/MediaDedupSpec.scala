package graft

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.mm.{MediaDedup, Multimodal}
import org.apache.spark.sql.functions._

class MediaDedupSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(png: Array[Byte]): Long =
    MediaDedup.dHash(ImageIO.read(new ByteArrayInputStream(png)))

  test("dHash is deterministic and resize-tolerant") {
    val png = MediaDedup.syntheticPhoto(42L)
    val h1 = hashOf(png)
    assert(h1 == hashOf(png), "hash not deterministic")
    // 2x upscale: the 9-cell grid boundaries fall on different pixel
    // fractions at 64 vs 128 px (integer floor), so cell means shift
    // slightly — the hash is CLOSE, not identical; the duplicate bar
    // must absorb it
    val d = java.lang.Long.bitCount(
      h1 ^ hashOf(MediaDedup.transformedCopy(10L, png)))
    assert(d <= MediaDedup.MaxHamming, s"2x upscale moved $d bits")
  }

  test("planted transforms stay within MaxHamming; unrelated photos " +
      "sit near the random baseline") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val byTransform = (0 until 60).map { i =>
      val id = i * 10L // transform cycles on (id/10) % 3
      val png = MediaDedup.syntheticPhoto(id)
      val d = ham(hashOf(png),
        hashOf(MediaDedup.transformedCopy(id, png)))
      ((id / 10) % 3, d)
    }
    for ((t, ds) <- byTransform.groupBy(_._1)) {
      val worst = ds.map(_._2).max
      info(s"transform $t: worst hamming $worst over ${ds.size}")
      assert(worst <= MediaDedup.MaxHamming,
        s"transform $t exceeds MaxHamming: $worst")
    }
    // unrelated photos: mean pair distance near 32 (random 64-bit
    // baseline), and no unrelated pair inside the duplicate bar
    val hashes = (0L until 40L).map(i => hashOf(
      MediaDedup.syntheticPhoto(i)))
    val pairs = for {
      i <- hashes.indices; j <- hashes.indices if i < j
    } yield ham(hashes(i), hashes(j))
    info(f"unrelated: mean ${pairs.sum.toDouble / pairs.size}%.1f " +
      s"min ${pairs.min}")
    assert(pairs.sum.toDouble / pairs.size > 20.0,
      "synthetic photos not distinct enough for a meaningful test")
  }

  test("q152 surfaces planted transformed duplicates through the " +
      "banded join; recall >= 0.8 and every reported pair verified") {
    val out = MediaDedup.mediaDedup.fn(spark, sfTiny).cache()
    val planted = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + MediaDedup.CopyIdOffset).as("doc_b"))
    val nPlanted = planted.count()
    val found = planted.join(out, Seq("doc_a", "doc_b"), "left_semi")
      .count()
    info(s"planted recall: $found/$nPlanted")
    assert(found.toDouble / nPlanted >= 0.8)
    // structural: every reported pair is within the Hamming bar and
    // ordered doc_a < doc_b
    assert(out.filter(col("hamming") > MediaDedup.MaxHamming).count() == 0)
    assert(out.filter(col("doc_a") >= col("doc_b")).count() == 0)
    out.unpersist()
  }

  test("non-image and undecodable payloads drop out of the hash scan") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image/png", MediaDedup.syntheticPhoto(1L)),
      Multimodal.MediaRecord(2L, "audio/wav", Multimodal.syntheticWav(2L)),
      Multimodal.MediaRecord(3L, "image/png", Array[Byte](1, 2, 3))
    ).toDS()
    val hashed = MediaDedup.hashMedia(recs).collect()
    assert(hashed.map(_.getLong(0)).toSet == Set(1L))
  }

  private def audioHashOf(bytes: Array[Byte]): Long =
    MediaDedup.audioHash(bytes).getOrElse(fail("tone did not decode"))

  test("audioHash is deterministic; planted tone transforms stay " +
      "within MaxHamming; unrelated tones sit near the random baseline") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val wav = MediaDedup.syntheticTone(42L)
    assert(audioHashOf(wav) == audioHashOf(wav), "hash not deterministic")
    val byTransform = (0 until 60).map { i =>
      val id = i * 10L // transform cycles on (id/10) % 3
      val w = MediaDedup.syntheticTone(id)
      val d = ham(audioHashOf(w),
        audioHashOf(MediaDedup.transformedTone(id, w)))
      ((id / 10) % 3, d)
    }
    for ((t, ds) <- byTransform.groupBy(_._1)) {
      val worst = ds.map(_._2).max
      info(s"audio transform $t: worst hamming $worst over ${ds.size}")
      assert(worst <= MediaDedup.MaxHamming,
        s"audio transform $t exceeds MaxHamming: $worst")
    }
    val hashes = (0L until 40L).map(i =>
      audioHashOf(MediaDedup.syntheticTone(i)))
    val pairs = for {
      i <- hashes.indices; j <- hashes.indices if i < j
    } yield ham(hashes(i), hashes(j))
    info(f"unrelated tones: mean ${pairs.sum.toDouble / pairs.size}%.1f " +
      s"min ${pairs.min}")
    assert(pairs.sum.toDouble / pairs.size > 20.0,
      "synthetic tones not distinct enough for a meaningful test")
  }

  test("q154 surfaces planted transformed tone duplicates; recall " +
      ">= 0.8 and every reported pair verified") {
    val out = MediaDedup.audioDedup.fn(spark, sfTiny).cache()
    val planted = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + MediaDedup.CopyIdOffset).as("doc_b"))
    val nPlanted = planted.count()
    val found = planted.join(out, Seq("doc_a", "doc_b"), "left_semi")
      .count()
    info(s"planted audio recall: $found/$nPlanted")
    assert(found.toDouble / nPlanted >= 0.8)
    assert(out.filter(col("hamming") > MediaDedup.MaxHamming).count() == 0)
    assert(out.filter(col("doc_a") >= col("doc_b")).count() == 0)
    out.unpersist()
  }

  test("non-audio payloads drop out of the audio hash scan") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio/wav", MediaDedup.syntheticTone(1L)),
      Multimodal.MediaRecord(2L, "image/png", MediaDedup.syntheticPhoto(2L)),
      Multimodal.MediaRecord(3L, "audio/wav", Array[Byte](1, 2, 3))
    ).toDS()
    val hashed = MediaDedup.hashAudio(recs).collect()
    assert(hashed.map(_.getLong(0)).toSet == Set(1L))
  }

  test("q155 clusters cover all three modalities: planted copies land " +
      "in their original's cluster, one min-id keeper per cluster, " +
      "full coverage") {
    val out = MediaDedup.mediaDupClusters.fn(spark, sfTiny).cache()
    // coverage: one row per hashed media doc, per modality
    val expected = MediaDedup.imageHashes(spark, sfTiny).count() +
      MediaDedup.audioHashes(spark, sfTiny).count() +
      graft.mm.VideoDedup.videoHashes(spark, sfTiny)
        .select("video_id").distinct().count()
    assert(out.count() == expected)
    assert(out.select("modality", "doc_id").distinct().count() == expected)
    assert(out.select("modality").distinct().collect().map(_.getString(0))
      .toSet == Set("image", "audio", "video"))
    // keeper structure: exactly one keeper per (modality, cluster) and
    // the keeper is the min doc_id (= the cluster label)
    val badKeeper = out.groupBy("modality", "cluster_id")
      .agg(min("doc_id").as("mn"),
        sum(when(col("is_keeper"), 1).otherwise(0)).as("k"))
      .filter(col("mn") =!= col("cluster_id") || col("k") =!= 1)
      .count()
    assert(badKeeper == 0, s"$badKeeper clusters with bad keeper structure")
    // planted copies cluster with their originals, per modality
    for (modality <- Seq("image", "audio", "video")) {
      val m = out.filter(col("modality") === modality)
      val orig = m.select(col("doc_id"), col("cluster_id").as("c_orig"))
      val copies = m.filter(col("doc_id") >= MediaDedup.CopyIdOffset)
        .select((col("doc_id") - MediaDedup.CopyIdOffset).as("doc_id"),
          col("cluster_id").as("c_copy"))
      val joined = copies.join(orig, Seq("doc_id")).cache()
      val n = joined.count()
      val hit = joined.filter(col("c_copy") === col("c_orig")).count()
      info(s"$modality planted-copy cluster recall: $hit/$n")
      assert(n > 0, s"no planted $modality copies in the corpus")
      assert(hit.toDouble / n >= 0.8)
      joined.unpersist()
    }
    out.unpersist()
  }

  test("phash index store: save/load round-trips; a replayed batch id " +
      "is a no-op within its lineage, a fresh lineage appends") {
    val dir = java.nio.file.Files.createTempDirectory("graft_phash_spec")
      .toString + "/idx"
    val base = Seq((1L, 0x1111L), (2L, 0x2222L)).toDF("doc_id", "phash")
    MediaDedup.savePhashIndex(base, dir)
    def rows() = MediaDedup.loadPhashIndex(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows() == Set((1L, 0x1111L), (2L, 0x2222L)))
    val batch = Seq((3L, 0x3333L)).toDF("doc_id", "phash")
    MediaDedup.appendPhashBatch(dir, 0L, batch, runNs = "run1")
    assert(rows().contains((3L, 0x3333L)))
    // replay within the lineage: no duplicate rows
    MediaDedup.appendPhashBatch(dir, 0L, batch, runNs = "run1")
    assert(MediaDedup.loadPhashIndex(spark, dir).count() == 3)
    // a fresh lineage reusing the id must NOT be dropped as a replay
    MediaDedup.appendPhashBatch(dir, 0L,
      Seq((4L, 0x4444L)).toDF("doc_id", "phash"), runNs = "run2")
    assert(rows().contains((4L, 0x4444L)))
    assert(MediaDedup.loadPhashIndex(spark, dir).count() == 4)
  }

  test("q157 incremental pass equals the full pass restricted to the " +
      "batch, pair for pair") {
    val hashes = MediaDedup.imageHashes(spark, sfTiny)
    val incr = MediaDedup.incrementalNearDupPairs(
      hashes.filter(col("doc_id") % 7 =!= 0),
      hashes.filter(col("doc_id") % 7 === 0))
      .select("doc_a", "doc_b", "hamming")
    val full = MediaDedup.nearDupPairs(hashes)
      .filter(col("doc_a") % 7 === 0 || col("doc_b") % 7 === 0)
      .select("doc_a", "doc_b", "hamming")
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
      "incremental pass diverged from the restricted full pass")
    // and it finds something: planted pairs whose original or copy
    // falls in the batch slice
    assert(incr.count() > 0, "no pairs touch the batch slice")
    // corpus-only pairs never leak into the incremental output
    assert(incr.filter(col("doc_a") % 7 =!= 0 &&
      col("doc_b") % 7 =!= 0).count() == 0)
  }

  test("wide 3x21 phash banding (the crawl-scale dial) keeps planted " +
      "recall >= 0.8 for both modalities and the incremental identity") {
    // every planted transform measures <= 2 Hamming bits, and 3
    // disjoint 21-bit bands guarantee a candidate at <= 2 banded
    // bits - so the pigeonhole recall argument survives the r16
    // saturation fix (see MediaDedup.phashBandLayout)
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.media.widePhashBands", "true")
    try {
      for (query <- Seq(MediaDedup.mediaDedup, MediaDedup.audioDedup)) {
        val out = query.fn(s2, sfTiny).cache()
        val planted = Tables.documents(s2, sfTiny)
          .filter(col("doc_id") % 10 === 0)
          .select(col("doc_id").as("doc_a"),
            (col("doc_id") + MediaDedup.CopyIdOffset).as("doc_b"))
        val nPlanted = planted.count()
        val found = planted.join(out, Seq("doc_a", "doc_b"), "left_semi")
          .count()
        info(s"${query.name} wide-band planted recall: $found/$nPlanted")
        assert(found.toDouble / nPlanted >= 0.8, query.name)
        assert(out.filter(col("hamming") > MediaDedup.MaxHamming)
          .count() == 0)
        out.unpersist()
      }
      // the q157 restriction identity is layout-independent
      val hashes = MediaDedup.imageHashes(s2, sfTiny)
      val incr = MediaDedup.incrementalNearDupPairs(
        hashes.filter(col("doc_id") % 7 =!= 0),
        hashes.filter(col("doc_id") % 7 === 0))
        .select("doc_a", "doc_b", "hamming")
      val full = MediaDedup.nearDupPairs(hashes)
        .filter(col("doc_a") % 7 === 0 || col("doc_b") % 7 === 0)
        .select("doc_a", "doc_b", "hamming")
      assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
        "wide-band incremental pass diverged from the restricted full")
    } finally s2.conf.unset("spark.graft.media.widePhashBands")
  }

  test("phash band layout self-selects from the corpus size; the " +
      "manual dial overrides either way and skips the count") {
    val s2 = spark.newSession()
    // auto: below threshold narrow, above it wide
    assert(MediaDedup.phashBandLayout(s2, 10L) == MediaDedup.NarrowLayout)
    assert(MediaDedup.phashBandLayout(s2,
      MediaDedup.DefaultPhashWideThresholdItems + 1) ==
      MediaDedup.WideLayout)
    // threshold conf is live
    s2.conf.set("spark.graft.media.phashWideThresholdItems", "5")
    assert(MediaDedup.phashBandLayout(s2, 6L) == MediaDedup.WideLayout)
    assert(MediaDedup.phashBandLayout(s2, 5L) == MediaDedup.NarrowLayout)
    s2.conf.unset("spark.graft.media.phashWideThresholdItems")
    // manual dial pins the layout at ANY scale and must never run
    // the count job (by-name corpusItems) — the escape hatch costs
    // nothing and can't be surprised by a weird count
    s2.conf.set("spark.graft.media.widePhashBands", "false")
    assert(MediaDedup.phashBandLayout(s2,
      sys.error("count evaluated despite manual dial")) ==
      MediaDedup.NarrowLayout)
    s2.conf.set("spark.graft.media.widePhashBands", "true")
    assert(MediaDedup.phashBandLayout(s2,
      sys.error("count evaluated despite manual dial")) ==
      MediaDedup.WideLayout)
    s2.conf.unset("spark.graft.media.widePhashBands")
  }

  test("auto wide cutover end-to-end: a threshold below the corpus " +
      "upgrades q152 to wide with recall intact, and the incremental " +
      "path resolves from corpus+batch so the identity holds ON the " +
      "boundary") {
    val s2 = spark.newSession()
    val hashes = MediaDedup.imageHashes(s2, sfTiny)
    val total = hashes.count()
    val corpusSide = hashes.filter(col("doc_id") % 7 =!= 0).count()
    // place the threshold BETWEEN the standing-corpus count and the
    // full count: a corpus-side-only resolution would pick narrow
    // while the full pass picks wide — the exact split the
    // union-count rule exists to prevent
    assert(corpusSide < total)
    s2.conf.set("spark.graft.media.phashWideThresholdItems",
      ((corpusSide + total) / 2).toString)
    try {
      val out = MediaDedup.mediaDedup.fn(s2, sfTiny).cache()
      val planted = Tables.documents(s2, sfTiny)
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + MediaDedup.CopyIdOffset).as("doc_b"))
      val nPlanted = planted.count()
      val found = planted.join(out, Seq("doc_a", "doc_b"), "left_semi")
        .count()
      info(s"auto-wide planted recall: $found/$nPlanted")
      assert(found.toDouble / nPlanted >= 0.8, "auto-wide recall")
      out.unpersist()
      val incr = MediaDedup.incrementalNearDupPairs(
        hashes.filter(col("doc_id") % 7 =!= 0),
        hashes.filter(col("doc_id") % 7 === 0))
        .select("doc_a", "doc_b", "hamming")
      val full = MediaDedup.nearDupPairs(hashes)
        .filter(col("doc_a") % 7 === 0 || col("doc_b") % 7 === 0)
        .select("doc_a", "doc_b", "hamming")
      assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
        "incremental diverged from restricted full across the cutover")
    } finally
      s2.conf.unset("spark.graft.media.phashWideThresholdItems")
  }
}
