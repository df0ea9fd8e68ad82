package graft

import graft.mm.{MediaDedup, Multimodal, VideoDedup}
import org.apache.spark.sql.functions._

class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  test("GVID container round-trips frames; malformed bytes decode to " +
      "None") {
    val frames = (0 until 3).map(t => VideoDedup.syntheticFrame(7L, t))
    val decoded = VideoDedup.decodeVideoFrames(
      VideoDedup.encodeVideo(frames))
    assert(decoded.isDefined && decoded.get.size == 3)
    decoded.get.zip(frames).foreach { case (a, b) =>
      assert(a.sameElements(b), "frame bytes changed in the container")
    }
    assert(VideoDedup.decodeVideoFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoDedup.decodeVideoFrames(
      "GVIDgarbage".getBytes("UTF-8")).isEmpty)
  }

  test("multimodal decode handles the GVID container: frames counted " +
      "from the container, raster fields from the first real frame; " +
      "codec-less containers stay decoded=false") {
    val vid = VideoDedup.syntheticVideo(9L)
    val f = Multimodal.decode(
      Multimodal.MediaRecord(9L, "video/x-graft", vid))
    assert(f.decoded, "GVID did not decode")
    assert(f.frames == VideoDedup.Frames, f.toString)
    assert(f.width == 64 && f.height == 64 && f.channels == 3, f.toString)
    assert(f.n_bytes == vid.length.toLong)
    val bad = Multimodal.decode(
      Multimodal.MediaRecord(1L, "video/x-graft", Array[Byte](1, 2)))
    assert(!bad.decoded)
    // mp4/mkv: the JDK ships no codec — honestly undecoded, never faked
    val mp4 = Multimodal.decode(
      Multimodal.MediaRecord(1L, "video/mp4", vid))
    assert(!mp4.decoded)
  }

  test("per-transform: every planted video copy scores above the " +
      "match bar; unrelated videos score zero") {
    // direct pair scoring through the full banded pipeline on a
    // hand-built corpus: 12 originals (covering all 3 transforms via
    // (id/10) % 3) + copies + 12 unrelated videos
    val ids = (0 until 12).map(_ * 10L)
    val recs = ids.flatMap { id =>
      val v = VideoDedup.syntheticVideo(id)
      Seq(Multimodal.MediaRecord(id, "video/x-graft", v),
        Multimodal.MediaRecord(id + MediaDedup.CopyIdOffset,
          "video/x-graft", VideoDedup.transformedVideo(id, v)))
    } ++ (1000L until 1012L).map(i =>
      Multimodal.MediaRecord(i, "video/x-graft",
        VideoDedup.syntheticVideo(i)))
    val hashes = VideoDedup.hashVideos(recs.toDS()).cache()
    val pairs = VideoDedup.videoDupPairs(hashes).cache()
    val found = pairs.select("video_a", "video_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (id <- ids) {
      assert(found.contains((id, id + MediaDedup.CopyIdOffset)),
        s"planted copy of video $id (transform ${(id / 10) % 3}) missed")
    }
    // no unrelated pair anywhere near the bar
    val unrelated = pairs.filter(col("video_a") >= 1000L ||
      (col("video_b") >= 1000L && col("video_b") < MediaDedup.CopyIdOffset))
    assert(unrelated.count() == 0,
      s"unrelated videos paired: ${unrelated.collect().mkString(",")}")
    // a trimmed copy has fewer slots but still scores 1.0 via the
    // max-fraction rule (transform 1 = ids with (id/10) % 3 == 1)
    val trimmed = pairs
      .filter(col("video_a") === 10L &&
        col("video_b") === 10L + MediaDedup.CopyIdOffset)
      .head()
    assert(trimmed.getAs[Long]("slots_b") ==
      trimmed.getAs[Long]("slots_a") - 2, trimmed.toString)
    assert(trimmed.getAs[Double]("match_frac") >= 0.99, trimmed.toString)
    pairs.unpersist(); hashes.unpersist()
  }

  test("non-video and undecodable payloads drop out of the frame scan; " +
      "sampling caps slots per video") {
    val many = VideoDedup.encodeVideo((0 until 40).map(t =>
      VideoDedup.syntheticFrame(3L, t)))
    val recs = Seq(
      Multimodal.MediaRecord(1L, "video/x-graft",
        VideoDedup.syntheticVideo(1L)),
      Multimodal.MediaRecord(2L, "image/png", MediaDedup.syntheticPhoto(2L)),
      Multimodal.MediaRecord(3L, "video/x-graft", many),
      Multimodal.MediaRecord(4L, "video/x-graft", Array[Byte](9, 9, 9))
    ).toDS()
    val hashed = VideoDedup.hashVideos(recs)
      .groupBy("video_id").agg(count(lit(1)).as("slots"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed.keySet == Set(1L, 3L))
    assert(hashed(1L) == VideoDedup.Frames.toLong)
    assert(hashed(3L) <= VideoDedup.MaxSampledFrames.toLong,
      s"sampling cap broken: ${hashed(3L)} slots")
  }

  test("q156 surfaces planted transformed video copies; recall >= 0.8 " +
      "and every reported pair above the match bar") {
    val out = VideoDedup.videoDedup.fn(spark, sfTiny).cache()
    val planted = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("video_a"),
        (col("doc_id") + MediaDedup.CopyIdOffset).as("video_b"))
    val nPlanted = planted.count()
    val found = planted.join(out, Seq("video_a", "video_b"), "left_semi")
      .count()
    info(s"planted video recall: $found/$nPlanted")
    assert(found.toDouble / nPlanted >= 0.8)
    assert(out.filter(col("match_frac") < VideoDedup.MinMatchFrac)
      .count() == 0)
    assert(out.filter(col("video_a") >= col("video_b")).count() == 0)
    out.unpersist()
  }

  test("q159 incremental video pass equals the full pass restricted " +
      "to the batch, pair for pair") {
    val hashes = VideoDedup.videoHashes(spark, sfTiny)
    val cols = Seq("video_a", "video_b", "matched_a", "matched_b",
      "slots_a", "slots_b")
    val incr = VideoDedup.incrementalVideoDupPairs(
      hashes.filter(col("video_id") % 7 =!= 0),
      hashes.filter(col("video_id") % 7 === 0))
      .select(cols.map(col): _*)
    val full = VideoDedup.videoDupPairs(hashes)
      .filter(col("video_a") % 7 === 0 || col("video_b") % 7 === 0)
      .select(cols.map(col): _*)
    assert(incr.exceptAll(full).isEmpty && full.exceptAll(incr).isEmpty,
      "incremental video pass diverged from the restricted full pass")
    // and it finds something: planted pairs whose original or copy
    // falls in the batch slice
    assert(incr.count() > 0, "no video pairs touch the batch slice")
    // corpus-only pairs never leak into the incremental output
    assert(incr.filter(col("video_a") % 7 =!= 0 &&
      col("video_b") % 7 =!= 0).count() == 0)
  }
}
