package graft

import java.sql.Timestamp

import graft.mm.{MediaDedup, VideoDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Throughput/state probe for the streaming VIDEO near-dup topology —
  * the measurement the r12 verdict asked for: the batch video tier
  * has 10× sweep points, the stream tier had correctness specs but
  * no measured ingest rate or state-size curve.
  *
  * Drives an id-seeded video corpus (originals + planted transformed
  * copies, the q156 generator) through
  * [[graft.streaming.VideoNearDup.videoNearDupStream]] as
  * `SPARK_GRAFT_BATCHES` MemoryStream micro-batches at 1× and
  * `SPARK_GRAFT_REPLICATE`× corpus scale, and records per scale:
  *
  *   - ingest throughput (videos/s over the warm batches — batch 0
  *     pays plan/codegen and is excluded; each video decodes
  *     [[VideoDedup.Frames]] frames, so frames/s = videos/s × 8),
  *   - max state rows PER STAGE (frame-bucket rings vs video-pair
  *     slot states — the pair stage's rows are the two-Longs-per-pair
  *     bound under test: its row count must track ACTIVE PAIRS, not
  *     stream length or frame volume, so the 10×/1× row ratio should
  *     be ~the pair ratio and bytes/row flat),
  *   - max state bytes (both stages), and emitted pair count.
  *
  * Replica ids ride the high bits (`ScaleSweep.ReplicaOffset` — the
  * r12 scheme), and replica CONTENT is generated from the offset id,
  * so cross-replica videos are unrelated and true pairs grow k×, not
  * k²× — the clean scaling regime. Event time advances 1 s/batch:
  * the whole run stays inside one horizon, the worst case for state.
  *
  * Emits one `PROBE_JSON` line per scale (sweep-artifact shape).
  */
object VideoStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "10").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // The pair-state pressure dial (SWEEP_r13 video_stream_probe
    // named it): the STREAM hit bar can sit tighter than the batch
    // tier's MaxHamming — the match-frac bar tolerates a minority of
    // per-frame misses, and every spurious frame hit that clears the
    // bar opens a pair-state row that lives a full horizon. This env
    // lets one probe run price the trade: pair-stage rows vs emitted
    // pairs at a tighter bar.
    val streamHamming = sys.env.get("SPARK_GRAFT_STREAM_HAMMING")
      .map(_.toInt).getOrElse(MediaDedup.MaxHamming)
    val spark = Scale.sessionBuilder("graft-video-stream-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val baseIds = Tables.documents(spark, sfDir)
      .select("doc_id").as[Long]
      .filter((id: Long) => id % 10 == 0).collect().sorted

    // (doc_id, gvid bytes): originals + transformed copies, content
    // seeded from the REPLICATED id — generated distributed (PNG
    // encoding dominates), collected to feed the MemoryStream
    def corpusAt(reps: Int): Array[(Long, Array[Byte])] = {
      require(reps.toLong * ScaleSweep.ReplicaOffset <=
        MediaDedup.CopyIdOffset, s"replicate=$reps overflows the " +
        "media id headroom (same bound as ScaleSweep; max 15)")
      val ids = for (rep <- 0 until reps; id <- baseIds)
        yield id + rep * ScaleSweep.ReplicaOffset
      spark.sparkContext.parallelize(ids, 64).flatMap { vid =>
        val v = VideoDedup.syntheticVideo(vid)
        Seq((vid, v),
          (vid + MediaDedup.CopyIdOffset,
            VideoDedup.transformedVideo(vid, v)))
      }.collect()
    }

    for (reps <- Seq(1, k)) {
      val vids = corpusAt(reps)
      val input = MemoryStream[(Long, String, Array[Byte], Timestamp)](spark)
      val name = s"video_stream_probe_$reps"
      val q = streaming.VideoNearDup.videoNearDupStream(
          input.toDF().toDF("doc_id", "mime", "media", "ts"),
          horizon = "1 hour", maxHamming = streamHamming)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val per = math.max(1, vids.length / batches)
        val groups = vids.grouped(per).toSeq
        var warmNanos = 0L
        var warmVids = 0L
        var maxRowsByOp = Map.empty[String, Long]
        var maxBytes = 0L
        groups.zipWithIndex.foreach { case (g, i) =>
          val t0 = System.nanoTime()
          input.addData(g.map { case (id, bytes) =>
            (id, "video/x-graft", bytes,
              new Timestamp(1700000000000L + i * 1000L))
          })
          q.processAllAvailable()
          val dt = System.nanoTime() - t0
          if (i > 0) { warmNanos += dt; warmVids += g.length }
          val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
          // two flatMapGroupsWithState stages report in plan order:
          // index 0 = pair stage (downstream), 1 = frame stage
          ops.zipWithIndex.foreach { case (op, j) =>
            val key = s"op$j"
            maxRowsByOp += key -> math.max(
              maxRowsByOp.getOrElse(key, 0L), op.numRowsTotal)
          }
          maxBytes = math.max(maxBytes, ops.map(_.memoryUsedBytes).sum)
        }
        val pairs = spark.table(name).count()
        val vidsPerSec =
          if (warmVids == 0) 0.0 else warmVids / (warmNanos / 1e9)
        val rowsJson = maxRowsByOp.toSeq.sortBy(_._1)
          .map { case (kk, v) => s""""$kk":$v""" }.mkString("{", ",", "}")
        println(f"""PROBE_JSON {"op":"stream_video_neardup","sf":"$sfDir","replicate":$reps,"videos":${vids.length},"batches":${groups.length},"max_hamming":$streamHamming,"warm_videos":$warmVids,"videos_per_sec":$vidsPerSec%.1f,"max_state_rows":$rowsJson,"max_state_bytes":$maxBytes,"emitted_pairs":$pairs}""")
      } finally q.stop()
    }
    spark.stop()
  }
}
