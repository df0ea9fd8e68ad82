package graft

import graft.graph.Triangles
import org.apache.spark.sql.SparkSession

/** r14 verdict item 1: the graph edge cache's "pays once per corpus
  * snapshot" argument needs a clean price for the once — the 10×
  * sweep's rep-1 figures absorbed a host stall (37–64 s per SWEEP_r14
  * `graph_cache_10x_check`), so the cold-build cost at scale had no
  * uncontaminated measurement. This probe measures the COLD BUILD
  * alone: each rep runs in a FRESH session (the cache keys on the
  * session, so every rep pays the full derivation — lineitem scan,
  * self-join, aggregate, localCheckpoint — for BOTH cached views),
  * bracketed by ~100 ms calibration ticks and the 1-minute loadavg so
  * every rep carries its own idle/loaded provenance. min-of-reps is
  * the statistic (protocol). Run against the base dir for 1× and the
  * ScaleSweep dir for 10×.
  */
object EdgeCacheBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-edge-cache-build-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def tick(): Double = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < 75000000L) {
        x = x * 6364136223846793005L + 1442695040888963407L
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (x == 42L) System.err.print("")
      sec
    }
    def load1(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").head
      catch { case _: Throwable => "null" }
    def f(x: Double): String = String.format(java.util.Locale.ROOT,
      "%.4f", java.lang.Double.valueOf(x))
    tick() // pay the tick loop's JIT before any measured sample
    // codegen/scan-path warmup in a throwaway session so rep 1
    // measures the build, not JVM cold start
    spark.range(100000).selectExpr("sum(id)", "count(distinct id % 7)")
      .collect()
    Triangles.cachedWeightedEdges(spark.newSession(), sfDir).count()

    val walls = (1 to reps).map { _ =>
      val s = spark.newSession()
      val l1 = load1()
      val tickPre = tick()
      val t0 = System.nanoTime()
      val wRows = Triangles.cachedWeightedEdges(s, sfDir).count()
      val uRows = Triangles.cachedUndirectedEdges(s, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val tickPost = tick()
      (sec, tickPre, tickPost, l1, wRows, uRows)
    }
    val repsJson = walls.map { case (sec, tp, te, l1, _, _) =>
      s"""{"build_sec":${f(sec)},"tick_pre":${f(tp)},""" +
        s""""tick_post":${f(te)},"load1":$l1}"""
    }.mkString("[", ",", "]")
    println(s"""PROBE_JSON {"probe":"edge_cache_cold_build",""" +
      s""""dir":"$sfDir","reps":$reps,""" +
      s""""min_build_sec":${f(walls.map(_._1).min)},""" +
      s""""weighted_rows":${walls.head._5},""" +
      s""""undirected_rows":${walls.head._6},"runs":$repsJson}""")
    spark.stop()
  }
}
