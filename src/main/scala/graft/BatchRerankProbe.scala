package graft

import org.apache.spark.sql.SparkSession

/** Head-to-head timing of the q136 batch exact-tier shapes — flat
  * embeddings scan vs keyed (ccell-pruned) re-rank — on the SAME
  * cached index, the measurement behind
  * [[graft.search.Pq.BatchKeyedRerankMinRows]] (the batch sibling of
  * StreamIngestProbe's lookup comparison; the crossovers differ
  * because a one-shot batch amortizes the keyed join's fixed cost
  * over one run, not a trigger stream).
  *
  *   sbt "runMain graft.BatchRerankProbe /root/testdata/sf0.1"
  */
object BatchRerankProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-batch-rerank-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = Tables.embeddings(spark, d).count()
    def minWarm(keyed: Boolean): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        search.Pq.ivfPqSearch(spark, d, nprobe = 8,
          keyed = Some(keyed)).count()
        (System.nanoTime() - t0) / 1e9
      }
      // rep 1 pays the one-time index/codebook build for this JVM
      times.drop(1).min
    }
    def f(x: Double): String = String.format(java.util.Locale.ROOT,
      "%.3f", java.lang.Double.valueOf(x))
    val flat = minWarm(keyed = false)
    val keyed = minWarm(keyed = true)
    println(s"""PROBE_JSON {"probe":"q136_batch_rerank_shapes",""" +
      s""""dir":"$d","corpus_rows":$n,"reps":$reps,""" +
      s""""warm_min_sec_flat":${f(flat)},""" +
      s""""warm_min_sec_keyed":${f(keyed)}}""")
    spark.stop()
  }
}
