package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-nprobe curve for the q136 IVF·PQ composition — the q119
  * dim-ablation precedent applied to the composed index's one dial:
  * for each dir, measure recall@5 vs the exact scan and warm
  * per-batch latency at nprobe ∈ {2, 4, 8, 16}, so the shipped
  * nprobe=8 is a measured point on a curve (where the knee is, what
  * recall a narrower/wider probe buys) rather than a constant taken
  * on faith. Run against sf0.1 and a ScaleSweep-built 10× dir:
  *
  *   sbt "runMain graft.PqProbe /root/testdata/sf0.1 /tmp/graft_sfx10v2"
  *
  * Emits one PROBE_JSON line per dir for SWEEP_r09.json.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val spark = Scale.sessionBuilder("graft-pq-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f(d: Double): String = String.format(java.util.Locale.ROOT,
      "%.4f", java.lang.Double.valueOf(d))
    for (d <- dirs) {
      val exact = search.Ann.bruteForce.fn(spark, d)
        .select("query_id", "neighbor_id").cache()
      val nExact = exact.count()
      val rows = Seq(2, 4, 8, 16).map { nprobe =>
        // rep 0 unmeasured: the standing index/codebook builds are
        // per-(session, dir) one-time costs shared across the curve
        search.Pq.ivfPqSearch(spark, d, nprobe).count()
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          search.Pq.ivfPqSearch(spark, d, nprobe).count()
          (System.nanoTime() - t0) / 1e9
        }
        val hit = exact.join(
          search.Pq.ivfPqSearch(spark, d, nprobe)
            .select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
        val recall = hit.toDouble / nExact
        println(f"PQPROBE $d nprobe=$nprobe%2d recall@5=${f(recall)} " +
          f"warm_min=${f(times.min)}s")
        s"""{"nprobe":$nprobe,"recall_at_5":${f(recall)},""" +
          s""""warm_min_sec":${f(times.min)},""" +
          s""""warm_median_sec":${f(times.sorted.apply(times.size / 2))}}"""
      }
      println(s"""PROBE_JSON {"probe":"q136_nprobe_curve","dir":"$d",""" +
        s""""reps":$reps,"rows":[${rows.mkString(",")}]}""")
      exact.unpersist()
    }
    spark.stop()
  }
}
