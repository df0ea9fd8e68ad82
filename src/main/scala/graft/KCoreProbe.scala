package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage wall attribution for q126 (edge derivation vs adaptive-k
  * counts vs peel rounds vs final projection) at a replicated scale
  * dir — the instrumentation behind SWEEP_r06's k-core verdict.
  *
  *   SPARK_GRAFT_KCORE_VERBOSE=1 sbt "runMain graft.KCoreProbe /tmp/graft_sfx30v2"
  */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sfx10v2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-k-core-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(String.format(java.util.Locale.ROOT, "PROBE %-12s %.2fs",
        name, Double.box((System.nanoTime() - t0) / 1e9)))
      r
    }
    val edges = t("edges") {
      graph.Triangles.coPurchaseEdges(spark, d).localCheckpoint()
    }
    val k = t("adaptiveK") { graph.KCore.adaptiveK(edges) }
    val core = t("peel") {
      graph.KCore.kCore(edges, k,
        verbose = sys.env.get("SPARK_GRAFT_KCORE_VERBOSE").contains("1"))
    }
    t("final") { core.orderBy("node").count() }
    spark.stop()
  }
}
