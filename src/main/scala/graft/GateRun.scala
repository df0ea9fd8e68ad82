package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop gate runner: re-measure a subset of the SPECGATES
  * entries (all of them with no second arg) without the full Verify
  * dump — `runMain graft.GateRun /root/testdata/sf0.01 q20,q127`.
  * Prints the same JSON rows Verify would write, to stdout.
  */
object GateRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only: Set[String] =
      if (args.length > 1) {
        val resolved = Gates.names.filter(n => args(1).split(",")
          .exists(t => n == t || n.startsWith(t + "_"))).toSet
        // An unmatched filter (typo) must not silently invert into
        // "run ALL gates" — that's a full re-measure the dev loop
        // didn't ask for. Abort loudly instead.
        if (resolved.isEmpty) {
          System.err.println(
            s"GateRun: filter '${args(1)}' matches no gate name; " +
              s"known gates: ${Gates.names.mkString(",")}")
          sys.exit(2)
        }
        resolved
      } else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(Gates.toJson(Gates.all(spark, sfDir, only), sfDir))
    spark.stop()
  }
}
