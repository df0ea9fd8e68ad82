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
    val spark = Scale.sessionBuilder("graft-gate-run", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val js = Gates.toJson(Gates.all(spark, sfDir, only), sfDir)
    println(js)
    // SPARK_GRAFT_GATES_OUT=path: also persist the (provenance-
    // stamped) artifact — the input round_close.py validates and
    // blesses into SPECGATES_STANDING.json at round close. Only
    // meaningful for a FULL gate run; a subset run writes a partial
    // file, which round_close rejects by gate count.
    sys.env.get("SPARK_GRAFT_GATES_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        js.getBytes("UTF-8"))
      println(s"wrote $p")
    }
    spark.stop()
  }
}
