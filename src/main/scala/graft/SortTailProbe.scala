package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.graft.ColumnBridge

/** Round-14 verdict item 4: price the MILD global-sort residual on
  * real materialization walls.
  *
  * `PlanAudit` reports ~151 queries whose final ORDER BY sits above a
  * shuffle (`reexecutes_last_stage`): range partitioning's bound
  * sampling re-runs only the post-shuffle stage — usually cheap, but
  * invisible to bench's `count()` (EliminateSorts) while fully paid
  * by Verify/collect/write, exactly how q127's severe variant hid.
  *
  * For each named query this probe measures the PARQUET WRITE wall —
  * the Verify-shaped materialization — of the registered plan
  * (global orderBy tail) against the same plan with the top Sort
  * respelled as `repartition(1).sortWithinPartitions` (no range
  * exchange, no bound sampling, one output partition — valid where
  * the ordered output is small, which every oracle output is).
  * The respell is built mechanically: the analyzed plan's top
  * `Sort(order, global=true, child)` is unwrapped and the SAME
  * SortOrder expressions are replayed within the single partition,
  * so the total order is identical. Row counts are asserted equal.
  * Interleaved reps (A,B,A,B,…), min-of-reps per variant.
  */
object SortTailProbe {

  def respellTail(spark: SparkSession, df: DataFrame): Option[DataFrame] =
    df.queryExecution.analyzed match {
      case Sort(order, true, child, _) =>
        val cols = order.map(ColumnBridge.column)
        Some(ColumnBridge.dataFrame(spark, child)
          .repartition(1).sortWithinPartitions(cols: _*))
      case _ => None
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q153_curation_v3", "q148_label_propagation",
        "q155_media_dup_clusters", "q81_pagerank", "q146_trustrank")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-sort-tail-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)", "count(distinct id % 7)")
      .collect()
    val outBase = "/tmp/sort_tail_probe"
    def f(x: Double): String = String.format(java.util.Locale.ROOT,
      "%.4f", java.lang.Double.valueOf(x))
    def wall(df: DataFrame, path: String): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").parquet(path)
      (System.nanoTime() - t0) / 1e9
    }
    val results = names.flatMap { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          System.err.println(s"[sort-tail] unknown query $name")
          None
        case Some(fn) =>
          val shipped = fn(spark, sfDir)
          respellTail(spark, shipped) match {
            case None =>
              System.err.println(
                s"[sort-tail] $name has no global-sort tail; skipped")
              None
            case Some(respelled) =>
              // row-count parity (the respell must be a pure plan
              // change), then one untimed warmup each
              val n1 = shipped.count(); val n2 = respelled.count()
              require(n1 == n2, s"$name respell changed rows: $n1 vs $n2")
              var a = Vector.empty[Double]; var b = Vector.empty[Double]
              for (i <- 1 to reps) {
                a = a :+ wall(fn(spark, sfDir), s"$outBase/${name}_a")
                b = b :+ wall(respellTail(spark, fn(spark, sfDir)).get,
                  s"$outBase/${name}_b")
              }
              Some(s""""$name":{"rows":$n1,""" +
                s""""orderby_write_min":${f(a.min)},""" +
                s""""respell_write_min":${f(b.min)},""" +
                s""""orderby_reps":[${a.map(f).mkString(",")}],""" +
                s""""respell_reps":[${b.map(f).mkString(",")}]}""")
          }
      }
    }
    def load1(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").head
      catch { case _: Throwable => "null" }
    println(s"""PROBE_JSON {"probe":"sort_tail_walls","dir":"$sfDir",""" +
      s""""reps":$reps,"load1_end":${load1()},""" +
      s""""queries":${results.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
