package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot IVF cell-size profiler (r18): builds the two-level index
  * over a dir's embeddings and prints the (ccell, fcell) population
  * distribution plus the SIZE-BIASED mean cell size — the expected
  * candidates-per-probe for a query routed proportionally to cell
  * mass, i.e. the number that actually prices a kNN lookup. Used to
  * attribute the q127 100× decade's residual super-linearity:
  * replicated sweep corpora hold k identical copies of every base
  * vector, and identical vectors are indivisible for any vector-space
  * partitioner, so cell sizes get lumpy as k grows — a replication
  * artifact a real (distinct-heavy) corpus doesn't have.
  *
  *   sbt "runMain graft.CellProfile /tmp/graft_sfx100v3_o7000000000"
  */
object CellProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-cell-profile", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val idx = search.Ann.buildIvfIndex(emb)
    val sizes = idx.assigned.groupBy("ccell", "fcell").count()
      .select(col("count").cast("double").as("sz"))
    val row = sizes.agg(
      count(lit(1)).as("cells"),
      min("sz").as("min"),
      expr("percentile_approx(sz, 0.5)").as("p50"),
      expr("percentile_approx(sz, 0.9)").as("p90"),
      max("sz").as("max"),
      avg("sz").as("mean"),
      (sum(col("sz") * col("sz")) / sum(col("sz"))).as("size_biased_mean")
    ).head()
    println(f"CELLPROFILE dir=$dir n=$n cells=${row.getLong(0)} " +
      f"min=${row.getDouble(1)}%.0f p50=${row.getDouble(2)}%.0f " +
      f"p90=${row.getDouble(3)}%.0f max=${row.getDouble(4)}%.0f " +
      f"mean=${row.getDouble(5)}%.1f " +
      f"size_biased_mean=${row.getDouble(6)}%.1f")
    spark.stop()
  }
}
