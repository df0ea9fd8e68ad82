package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-nprobe for the filtered IVF search (q141): the filter
  * thins every probed cell to ~1/|labels| density, so filtered ANN
  * needs a wider probe than the unfiltered q48 path for the same
  * recall — this probe measures the curve that justifies the shipped
  * nprobe=12.
  *
  *   sbt "runMain graft.FilteredAnnProbe /root/testdata/sf0.01 /root/testdata/sf0.1"
  */
object FilteredAnnProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-filtered-ann-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f(d: Double): String = String.format(java.util.Locale.ROOT,
      "%.4f", java.lang.Double.valueOf(d))
    for (d <- dirs) {
      val exact = search.Ann.filteredTopK.fn(spark, d)
        .select("query_id", "neighbor_id").cache()
      val nExact = exact.count()
      val emb = Tables.embeddings(spark, d)
      val index = search.Ann.cachedIndex(spark, d, "full", emb)
      val rows = Seq(4, 8, 12, 16).map { nprobe =>
        val got = search.Ann.knnQueryFiltered(index,
            emb.filter(col("vec_id") < search.Ann.NumQueries), emb,
            nprobe = nprobe)
          .select("query_id", "neighbor_id")
        val recall = exact.join(got, Seq("query_id", "neighbor_id"),
          "left_semi").count().toDouble / nExact
        println(s"FILTPROBE $d nprobe=$nprobe recall@5=${f(recall)}")
        s"""{"nprobe":$nprobe,"recall_at_5":${f(recall)}}"""
      }
      println(s"""PROBE_JSON {"probe":"q141_filtered_nprobe","dir":"$d",""" +
        s""""rows":[${rows.mkString(",")}]}""")
      exact.unpersist()
    }
    spark.stop()
  }
}
