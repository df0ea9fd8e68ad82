package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop recall measurement for the ANN family (q36/q48/q127/q134)
  * — the same recall definitions as the SPECGATES entries, runnable
  * standalone per scale dir without dumping all 135 queries:
  *
  *   sbt "runMain graft.RecallCheck /root/testdata/sf0.01 /root/testdata/sf0.1"
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01")
    val spark = Scale.sessionBuilder("graft-recall-check", "16")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def annRecall(e: org.apache.spark.sql.DataFrame,
        a: org.apache.spark.sql.DataFrame): Double = {
      val ee = e.select("query_id", "neighbor_id")
      val aa = a.select("query_id", "neighbor_id")
      ee.join(aa, Seq("query_id", "neighbor_id"), "left_semi").count()
        .toDouble / ee.count()
    }
    for (d <- dirs) {
      val emb = Tables.embeddings(spark, d)
      val exact = search.Ann.bruteForce.fn(spark, d)
      val r36 = annRecall(exact, search.Ann.lshTopK.fn(spark, d))
      val r48 = annRecall(exact, search.Ann.ivfTopK.fn(spark, d))
      val r84 = annRecall(exact, search.Pq.pqTopK.fn(spark, d))
      val r127 = annRecall(search.Ann.exactTopK(emb, 50),
        search.Ann.knnJoinIvf(spark, d).filter(col("query_id") < 50))
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      val delta = emb.filter(col("vec_id") % 10 === 0 &&
        col("vec_id") < 500)
      val r134 = annRecall(search.Ann.exactTopKAgainst(corpus, delta),
        search.Ann.knnIncrementalIvf(spark, d)
          .filter(col("query_id") < 500))
      println(String.format(java.util.Locale.ROOT,
        "RECALL %s q36=%.3f q48=%.3f q84=%.3f q127=%.3f q134=%.3f",
        d, Double.box(r36), Double.box(r48), Double.box(r84),
        Double.box(r127), Double.box(r134)))
    }
    spark.stop()
  }
}
