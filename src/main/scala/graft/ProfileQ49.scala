package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Temporary profiling harness for the q31/q49 dedup path. */
object ProfileQ49 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  -> $r")
      r
    }
    // SPARK_GRAFT_REPLICATE=k scales the corpus k× for scaling
    // measurements: each replica gets ~30% extra replica-unique salt
    // tokens so near-dup cliques stay within a replica (cross-replica
    // jaccard ≤ 1/1.3 < 0.9) — rows grow k×, true pairs grow ~k×.
    val k = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "1").toInt
    val base = Tables.documents(spark, d)
    val docs = (if (k <= 1) base
    else {
      base.crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("doc_id") * k + col("rep")).as("doc_id"),
          concat_ws(" ", col("text"), array_join(
            transform(
              sequence(lit(1),
                ceil(size(split(col("text"), " ")) * 0.3).cast("int")),
              i => concat(lit("rep"), col("rep"), lit("t"), i)), " "))
            .as("text"))
    }).cache()
    time(s"docs count (x$k)")(docs.count())

    val pairs = Dedup.minhashPairs(docs, 64, 8, 0.9)
      .select("doc_a", "doc_b").cache()
    time("minhashPairs 64x8")(pairs.count())
    time("connectedComponents")(Dedup.connectedComponents(pairs).count())
    if (k <= 1) {
      time("q31 full")(Dedup.minhashLsh.fn(spark, d).count())
      time("q49 full")(Dedup.clusters.fn(spark, d).count())
    }
    spark.stop()
  }
}
