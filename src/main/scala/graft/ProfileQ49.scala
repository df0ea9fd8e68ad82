package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Temporary profiling harness for the q31/q49 dedup path. */
object ProfileQ49 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Scale.sessionBuilder("graft-profile-q49", cpus)
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

    // Stage-by-stage q31 internals: where does the LSH pass spend?
    val sets = Dedup.tokenSets(docs).cache()
    time("  tokenSets")(sets.count())
    val sig = sets.select(col("doc_id"),
      graft.functions.HashFunctions.minhash_sig(col("toks"), 64).as("mh"))
    time("  minhash sigs")(sig.count())
    val cand = Dedup.candidatePairs(sets, 64, 8, 0.9)
    time("  candidate ids")(cand.count())

    val pairs = Dedup.minhashPairs(sets, 64, 8, 0.9)
      .select("doc_a", "doc_b").cache()
    time("minhashPairs 64x8")(pairs.count())
    time("connectedComponents")(Dedup.connectedComponents(pairs).count())
    sets.unpersist()
    if (k <= 1) {
      time("q31 full")(Dedup.minhashLsh.fn(spark, d).count())
      time("q49 full")(Dedup.clusters.fn(spark, d).count())
      time("q25 full")(streaming.Rescoring.rescoreBatch.fn(spark, d).count())
      time("q60 full")(Dedup.decontaminate.fn(spark, d).count())

      // Skewed-group micro-bench: where the partial-agg top-k beats
      // the window. One hot group holding ~all rows: the window must
      // shuffle+sort every row of the hot group on one task; the
      // aggregate ships ≤K rows per map partition.
      import org.apache.spark.sql.expressions.Window
      val skew = spark.range(4000000).select(
        when(col("id") % 100 =!= 0, lit(0L)).otherwise(col("id") % 1000)
          .as("key"),
        col("id").as("id"),
        (col("id") % 97).cast("double").as("score"))
        .cache()
      skew.count()
      val w = Window.partitionBy("key")
        .orderBy(desc("score"), asc("id"))
      time("skew window top-3")(
        skew.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3).count())
      time("skew agg top-3")(
        skew.groupBy("key")
          .agg(graft.functions.TopKAgg.top_k_agg(col("id"), col("score"), 3)
            .as("topk"))
          .select(col("key"), posexplode(col("topk"))).count())
      skew.unpersist()
    }
    spark.stop()
  }
}
