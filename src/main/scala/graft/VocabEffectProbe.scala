package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolates the sweep-vocabulary effect on q143's cost. The
  * replicated sweep dirs salt every document with unique tokens (the
  * dup-avoidance device for the exact-Jaccard operators), which
  * inflates the REFERENCE slice's vocabulary linearly with corpus
  * size — exactly the quantity q143's broadcast LM tables size with.
  * The note in SWEEP_r09 attributes q143's absolute tier cost to
  * that artifact; this probe MEASURES the attribution by timing the
  * same query on two 10× corpora that differ only in salting: the
  * sweep's salted dir vs a pure replication whose vocabulary equals
  * the base corpus's.
  *
  *   sbt "runMain graft.VocabEffectProbe /tmp/graft_sfx10v2"
  */
object VocabEffectProbe {
  def main(args: Array[String]): Unit = {
    val salted = args.headOption.getOrElse("/tmp/graft_sfx10v2")
    val src = "/root/testdata/sf0.1"
    val k = 10
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-vocab-effect-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // pure replication: same row count as the salted dir, base vocab
    val plain = Scale.managedTempDir("graft_q143_nosalt").toString
    spark.read.parquet(s"$src/documents.parquet")
      .crossJoin(spark.range(k).select(col("id").as("rep")))
      .withColumn("doc_id", col("doc_id") * k + col("rep"))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$plain/documents.parquet")

    def vocab(d: String): Long =
      spark.read.parquet(s"$d/documents.parquet")
        .filter(col("source") === "src0")
        .select(explode(split(col("text"), " ")).as("t"))
        .distinct().count()
    def minWarm(d: String): Double = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        text.TextAnalysis.perplexityBuckets.fn(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      times.drop(1).min
    }
    def f(x: Double): String = String.format(java.util.Locale.ROOT,
      "%.3f", java.lang.Double.valueOf(x))
    val (vS, vP) = (vocab(salted), vocab(plain))
    val (tS, tP) = (minWarm(salted), minWarm(plain))
    println(s"""PROBE_JSON {"probe":"q143_vocab_effect",""" +
      s""""salted":{"ref_vocab":$vS,"warm_min_sec":${f(tS)}},""" +
      s""""plain_replica":{"ref_vocab":$vP,"warm_min_sec":${f(tP)}},""" +
      s""""rows_equal":true}""")
    spark.stop()
  }
}
