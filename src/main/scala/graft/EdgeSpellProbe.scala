package graft

import graft.graph.{Communities, KCore, PageRank, Triangles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 verdict item 3: bound the co-purchase edge respell's
  * local-1× residual FAMILY-WIDE instead of by one q122 pair.
  *
  * The shipped derivation ([[Triangles.adjacentPartPairs]]) pins the
  * join key to l_orderkey alone and runs the +1 adjacency as a join
  * FILTER, so both sides are sameResult and ReuseExchange scans +
  * shuffles lineitem ONCE — at the price of ≤ 7×7 in-stage line
  * combos per order before the filter. The PRIOR spelling lifted
  * `y.ln = x.ln + 1` into the hash keys — no per-order fanout, but
  * the two exchanges hash different expressions, so lineitem is
  * scanned and shuffled TWICE (the at-scale cost the respell
  * removed; measured on q124's family as −27% task time).
  *
  * This probe measures both spellings through every registered
  * consumer (q81 PageRank, q122 triangles, q126 k-core, q146
  * TrustRank, q148 label propagation) in ONE session with
  * interleaved reps (A,B,A,B,…) so host drift hits both sides
  * equally, at any scale dir — the 10× ScaleSweep corpus gives the
  * at-scale point. Emits one PROBE_JSON line with per-consumer
  * min-of-reps for each spelling.
  */
object EdgeSpellProbe {

  /** The pre-respell spelling: +1 lifted into the equi-join keys. */
  private def pairsKeyed(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    li.as("x")
      .join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("y.l_linenumber") === col("x.l_linenumber") + 1)
      .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
  }

  private def undirected(pairs: DataFrame): DataFrame =
    pairs.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  private def weighted(pairs: DataFrame): DataFrame =
    pairs.groupBy("src", "dst").agg(count(lit(1)).as("w"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-edge-spell-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)", "count(distinct id % 7)")
      .collect()

    val spellings: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "okey_alias" -> ((s, d) => Triangles.adjacentPartPairs(s, d)),
      "keyed_ln" -> ((s, d) => pairsKeyed(s, d)))
    // each consumer body mirrors its registered query minus the final
    // orderBy (bench measures count(), same as graft.Bench)
    val consumers: Seq[(String, DataFrame => DataFrame)] = Seq(
      "q81_pagerank" -> (p => PageRank.pageRank(weighted(p))),
      "q122_triangles" -> (p => Triangles.triangleStats(undirected(p))),
      "q126_kcore" -> { p =>
        val e = undirected(p).localCheckpoint()
        KCore.kCore(e, KCore.adaptiveK(e))
      },
      "q146_trustrank" -> (p => PageRank.trustRank(weighted(p))),
      "q148_label_propagation" ->
        (p => Communities.labelPropagation(weighted(p))))

    def f(x: Double): String = String.format(java.util.Locale.ROOT,
      "%.4f", java.lang.Double.valueOf(x))
    def load1(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").head
      catch { case _: Throwable => "null" }

    val walls = scala.collection.mutable.Map[(String, String),
      Vector[Double]]().withDefaultValue(Vector.empty)
    // q126's consumer localCheckpoints a fresh edge table every run;
    // without a reclaim the checkpoint blocks accumulate across reps
    // × 2 spellings and pressure storage memory, skewing late
    // interleaved reps (r14 ADVICE). Unpersist whatever RDDs a run
    // newly marked persistent once its count() completes.
    def runOnce(mk: (SparkSession, String) => DataFrame,
        body: DataFrame => DataFrame): Double = {
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      body(mk(spark, sfDir)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = false)
      }
      sec
    }
    // one untimed warmup of each (consumer, spelling) so codegen /
    // scan caches are paid before the interleaved measured reps
    for ((cname, body) <- consumers; (sname, mk) <- spellings) {
      runOnce(mk, body)
      ()
    }
    for (_ <- 1 to reps; (cname, body) <- consumers;
         (sname, mk) <- spellings) {
      val sec = runOnce(mk, body)
      walls((cname, sname)) = walls((cname, sname)) :+ sec
    }
    val loadEnd = load1()
    val body = consumers.map { case (cname, _) =>
      val cells = spellings.map { case (sname, _) =>
        val ts = walls((cname, sname))
        s""""$sname":{"min":${f(ts.min)},"reps":[${ts.map(f).mkString(",")}]}"""
      }.mkString(",")
      s""""$cname":{$cells}"""
    }.mkString(",")
    println(s"""PROBE_JSON {"probe":"edge_spell_family","dir":"$sfDir",""" +
      s""""reps":$reps,"load1_end":$loadEnd,$body}""")
    spark.stop()
  }
}
