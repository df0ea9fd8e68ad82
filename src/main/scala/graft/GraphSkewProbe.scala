package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-adversarial graph probe: a hub-and-ring graph (one hub node
  * adjacent to every spoke; spokes also form a cycle) is the worst
  * degree distribution a wedge enumerator can meet — a naive
  * (non-oriented) triangle count would emit C(n, 2) ≈ n²/2 wedges at
  * the hub. The degree-ordered orientation (q122) bounds wedge work
  * at O(n): spokes have degree 3, so every edge orients away from a
  * ≤3-out-degree node and the hub's out-degree is 0.
  *
  * The graph also has EXACT known answers — n triangles
  * (hub, spoke i, spoke i+1), hub in all n, each spoke in 2 — so the
  * probe checks correctness under skew, not just wall time.
  * GraphSpec pins the same invariants at small n; this main is the
  * sweep-scale point (default n = 10⁶):
  *
  *   sbt "runMain graft.GraphSkewProbe 1000000"
  */
object GraphSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-graph-skew-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(String.format(java.util.Locale.ROOT,
        "SKEWPROBE %-10s n=%d  %.2fs", name, Int.box(n),
        Double.box((System.nanoTime() - t0) / 1e9)))
      r
    }
    // hub = node 0; spokes 1..n; ring (i, i+1) + closing edge (1, n).
    // Canonical a < b throughout.
    val spokes = spark.range(1L, n + 1L).select(col("id").as("b"))
      .withColumn("a", lit(0L)).select("a", "b")
    val ring = spark.range(1L, n.toLong)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
      .union(spark.range(1L, 2L).select(col("id").as("a"),
        lit(n.toLong).as("b")))
    val edges = spokes.union(ring).localCheckpoint()
    val tri = t("triangles") {
      val r = graph.Triangles.triangleStats(edges).cache()
      val hubT = r.filter(col("node") === 0)
        .select("tri_cnt").head().getLong(0)
      val spokeBad = r.filter(col("node") =!= 0 &&
        col("tri_cnt") =!= 2).count()
      println(s"SKEWPROBE triangles hub=$hubT (expect $n) " +
        s"spoke_violations=$spokeBad (expect 0)")
      r.unpersist()
      (hubT, spokeBad)
    }
    assert(tri._1 == n && tri._2 == 0, "triangle counts wrong under skew")
    t("kcore3") {
      // spokes have degree 3 -> the whole graph IS a 3-core (no
      // peel rounds); k=4 peels the ring in one cascade
      val core = graph.KCore.kCore(edges, 3,
        verbose = sys.env.get("SPARK_GRAFT_KCORE_VERBOSE").contains("1"))
      val m = core.count()
      println(s"SKEWPROBE kcore3 members=$m (expect ${n + 1})")
      assert(m == n + 1, s"3-core lost members: $m")
    }
    t("pagerank") {
      // undirected -> both directions, unit weights
      val directed = edges
        .select(col("a").as("src"), col("b").as("dst"), lit(1L).as("w"))
        .union(edges.select(col("b").as("src"), col("a").as("dst"),
          lit(1L).as("w")))
      val pr = graph.PageRank.pageRank(directed, iters = 3)
      val top = pr.orderBy(desc("rank")).select("node").head().getLong(0)
      println(s"SKEWPROBE pagerank top=$top (expect hub 0)")
      assert(top == 0L, "hub is not the top-ranked node")
    }
    spark.stop()
  }
}
