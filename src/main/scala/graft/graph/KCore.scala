package graft.graph

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction by iterative peeling (Batagelj & Zaveršnik
  * 2003; distributed formulation à la Montresor et al. 2011): delete
  * every node with degree < k, recompute degrees, repeat to
  * fixpoint. The surviving subgraph is the unique maximal subgraph
  * with minimum degree ≥ k — the standard dense-community screen
  * (link-farm detection on crawl graphs, spam-ring pruning before
  * PageRank admission — q81's natural companion).
  *
  * Scale shape: each round is one degree aggregate plus two
  * anti joins, all shuffling on the node key; the edge set only
  * shrinks. Per-round `localCheckpoint` truncates the iterative
  * lineage (the [[graft.dedup.Dedup]] CC lesson) and the only
  * driver-side value is the scalar converged-yet count — the
  * same control-decision pattern the CC fixpoint uses. Round count
  * is bounded by the graph's degeneracy ordering depth — tens of
  * rounds on real skewed graphs — with `maxIter` as the documented
  * backstop.
  */
object KCore {

  /** Nodes of the k-core of canonical edges (a, b), with each node's
    * degree INSIDE the core subgraph. Output: (node, core_deg).
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 50,
      verbose: Boolean = false): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    // No up-front checkpoint: the caller hands a (checkpointed) edge
    // set, and the first round's anti-join output is the first
    // materialization — the old initial localCheckpoint duplicated
    // the full edge set once per call (measured ~11 s at the 30×
    // sweep point before any peeling started).
    var e = edges.select("a", "b")
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val t0 = System.nanoTime()
      val weak = degrees(e).filter(col("deg") < k).select("node")
        .localCheckpoint()
      if (weak.isEmpty) converged = true
      else e = e
        .join(weak.select(col("node").as("a")), Seq("a"), "left_anti")
        .join(weak.select(col("node").as("b")), Seq("b"), "left_anti")
        .localCheckpoint()
      val wall = (System.nanoTime() - t0) / 1e9
      if (verbose) {
        // count jobs are instrumentation-only and OUTSIDE the wall
        // (the default path's sole driver scalar stays isEmpty)
        println(String.format(java.util.Locale.ROOT,
          "KCORE round=%d weak=%d edges=%d wall=%.2fs",
          Int.box(iter), Long.box(weak.count()), Long.box(e.count()),
          Double.box(wall)))
      }
      iter += 1
    }
    degrees(e).select(col("node"), col("deg").as("core_deg"))
  }

  /** The query's k, derived from the graph itself: HALF the mean
    * degree, floored at 3. The co-purchase graph densifies with
    * scale (mean degree ~5 at sf0.001, ~29 at sf0.01), so any FIXED
    * k either peels nothing or everything depending on sf. The
    * fraction matters: on near-random graphs the k-core collapses
    * entirely once k exceeds roughly c − √(c·log c) for mean degree
    * c (the peel cascades — measured here: the ¾·c-core is EMPTY at
    * every sf), while c/2 sits safely below the threshold and still
    * peels the sparse periphery. Two driver-side scalars (|E|, |V|)
    * — a control decision, same pattern as `Scale.exactOk`.
    */
  def adaptiveK(edges: DataFrame): Int = {
    val m = edges.count().toDouble
    val n = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node"))).distinct().count()
      .toDouble
    math.max(3, math.ceil(m / math.max(n, 1.0)).toInt)
  }

  /** How many peel rounds the DuckDB oracle unrolls. The peel is a
    * monotone-shrinking fixpoint, which ANSI recursive CTEs can't
    * express directly (the recursive term may not aggregate over
    * itself), but round count is the graph's degeneracy-ordering
    * depth — measured CONSTANT (weak set empty by round 2) at
    * sf0.001/sf0.01/sf0.1 and at the 10×/30× sweep points — so a
    * fixed-depth unrolling IS the exact semantics here, with
    * headroom: 6 unrolled rounds vs 3 observed. If a future corpus
    * ever needed more, the Spark side (which iterates to the true
    * fixpoint) would hash-mismatch this oracle loudly rather than
    * silently agree.
    */
  val OracleRounds = 6

  /** The unrolled peel as DuckDB SQL: q122's edge CTE, the adaptive
    * k = max(3, ceil(m/n)) as a scalar CTE, then [[OracleRounds]]
    * rounds of weak-node removal, ending in the surviving subgraph's
    * degree table. Every round CTE is MATERIALIZED: each eₙ is
    * referenced three times (next round's FROM plus both NOT IN
    * subqueries of wₙ), so DuckDB's default per-reference inlining
    * would expand the plan 3^rounds-fold — the probe that found this
    * died on file handles before it died on time.
    */
  private[graph] def peelOracleSql: String = {
    val head =
      """WITH p AS (SELECT l1.l_partkey AS pa, l2.l_partkey AS pb
        | FROM lineitem l1 JOIN lineitem l2
        |  ON l1.l_orderkey = l2.l_orderkey
        |  AND l2.l_linenumber = l1.l_linenumber + 1),
        | e0 AS MATERIALIZED (SELECT DISTINCT least(pa, pb) AS a,
        |  greatest(pa, pb) AS b FROM p WHERE pa <> pb),
        | kk AS MATERIALIZED (SELECT greatest(3, CAST(ceil(
        |   CAST((SELECT count(*) FROM e0) AS DOUBLE) /
        |   greatest((SELECT count(*) FROM (SELECT DISTINCT a AS node
        |     FROM e0 UNION SELECT b FROM e0)), 1)) AS INT)) AS k)"""
        .stripMargin
    val rounds = (0 until OracleRounds).map { i =>
      s""", w$i AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e$i
         |  UNION ALL SELECT b FROM e$i) GROUP BY node
         |  HAVING count(*) < (SELECT k FROM kk))
         |, e${i + 1} AS MATERIALIZED (SELECT a, b FROM e$i
         |  WHERE a NOT IN (SELECT node FROM w$i)
         |   AND b NOT IN (SELECT node FROM w$i))""".stripMargin
    }.mkString
    val tail =
      s""" SELECT node, count(*) AS core_deg
         | FROM (SELECT a AS node FROM e$OracleRounds
         |  UNION ALL SELECT b FROM e$OracleRounds)
         | GROUP BY node ORDER BY node""".stripMargin
    (head + rounds + tail).replaceAll("\n", "")
  }

  /** q126 — the (mean-degree/2)-core of the co-purchase graph
    * (q81/q122's edge derivation). Oracle-checked via the unrolled
    * peel ([[peelOracleSql]] — exact at the measured constant round
    * depth); the gate additionally measures the defining property on
    * the output — zero member nodes with induced degree < k — and
    * GraphSpec pins exact parity (membership AND maximality) against
    * a local reference peeler on seeded random graphs.
    */
  val kCoreQ: QueryDef = QueryDef.sql("q126_kcore", peelOracleSql) { (s, d) =>
    val edges = Triangles.cachedUndirectedEdges(s, d)
    // SPARK_GRAFT_KCORE_VERBOSE=1 prints per-round weak/edge counts
    // and wall — the sweep's round-count instrumentation
    kCore(edges, adaptiveK(edges),
      verbose = sys.env.get("SPARK_GRAFT_KCORE_VERBOSE").contains("1"))
      .orderBy("node")
  }

  val defs: Seq[QueryDef] = Seq(kCoreQ)
}
