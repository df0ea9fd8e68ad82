package graft.graph

import graft.QueryDef
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous weighted label propagation (Raghavan, Albert & Kumara
  * 2007) — community detection over the co-purchase graph, the
  * clustering pass a curation stack runs on its link/domain graph to
  * find content farms and topical clusters (the community analog of
  * [[PageRank]]'s authority score and [[KCore]]'s density score). The
  * reference engine has no graph operators; this is a pure extension.
  *
  * Semantics (fixed [[Rounds]] synchronous rounds, fully
  * deterministic): labels start as the node id; each round every node
  * adopts the neighbor label with the greatest incident edge weight,
  * ties broken by the smaller label. Unlike hash-min connected
  * components (the [[graft.dedup.Dedup]] CC used for dedup clusters),
  * the weighted argmax lets strongly-linked groups keep distinct
  * communities inside one connected component — LPA partitions a
  * component, CC cannot.
  *
  * Scale shape — each round is the PageRank round shape: one equi
  * join (labels onto edge sources, shuffle on node key) + one hash
  * aggregate ((node, label) weight sums, map-side partials) + one
  * per-node top-1 spelled as a second hash aggregate (lexicographic
  * max over (weight, -label)), so no stage ever sorts the
  * (node, label) stream. All arithmetic is exact
  * integers (bigint weight sums, integer labels) — no float parity
  * concerns anywhere, so the unrolled oracle matches bit-for-bit.
  * `localCheckpoint` truncates the per-round lineage (the iterative
  * hygiene every loop here uses; on a cluster: checkpoint/table
  * rotation).
  */
object Communities {

  val Rounds = 3

  /** Propagate labels over undirected `edges` (src, dst, w) for
    * `rounds` synchronous rounds; returns (node, community).
    */
  def labelPropagation(edges: DataFrame, rounds: Int = Rounds)
      : DataFrame = {
    val e0 = edges.localCheckpoint()
    // undirected view: each edge contributes both directions; a pair
    // present in both input directions just sums its weights.
    // Repartitioned by src and CACHED, not checkpointed: the
    // per-round join hashes on src, and an InMemoryRelation preserves
    // its child's HashPartitioning(src) so every round consumes the
    // edge table IN PLACE — a localCheckpoint here reports
    // UnknownPartitioning under AQE (measured: the 10× stage probe
    // showed the full edge table re-exchanged every round), which
    // would put the one big table back on the wire three times. The
    // big table must sit still while the small label table moves.
    // Self-loops are dropped BEFORE the direction union: Raghavan et
    // al.'s update is neighbor-only, and a surviving (a,a,w) would
    // appear in both direction selects, sum to 2w, and let a node
    // vote for its own current label with doubled weight each round —
    // damping community takeover (r9 ADVICE).
    val und = e0.select(col("src"), col("dst"), col("w"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(sum("w").cast("long").as("w"))
      // partition count pinned (r19, the q127 lesson): an unpinned
      // repartition(col) lets AQE size this exchange by BYTES, and
      // the edge table is small next to the per-round probe work it
      // fans out — the cached table's partition count IS the rounds'
      // parallelism ceiling.
      .repartition(e0.sparkSession.sparkContext.defaultParallelism,
        col("src"))
      .persist()
    var lab = und.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    // One lineage cut AFTER the loop, not per round (r19): lab_{k+1}
    // references lab_k exactly once, so the plan grows linearly and
    // the default 3 rounds run as ONE job instead of 3 serial
    // materialization barriers; long custom runs get a hygiene cut
    // every 8 rounds. The final checkpoint stays EAGER so the edge
    // cache is materialized into the result before it is dropped.
    for (r <- 1 to rounds) {
      lab = propagateOnce(und, lab)
      if (r % 8 == 0 && r < rounds) lab = lab.localCheckpoint()
    }
    lab = lab.localCheckpoint()
    und.unpersist(false)
    lab.select(col("node"), col("label").as("community"))
  }

  /** One synchronous LPA round (pre-checkpoint — PlanSpec audits
    * this plan directly, which the post-checkpoint RDD scan would
    * hide): top-1 as a hash aggregate, not a sort window —
    * lexicographic max over (s, -cand) picks the heaviest label with
    * ties to the SMALLER label, deterministic, map-side-partial-able,
    * and never sorts the (node, label) stream.
    */
  private[graft] def propagateOnce(und: DataFrame, lab: DataFrame)
      : DataFrame = {
    und.join(lab, und("src") === lab("node"))
      .select(und("dst").as("node"), lab("label").as("cand"), und("w"))
      .groupBy("node", "cand").agg(sum("w").cast("long").as("s"))
      .groupBy("node")
      .agg(max(struct(col("s"), (-col("cand")).as("nc"))).as("m"))
      .select(col("node"), (-col("m.nc")).as("label"))
  }

  /** q148 — weighted LPA communities on the q81 co-purchase graph
    * (adjacent parts of the same order, weighted by co-occurrence
    * count). The oracle unrolls the three rounds as chained CTEs —
    * same integer math, declarative spelling.
    */
  val labelPropagationQ: QueryDef = {
    def round(i: Int): String = {
      val p = i - 1
      s""" g$i AS (SELECT e.dst AS node, l$p.label AS cand,
         |  CAST(sum(e.w) AS BIGINT) AS s
         | FROM e JOIN l$p ON e.src = l$p.node
         | GROUP BY e.dst, l$p.label),
         | l$i AS (SELECT node, cand AS label FROM (
         |  SELECT node, cand, row_number() OVER (PARTITION BY node
         |   ORDER BY s DESC, cand ASC) AS rk FROM g$i)
         |  WHERE rk = 1)""".stripMargin
    }
    QueryDef.sql(
      "q148_label_propagation",
      (s"""WITH d0 AS (SELECT l1.l_partkey AS src, l2.l_partkey AS dst,
          |  count(*) AS w
          | FROM lineitem l1 JOIN lineitem l2
          |  ON l1.l_orderkey = l2.l_orderkey
          |  AND l2.l_linenumber = l1.l_linenumber + 1
          | GROUP BY l1.l_partkey, l2.l_partkey),
          | e AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
          |  SELECT src, dst, w FROM d0
          |  UNION ALL SELECT dst AS src, src AS dst, w FROM d0)
          |  WHERE src <> dst GROUP BY src, dst),
          | l0 AS (SELECT src AS node, src AS label FROM e GROUP BY src),"""
        + round(1) + "," + round(2) + "," + round(3) +
        " SELECT node, label AS community FROM l3 ORDER BY node")
        .stripMargin.replaceAll("\n", "")
    ) { (s, d) =>
      val edges = Triangles.cachedWeightedEdges(s, d)
      labelPropagation(edges).orderBy("node")
    }
  }

  val defs: Seq[QueryDef] = Seq(labelPropagationQ)
}
