package graft.search

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column analytics beyond nearest-neighbor search:
  * per-group centroids — the building block for cluster profiling,
  * SemDeDup-style group summaries (q73 computes its own centroids
  * inline), and embedding-drift monitoring between corpus drops.
  */
object Embeddings {

  /** Per-(label, dimension) centroid over the `embeddings` table.
    *
    * Scale shape: posexplode is a narrow per-row expand (dim ×
    * rows of three scalars); the aggregate is one hash shuffle on
    * (label, pos) with map-side partials, so the full vectors never
    * shuffle. Float discipline: each component goes exact-double →
    * DECIMAL(28,12) so the sum is partition-order-independent, and
    * the mean rounds at 4 decimals (the q89 discipline).
    */
  val labelCentroids: QueryDef = QueryDef.sql(
    "q102_label_centroids",
    """WITH e AS (SELECT label, p AS pos,
      |   CAST(CAST(embedding[p] AS DOUBLE) AS DECIMAL(28,12)) AS xd
      |   FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(p))
      | SELECT label, pos,
      |   round(CAST(sum(xd) AS DOUBLE) / count(*), 4) AS centroid,
      |   count(*) AS n_vecs
      | FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    centroidsBy(Tables.embeddings(s, d), "label").orderBy("label", "pos")
  }

  /** Library entry behind q102: per-(group, dimension) centroid
    * components for any frame with a float-array `embedding` column.
    * Emits (group, pos, centroid, n_vecs); `pos` is 1-based.
    */
  def centroidsBy(embeddings: DataFrame, groupCol: String): DataFrame =
    embeddings
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("p0", "x")))
      .select(col(groupCol), (col("p0") + 1).as("pos"),
        col("x").cast("double").cast("decimal(28,12)").as("xd"))
      .groupBy(groupCol, "pos")
      .agg(round(sum("xd").cast("double") / count(lit(1)), 4).as("centroid"),
        count(lit(1)).as("n_vecs"))

  val defs: Seq[QueryDef] = Seq(labelCentroids)
}
