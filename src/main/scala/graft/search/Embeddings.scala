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

  /** q131 — the exact covariance matrix of the embedding columns:
    * the sufficient statistic for PCA / whitening / drift detection
    * (the 64×64 eigendecomposition is a driver-side O(dim³)
    * footnote; the DATA pass is the distributed part). One
    * self-join on vec_id expands each vector to its i ≤ j component
    * pairs — a narrow 64²/2-per-row expand of three scalars, never
    * the vectors themselves — and one hash aggregate with map-side
    * partials reduces to 2,080 cells. Shuffle = cells, not rows.
    *
    * Parity discipline (the q81 PageRank floor-grid): float×float
    * products are exact doubles; each product and each component is
    * quantized as floor(x·1e12) and summed in BIGINT — exact and
    * order-independent on both engines — and the covariance formula
    * is spelled with the identical operation order so IEEE evaluates
    * it bit-identically.
    */
  val covariance: QueryDef = QueryDef.sql(
    "q131_covariance",
    """WITH x AS (SELECT vec_id, p AS i,
      |   CAST(embedding[p] AS DOUBLE) AS xi
      |  FROM embeddings,
      |   UNNEST(generate_series(1, len(embedding))) AS u(p)),
      | pr AS (SELECT a.i AS i, b.i AS j,
      |   CAST(sum(CAST(floor(a.xi * b.xi * 1e12) AS BIGINT))
      |     AS BIGINT) AS q,
      |   count(*) AS n
      |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
      |  GROUP BY a.i, b.i),
      | m AS (SELECT i, CAST(sum(CAST(floor(xi * 1e12) AS BIGINT))
      |   AS BIGINT) AS sq FROM x GROUP BY i)
      | SELECT pr.i, pr.j,
      |  (CAST(pr.q AS DOUBLE) / 1e12
      |   - (CAST(ma.sq AS DOUBLE) / 1e12)
      |     * (CAST(mb.sq AS DOUBLE) / 1e12) / pr.n) / pr.n AS cov
      | FROM pr JOIN m ma ON ma.i = pr.i JOIN m mb ON mb.i = pr.j
      | ORDER BY pr.i, pr.j""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val x = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("xi"))
    val pr = x.select(col("vec_id"), col("i"), col("xi"))
      .join(x.select(col("vec_id"), col("i").as("j"),
        col("xi").as("xj")), "vec_id")
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(floor(col("xi") * col("xj") * lit(1e12))).as("q"),
        count(lit(1)).as("n"))
    val m = x.groupBy("i")
      .agg(sum(floor(col("xi") * lit(1e12))).as("sq"))
    pr
      .join(broadcast(m.select(col("i"), col("sq").as("sqa"))), "i")
      .join(broadcast(m.select(col("i").as("j"), col("sq").as("sqb"))),
        "j")
      .select(col("i"), col("j"),
        ((col("q").cast("double") / lit(1e12)
          - (col("sqa").cast("double") / lit(1e12))
            * (col("sqb").cast("double") / lit(1e12)) / col("n"))
          / col("n")).as("cov"))
      .orderBy("i", "j")
  }

  val defs: Seq[QueryDef] = Seq(labelCentroids, covariance)
}
