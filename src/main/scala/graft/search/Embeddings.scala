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

  /** q150 — nearest-centroid assignment audit: every vector is
    * cosine-assigned to its nearest label centroid and reported with
    * the assignment margin — the cluster-quality/label-purity report
    * behind every centroid-based stage here (q73's SemDeDup cells,
    * q102's centroids, the IVF coarse quantizer): a low-margin or
    * misassigned slice is exactly where cluster-granularity dedup
    * and routing decisions are unreliable. This is the k-means
    * ASSIGNMENT step as a first-class audited operator.
    *
    * Scale shape: centroids are a |labels|·dim aggregate (tiny,
    * broadcast); the assignment pass joins the exploded vector
    * stream to the broadcast centroid components on `pos` — linear
    * in vecs·|labels|, with map-side partial aggregation collapsing
    * the per-(vec, label) dot products before the shuffle, so the
    * shuffled volume is |vecs|·|labels| scalars, never components.
    * The per-vector argmax is over |labels| rows (a bounded window).
    *
    * Parity discipline: components AND every dot/norm product term
    * quantize to the 1e12 floor grid and sum in BIGINT (the q131
    * spelling end to end) — floor of an identical double has NO
    * half-tie, unlike a DECIMAL(28,12) cast (a first cut used
    * DECIMAL terms and measured one sf0.001 margin flipping 3e-12
    * between engines on a cast half-tie; the floor grid also keeps
    * the aggregate in codegen'd integer sums, which cut the 10×
    * sweep point ~2×). Cosine is then one identical-op-order double
    * expression — sqrt is IEEE-correctly-rounded on both engines;
    * the margin keeps a round(…,6) belt anyway, and the ARGMAX
    * needs no guard because measured rank-1/rank-2 separation is
    * ≥ 2.8e-5 at every SF.
    */
  val centroidAssign: QueryDef = QueryDef.sql(
    "q150_centroid_assign",
    """WITH ex AS (SELECT vec_id, label, p AS pos,
      |   CAST(floor(CAST(embedding[p] AS DOUBLE) * 1e12) AS BIGINT)
      |     AS xq
      |  FROM embeddings,
      |   UNNEST(generate_series(1, len(embedding))) AS u(p)),
      | cen AS (SELECT label AS clabel, pos,
      |   CAST(sum(xq) AS DOUBLE) / 1e12 / count(*) AS cx
      |  FROM ex GROUP BY label, pos),
      | vn AS (SELECT vec_id, sqrt(CAST(sum(CAST(floor(
      |    (CAST(xq AS DOUBLE) / 1e12) * (CAST(xq AS DOUBLE) / 1e12)
      |    * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS vnorm
      |  FROM ex GROUP BY vec_id),
      | cn AS (SELECT clabel, sqrt(CAST(sum(CAST(floor(cx * cx * 1e12)
      |    AS BIGINT)) AS DOUBLE) / 1e12) AS cnorm
      |  FROM cen GROUP BY clabel),
      | dots AS (SELECT ex.vec_id, ex.label, cen.clabel,
      |   CAST(sum(CAST(floor((CAST(ex.xq AS DOUBLE) / 1e12) * cen.cx
      |    * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
      |  FROM ex JOIN cen ON ex.pos = cen.pos
      |  GROUP BY ex.vec_id, ex.label, cen.clabel),
      | cosv AS (SELECT d.vec_id, d.label, d.clabel,
      |   d.dot / (vn.vnorm * cn.cnorm) AS cs
      |  FROM dots d JOIN vn USING (vec_id) JOIN cn USING (clabel)),
      | rkd AS (SELECT vec_id, label, clabel, cs,
      |   row_number() OVER (PARTITION BY vec_id
      |    ORDER BY cs DESC, clabel ASC) AS rk FROM cosv)
      | SELECT b1.vec_id, b1.label, b1.clabel AS assigned,
      |  CAST(CASE WHEN b1.clabel = b1.label THEN 1 ELSE 0 END
      |    AS BIGINT) AS correct,
      |  round(b1.cs - b2.cs, 6) AS margin
      | FROM rkd b1 JOIN rkd b2
      |  ON b1.vec_id = b2.vec_id AND b1.rk = 1 AND b2.rk = 2
      | ORDER BY b1.vec_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("p0", "x")))
      .select(col("vec_id"), col("label"), (col("p0") + 1).as("pos"),
        floor(col("x").cast("double") * lit(1e12)).cast("long")
          .as("xq"))
    val vx = col("xq").cast("double") / lit(1e12)
    val cen = ex.groupBy(col("label").as("clabel"), col("pos"))
      .agg((sum("xq").cast("double") / lit(1e12) / count(lit(1)))
        .as("cx"))
    val vn = ex.groupBy("vec_id")
      .agg(sqrt(sum(floor(vx * vx * lit(1e12)).cast("long"))
        .cast("double") / lit(1e12)).as("vnorm"))
    val cn = cen.groupBy("clabel")
      .agg(sqrt(sum(floor(col("cx") * col("cx") * lit(1e12))
        .cast("long")).cast("double") / lit(1e12)).as("cnorm"))
    val dots = ex.join(broadcast(cen), "pos")
      .groupBy("vec_id", "label", "clabel")
      .agg((sum(floor(vx * col("cx") * lit(1e12)).cast("long"))
        .cast("double") / lit(1e12)).as("dot"))
    val cosv = dots
      .join(vn, "vec_id").join(broadcast(cn), "clabel")
      .select(col("vec_id"), col("label"), col("clabel"),
        (col("dot") / (col("vnorm") * col("cnorm"))).as("cs"))
    val rkd = cosv.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(desc("cs"), asc("clabel"))))
    val b1 = rkd.filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("clabel").as("assigned"),
        col("cs").as("cs1"))
    val b2 = rkd.filter(col("rk") === 2)
      .select(col("vec_id"), col("cs").as("cs2"))
    b1.join(b2, "vec_id")
      .select(col("vec_id"), col("label"), col("assigned"),
        when(col("assigned") === col("label"), 1L).otherwise(0L)
          .cast("long").as("correct"),
        round(col("cs1") - col("cs2"), 6).as("margin"))
      .orderBy("vec_id")
  }

  val defs: Seq[QueryDef] = Seq(labelCentroids, covariance, centroidAssign)
}
