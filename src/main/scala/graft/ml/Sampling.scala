package graft.ml

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data sampling for the recommender: deterministic negative
  * sampling — K unseen items per user, reproducibly pseudo-random —
  * the label-0 side every implicit-feedback trainer needs next to the
  * positives the reference trains ALS on (`ALSTrainer.scala:41-43`
  * splits positives only; negatives are the standard extension for
  * ranking losses).
  */
object Sampling {

  /** K=4 deterministic negatives per user.
    *
    * The naive spelling is the reference's J1 shape — a user×catalog
    * cartesian (`OfflineRecommender.scala:71`) minus positives — which
    * is O(|U|·|P|) rows before anything filters. The scale rewrite
    * here blocks the catalog into 16 md5 buckets and equi-joins users
    * to ONE bucket (hash of the user id), so each user scores
    * |P|/16 candidates through a plain hash join — no cartesian at
    * any catalog size, and the bucket count is the knob that holds
    * the per-user candidate pool constant as the catalog grows.
    * Within the pool: anti-join the positives, rank by
    * md5(user:item) (reproducible across engines and runs — the q54
    * discipline), keep K as a WindowGroupLimit.
    *
    * A user who rated their whole bucket yields < K negatives — both
    * engines, by construction; at real catalog sizes the pool dwarfs
    * any user's history.
    */
  val negativeSample: QueryDef = QueryDef.sql(
    "q92_negative_sample",
    """WITH rated AS (SELECT DISTINCT CAST(user_id AS INT) AS u,
      |   CAST(event_id % 200 AS INT) AS p FROM events),
      | users AS (SELECT u, substring(md5(CAST(u AS VARCHAR)), 1, 1) AS b
      |   FROM (SELECT DISTINCT u FROM rated)),
      | prods AS (SELECT CAST(x AS INT) AS p,
      |   substring(md5(CAST(x AS VARCHAR)), 1, 1) AS b
      |   FROM (SELECT unnest(range(0, 200)) AS x)),
      | cand AS (SELECT u, p FROM users JOIN prods USING (b)),
      | neg AS (SELECT u, p FROM cand c WHERE NOT EXISTS
      |   (SELECT 1 FROM rated r WHERE r.u = c.u AND r.p = c.p)),
      | rk AS (SELECT u, p, row_number() OVER (PARTITION BY u
      |   ORDER BY md5(CAST(u AS VARCHAR) || ':' || CAST(p AS VARCHAR)), p)
      |   AS rk FROM neg)
      | SELECT u AS user_id, p AS product_id, CAST(rk AS BIGINT) AS rk
      | FROM rk WHERE rk <= 4 ORDER BY user_id, rk""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val rated = Tables.events(s, d)
      .select(col("user_id").cast("int").as("u"),
        (col("event_id") % 200).cast("int").as("p"))
      .distinct()
    val users = rated.select("u").distinct()
      .withColumn("b", substring(md5(col("u").cast("string")), 1, 1))
    val prods = s.range(200).select(col("id").cast("int").as("p"))
      .withColumn("b", substring(md5(col("p").cast("string")), 1, 1))
    val cand = users.join(broadcast(prods), "b").select("u", "p")
    val w = Window.partitionBy("u")
      .orderBy(md5(concat_ws(":", col("u"), col("p"))), col("p"))
    cand.join(rated, Seq("u", "p"), "left_anti")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 4)
      .select(col("u").as("user_id"), col("p").as("product_id"),
        col("rk").cast("long").as("rk"))
      .orderBy("user_id", "rk")
  }

  val defs: Seq[QueryDef] = Seq(negativeSample)
}
