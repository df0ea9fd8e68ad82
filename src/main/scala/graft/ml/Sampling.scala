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

  /** q107 — temperature-based corpus resampling (α = 1/2): draw a
    * half-size corpus where source s contributes ∝ n_s^α, the
    * standard rebalancing that upweights rare sources against
    * head-heavy crawls (the α-sampling of multilingual LM training —
    * Conneau & Lample 2019 §3.1, mT5's α=0.3..0.7 sweeps). Selection
    * is deterministic md5 order (the q54/q69 discipline), so the
    * sample is reproducible and hash-gated end to end.
    *
    * Float discipline: n^α at α=1/2 is `sqrt` — IEEE-correctly-
    * rounded in BOTH engines (unlike `pow`, which carries no such
    * guarantee) — quantized to an integer 1e9 grid (the q81 trick);
    * every step after that (share products, floor-division caps) is
    * exact BIGINT arithmetic, so cap boundaries cannot flip between
    * engines. Scale shape: caps derive from a source-cardinality
    * aggregate (tiny, broadcast); ranking reuses q69's two-phase
    * bucket prefix sum — 256 md5 buckets rank in parallel and only
    * the (source, bucket) offset table rides a window — so no
    * per-source reducer sees a whole source's rows.
    */
  val temperatureSample: QueryDef = QueryDef.sql(
    "q107_temperature_sample",
    """WITH c AS (SELECT source, count(*) AS n FROM documents
      |   GROUP BY source),
      | q AS (SELECT source, n,
      |   CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1e9) AS BIGINT) AS q
      |   FROM c),
      | t AS (SELECT CAST(sum(q) AS BIGINT) AS qsum,
      |   CAST(sum(n) AS BIGINT) AS total FROM q),
      | caps AS (SELECT source,
      |   least(CAST(total AS HUGEINT) // 2 * q // qsum, n) AS cap FROM q, t),
      | r AS (SELECT doc_id, source, row_number() OVER (
      |   PARTITION BY source
      |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      | SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk
      | FROM r JOIN caps USING (source) WHERE rk <= cap
      | ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
    val q = counts.withColumn("q",
      floor(sqrt(col("n").cast("double")) * lit(1e9)).cast("long"))
    val t = q.agg(sum("q").cast("long").as("qsum"),
      sum("n").cast("long").as("total"))
    val caps = q.crossJoin(broadcast(t))
      .select(col("source"),
        // 128-bit intermediate: (total/2)*q peaks at ~0.5·n^1.5·1e9,
        // past 2^63 once the corpus exceeds ~7M docs. DECIMAL(38,0)
        // (Spark) / HUGEINT (oracle) keep the product exact to 1e38;
        // `div` truncates back to BIGINT, which the cap always fits.
        least(expr("CAST(total div 2 AS DECIMAL(38,0)) * q div qsum"),
          col("n")).as("cap"))
    val hashed = docs
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bkt", substring(col("h"), 1, 2))
    val wIntra = Window.partitionBy("source", "bkt")
      .orderBy(col("h"), col("doc_id"))
    val intra = hashed.withColumn("irk", row_number().over(wIntra))
    val wOff = Window.partitionBy("source").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hashed.groupBy("source", "bkt").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum("bn").over(wOff), lit(0L)))
      .select("source", "bkt", "off")
    intra.join(broadcast(offs), Seq("source", "bkt"))
      .withColumn("rk", col("off") + col("irk"))
      .join(broadcast(caps), "source")
      .filter(col("rk") <= col("cap"))
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy("doc_id")
  }

  /** q108 — uniform per-language k=10 document sample via the
    * [[graft.functions.BottomKAgg]] bounded aggregate: priority =
    * md5(doc_id), keep the k smallest. One hash-agg with map-side
    * partials — ≤k entries per (partition, group) cross the shuffle,
    * where the q54 window spelling shuffles every row of every group.
    * Deterministic priorities make a custom imperative aggregate
    * fully DuckDB-oracle-able (the q88 trick): the oracle is the
    * equivalent rank window, hash-matched.
    */
  val reservoirSample: QueryDef = QueryDef.sql(
    "q108_reservoir_sample",
    """WITH r AS (SELECT lang, doc_id, row_number() OVER (
      |   PARTITION BY lang
      |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      | SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id
      | FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    import graft.functions.BottomKAgg.bottom_k_agg
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(bottom_k_agg(md5(col("doc_id").cast("string")), col("doc_id"), 10)
        .as("sample"))
      .select(col("lang"), posexplode(col("sample")).as(Seq("pos", "entry")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("entry.id").as("doc_id"))
      .orderBy("lang", "rk")
  }

  /** q110 — leakage-safe train/val/test split: assignment is by
    * NEAR-DUP CLUSTER (q49's labels), not by document, so two
    * near-duplicates can never straddle train and test — the
    * eval-contamination failure mode a doc-level random split walks
    * straight into on a crawl corpus. Split is the first md5 byte of
    * the cluster id (≈ 80/10/10), deterministic and engine-free.
    * Rows-only (cluster ids come from the LSH pipeline); the
    * SPECGATES entry gates zero straddling clusters and the split
    * fractions. Scale shape: q49's clustering plus one narrow hash
    * derivation — no extra shuffle beyond the labeling itself.
    */
  val clusterSplit: QueryDef = QueryDef.rowsOnly("q110_cluster_split") {
    (s, d) =>
      val b = conv(substring(md5(col("cluster_id").cast("string")), 1, 2),
        16, 10).cast("int")
      graft.dedup.Dedup.clusters.fn(s, d)
        .select(col("doc_id"), col("cluster_id"))
        .withColumn("split",
          when(b < 205, "train").when(b < 230, "val").otherwise("test"))
        .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] =
    Seq(negativeSample, temperatureSample, reservoirSample, clusterSplit)
}
