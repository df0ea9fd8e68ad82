package graft.ml

import java.util.concurrent.ConcurrentHashMap

import graft.{QueryDef, Scale, Tables}
import graft.functions.VectorFunctions.cosine_sim
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's offline recommender (`OfflineRecommender.scala`,
  * `ALSTrainer.scala`) rebuilt on the DataFrame ML API:
  *
  *   - M1 ALS train: `mllib.ALS.train(rank=50, iter=5, lambda=0.01)`
  *     (`OfflineRecommender.scala:64-68`) → `ml.recommendation.ALS`
  *     with a pinned seed and `coldStartStrategy=drop`.
  *   - J1+P3+A4 user-recs: the reference materializes the full
  *     user×product cartesian grid, predicts, then groupByKey+sort
  *     (`OfflineRecommender.scala:71-84`). We call
  *     `recommendForAllUsers(20)` — blocked BLAS top-k that never
  *     materializes the grid; this is THE scale-critical rewrite
  *     (100 TB: grid is |U|×|P| rows, top-k is |U|×k).
  *   - J2+P5+A5 item-item similarity: cartesian self-join of latent
  *     factors + jblas cosine (`OfflineRecommender.scala:94-116`) →
  *     cross join over `itemFactors` with the codegen'd
  *     [[graft.functions.CosineSimilarity]] expression, threshold
  *     0.6 (`OfflineRecommender.scala:105`), windowed top-20 per
  *     product. For catalogs where n² is infeasible the LSH path in
  *     `graft.search.Ann` replaces the cross join.
  *   - M4-M6 RMSE evaluation: 80/20 split + grid search
  *     (`ALSTrainer.scala:41-79`) → `RegressionEvaluator("rmse")`.
  *
  * ALS output is seed-pinned but not bitwise reproducible across
  * cluster layouts, so these are rows-only checks (no SQL oracle).
  */
object Recommend {

  // Production defaults = the reference's published parameters
  // (`OfflineRecommender.scala:66`: rank=50, 5 iterations,
  // lambda=0.01). Overridable per query via `spark.graft.als.rank` /
  // `.reg` for bounded bench runs; note ml.ALS's regParam is scaled
  // differently from mllib's lambda (see MlSpec), so 0.01 here is
  // fidelity to the reference, not the tuned-quality choice.
  val Rank = 50
  val MaxIter = 5
  val RegParam = 0.01
  val TopK = 20
  val SimThreshold = 0.6

  /** Effective (rank, regParam): the reference defaults, overridable
    * per session (`spark.graft.als.rank` / `spark.graft.als.reg`) so a
    * bounded bench run is a conf change, not a code change.
    */
  def effRank(s: SparkSession): Int =
    s.conf.getOption("spark.graft.als.rank").map(_.toInt).getOrElse(Rank)
  def effReg(s: SparkSession): Double =
    s.conf.getOption("spark.graft.als.reg").map(_.toDouble).getOrElse(RegParam)

  // Caches key on (session, dir): a DataFrame/ALSModel is bound to the
  // session that built it, so a same-JVM session restart must miss
  // rather than return handles into a stopped session. Model caches
  // also key the hyperparams so a conf override misses instead of
  // returning a model fit at different params.
  private val modelCache =
    new ConcurrentHashMap[(SparkSession, String, Int, Double), ALSModel]()
  private val splitCache =
    new ConcurrentHashMap[(SparkSession, String), (DataFrame, DataFrame)]()
  private val fitCache =
    new ConcurrentHashMap[(SparkSession, String, Int, Double), ALSModel]()
  private val aggCache =
    new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The deduplicated `(userId, productId, avg score)` training table,
    * derived from [[Tables.cachedRatings]] and cached ONCE per
    * (session, dir) — every hyperparameter combo trains on the same
    * materialization instead of re-scanning and re-pinning a copy per
    * (rank, reg) cache miss.
    */
  private def aggRatings(spark: SparkSession, dir: String): DataFrame = {
    Scale.purgeStopped(aggCache)
    aggCache.computeIfAbsent((spark, dir), _ => {
      val r = Tables.cachedRatings(spark, dir)
        .groupBy("userId", "productId").agg(avg("score").as("score"))
        .cache()
      r.count()
      r
    })
  }

  private def als: ALS = new ALS()
    .setUserCol("userId").setItemCol("productId").setRatingCol("score")
    .setRank(Rank).setMaxIter(MaxIter).setRegParam(RegParam)
    .setSeed(42L).setColdStartStrategy("drop")

  /** Train-once-per-sfDir (Verify/Bench run several ALS-derived
    * queries in one JVM; retraining per query would be pure waste).
    */
  def model(spark: SparkSession, dir: String): ALSModel = {
    Scale.purgeStopped(modelCache)
    val (rank, reg) = (effRank(spark), effReg(spark))
    modelCache.computeIfAbsent((spark, dir, rank, reg), _ =>
      als.setRank(rank).setRegParam(reg).fit(aggRatings(spark, dir)))
  }

  /** The shared seed-42 80/20 evaluation split, materialized once per
    * (session, dir) — every RMSE-style query evaluates on the same
    * held-out set.
    */
  def evalSplit(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    Scale.purgeStopped(splitCache)
    splitCache.computeIfAbsent((spark, dir), _ => {
      val Array(train, test) =
        aggRatings(spark, dir).randomSplit(Array(0.8, 0.2), seed = 42L)
      // localCheckpoint, not cache: ALS fits iterate over `train`
      // dozens of times, and a cache() keeps the randomSplit lineage
      // alive — any evicted block re-runs the split (and the ratings
      // agg above it) mid-fit. Checkpoint blocks spill to disk
      // instead of recomputing, which is where q24's rep-to-rep
      // variance came from.
      (train.localCheckpoint(), test.localCheckpoint())
    })
  }

  /** Fit-once per (session, dir, rank, reg) on the shared eval split —
    * q23's production-params fit IS one of q24's grid combos, so the
    * grid reuses it instead of fitting the same model twice.
    */
  def fitOnSplit(spark: SparkSession, dir: String, rank: Int,
      reg: Double): ALSModel = {
    Scale.purgeStopped(fitCache)
    fitCache.computeIfAbsent((spark, dir, rank, reg), _ => {
      val (train, _) = evalSplit(spark, dir)
      als.setRank(rank).setRegParam(reg).fit(train)
    })
  }

  /** M2/A4 — top-20 recommendations per user, flattened flat table
    * `(user_id, rank, product_id, score)` for stable row output.
    */
  val userRecs: QueryDef = QueryDef.rowsOnly("q20_als_user_recs") {
    (s, d) =>
      model(s, d).recommendForAllUsers(TopK)
        .select(col("userId"),
          posexplode(col("recommendations")).as(Seq("pos", "rec")))
        .select(
          col("userId").cast("long").as("user_id"),
          (col("pos") + 1).as("rank"),
          col("rec.productId").cast("long").as("product_id"),
          col("rec.rating").cast("double").as("score"))
        .orderBy("user_id", "rank")
  }

  /** M3 — latent item factors `(product_id, dim, weight)`. */
  val itemFactors: QueryDef = QueryDef.rowsOnly("q21_als_item_factors") {
    (s, d) =>
      model(s, d).itemFactors
        .select(col("id"), posexplode(col("features")).as(Seq("dim", "weight")))
        .select(
          col("id").cast("long").as("product_id"),
          col("dim"),
          col("weight").cast("double").as("weight"))
        .orderBy("product_id", "dim")
  }

  /** J2/P4/P5/A5/F2 — item-item cosine similarity matrix, threshold
    * 0.6, top-20 per product. Exact path: n×n cross join with the
    * codegen'd cosine expression (fine to ~10⁴ items; beyond that the
    * LSH approxSimilarityJoin in `graft.search.Ann` is the plan).
    */
  val itemSims: QueryDef = QueryDef.rowsOnly("q22_item_sim_cosine") {
    (s, d) =>
      val f = model(s, d).itemFactors
        .select(col("id"), col("features"))
      val w = Window.partitionBy("product_id")
        .orderBy(desc("sim"), asc("sim_product_id"))
      val pairPool =
        if (Scale.exactOk(s, s"$d#itemFactors", f.count())) {
          val a = f.select(col("id").as("pid_a"), col("features").as("fa"))
          val b = f.select(col("id").as("pid_b"), col("features").as("fb"))
          a.crossJoin(b).filter(col("pid_a") =!= col("pid_b"))
        } else
          // catalog too big for n²: hyperplane-banded candidates
          // (both directions — the sim matrix is consumed per-row),
          // factor vectors re-attached by key after the band join;
          // results above the limit are approximate by design
          graft.dedup.Dedup
            .lshCosinePairsConf(f, "id", "features", symmetric = true)
            .join(f.select(col("id").as("id_a"), col("features").as("fa")),
              "id_a")
            .join(f.select(col("id").as("id_b"), col("features").as("fb")),
              "id_b")
            .select(col("id_a").as("pid_a"), col("fa"),
              col("id_b").as("pid_b"), col("fb"))
      pairPool
        .select(
          col("pid_a").cast("long").as("product_id"),
          col("pid_b").cast("long").as("sim_product_id"),
          round(cosine_sim(col("fa"), col("fb")), 6).as("sim"))
        .filter(col("sim") > SimThreshold)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .orderBy("product_id", "rank")
  }

  /** M4-M6 — held-out RMSE of the production params on an 80/20
    * split (`ALSTrainer.scala:41-79`), as a single-row result.
    */
  val alsRmse: QueryDef = QueryDef.rowsOnly("q23_als_rmse") { (s, d) =>
    import s.implicits._
    val (_, test) = evalSplit(s, d)
    val rmse = evaluateRmse(fitOnSplit(s, d, effRank(s), effReg(s)), test)
    Seq(rmse).toDF("rmse").select(round(col("rmse"), 6).as("rmse"))
  }

  def evaluateRmse(m: ALSModel, test: DataFrame): Double =
    new RegressionEvaluator()
      .setMetricName("rmse").setLabelCol("score")
      .setPredictionCol("prediction")
      .evaluate(m.transform(test))

  /** The grid's (rank, reg) combos. Dims come from
    * `spark.graft.als.grid` ("ranks:regs", e.g. the reference's full
    * ALSTrainer.scala:53-63 sweep is "100,200,250:1,0.1,0.01,0.001");
    * the default 2×2 keeps the bench bounded — the full grid is a
    * conf change, not code — and includes the production combo
    * (effRank, effReg) so q23's fit is one of the grid's, shared
    * through [[fitOnSplit]]. Exposed so Verify's replay dump walks
    * exactly the combos the query fit.
    */
  private[graft] def gridCombos(s: SparkSession): Seq[(Int, Double)] = {
    val (ranks, regs) = s.conf.getOption("spark.graft.als.grid") match {
      case Some(spec) =>
        val parts = spec.split(":")
        require(parts.length == 2,
          s"spark.graft.als.grid must be 'rank,rank,...:reg,reg,...'" +
            s" (e.g. '100,200,250:1,0.1,0.01,0.001'), got: $spec")
        (parts(0).split(",").toSeq.map(_.trim.toInt),
          parts(1).split(",").toSeq.map(_.trim.toDouble))
      case None =>
        (Seq(20, effRank(s)).distinct, Seq(effReg(s), 0.1).distinct)
    }
    for { rank <- ranks; reg <- regs } yield (rank, reg)
  }

  /** M5 — grid search over (rank, regParam) by held-out RMSE
    * (`ALSTrainer.scala:53-63`); emits the whole grid, best first.
    * Kept small (2×2) so the bench run stays bounded; the full
    * reference grid is a parameter change, not a code change.
    */
  val gridSearch: QueryDef = QueryDef.rowsOnly("q24_als_grid_search") {
    (s, d) =>
      import s.implicits._
      val (_, test) = evalSplit(s, d)
      // Fits run concurrently (Spark schedules jobs from multiple
      // threads fairly): each small ALS fit underutilizes the
      // cluster, so the grid overlaps instead of serializing. Two at
      // a time — measured sweet spot; four concurrent iterative fits
      // contend on shuffle slots and the wall time gets noisy.
      // Each combo goes through fitOnSplit, so the production combo
      // (fit by q23) is reused, not re-fit.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val combos = gridCombos(s)
      val grid = try Await.result(
        Future.sequence(combos.map { case (rank, reg) =>
          Future {
            val m = fitOnSplit(s, d, rank, reg)
            (rank, reg, evaluateRmse(m, test))
          }
        }), Duration.Inf)
      finally pool.shutdown()
      grid.toDF("rank", "reg_param", "rmse")
        .select(col("rank"), col("reg_param"), round(col("rmse"), 6).as("rmse"))
        .orderBy("rmse", "rank", "reg_param")
  }

  /** q72 — co-occurrence item-item similarity, the model-free
    * counterpart of q22's factor cosine (classic item-CF: two
    * products are similar when the same users interact with both;
    * sim = c(a,b) / √(c(a)·c(b)), the cosine of the binary
    * interaction vectors). The reference computes its streaming-side
    * sim matrix offline from ALS factors; this is the spelling that
    * needs NO trained model and updates with a pure count refresh.
    *
    * Scale shape: the pair generation self-joins the DISTINCT
    * (user, product) table on user — per-user cost is d² in the
    * user's distinct-product count, the well-known co-occurrence
    * blowup. The standard mitigation (cap each user's contribution
    * at the K most-interacted products; whale users add noise, not
    * signal) is plumbed via `spark.graft.cooccur.userCap` — the
    * DEFAULT leaves it off so the oracle compare stays exact (the
    * test corpus tops out at ~80 products/user). Counts are exact
    * integers and √/÷ are single IEEE ops on them, so the doubles
    * hash-match the oracle bit-for-bit unrounded.
    */
  val coOccurSims: QueryDef = QueryDef.sql(
    "q72_cooccur_sim",
    s"""WITH up AS (SELECT DISTINCT user_id,
       |   event_id % ${Tables.NumProducts} AS p FROM events),
       | cnt AS (SELECT p, count(*) AS c FROM up GROUP BY p),
       | pairs AS (SELECT u1.p AS pa, u2.p AS pb, count(*) AS cab
       |  FROM up u1 JOIN up u2 ON u1.user_id = u2.user_id AND u1.p <> u2.p
       |  GROUP BY u1.p, u2.p),
       | sims AS (SELECT pa AS product_id, pb AS sim_product_id,
       |   CAST(cab AS DOUBLE) / sqrt(CAST(ca.c * cb.c AS DOUBLE)) AS sim
       |  FROM pairs JOIN cnt ca ON pairs.pa = ca.p
       |   JOIN cnt cb ON pairs.pb = cb.p),
       | ranked AS (SELECT product_id, sim_product_id, sim, row_number()
       |   OVER (PARTITION BY product_id
       |         ORDER BY sim DESC, sim_product_id) AS rank FROM sims)
       | SELECT product_id, sim_product_id, sim, CAST(rank AS INT) AS rank
       | FROM ranked WHERE rank <= ${TopK}
       | ORDER BY product_id, rank""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val userCap = s.conf.getOption("spark.graft.cooccur.userCap")
      .map(_.toInt)
    val upAll = Tables.events(s, d)
      .select(col("user_id"),
        (col("event_id") % Tables.NumProducts).as("p"))
      .distinct()
    val up = userCap match {
      case None => upAll
      case Some(cap) =>
        // whale-user cap: keep each user's K most-recent products
        // (deterministic id order here — interaction recency in a
        // real deployment); bounds the pair blowup at K² per user
        val w = Window.partitionBy("user_id").orderBy(col("p"))
        upAll.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= cap).drop("__rn")
    }
    val cnt = up.groupBy("p").agg(count(lit(1)).as("c"))
    // both directions come out of ONE join pass (`=!=`, not `<` +
    // re-symmetrizing union: a union's branches each re-evaluate the
    // shared pair pipeline) — 2× pair rows through one shuffle beats
    // the whole upstream computed twice. Dataset ALIASES of the one
    // up plan → ReuseExchange computes the whale-cap window once,
    // not once per join side (the q124 lesson).
    val pairs = up.as("l")
      .join(up.as("r"), col("l.user_id") === col("r.user_id"))
      .filter(col("l.p") =!= col("r.p"))
      .groupBy(col("l.p").as("pa"), col("r.p").as("pb"))
      .agg(count(lit(1)).as("cab"))
    val sims = pairs
      .join(broadcast(cnt.select(col("p").as("pa"), col("c").as("ca"))),
        "pa")
      .join(broadcast(cnt.select(col("p").as("pb"), col("c").as("cb"))),
        "pb")
      .select(col("pa").as("product_id"), col("pb").as("sim_product_id"),
        (col("cab").cast("double") /
          sqrt((col("ca") * col("cb")).cast("double"))).as("sim"))
    val w = Window.partitionBy("product_id")
      .orderBy(desc("sim"), asc("sim_product_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .orderBy("product_id", "rank")
  }

  val defs: Seq[QueryDef] =
    Seq(userRecs, itemFactors, itemSims, alsRmse, gridSearch, coOccurSims)
}
