package graft.ml

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * NEAR-DUP CLUSTER, not by document, so two near-duplicates can
    * never straddle train and test — the eval-contamination failure
    * mode a doc-level random split walks straight into on a crawl
    * corpus. Clusters are connected components over the EXACT
    * Jaccard ≥ 0.6 pair set ([[graft.dedup.SetSimJoin.allPairs]],
    * q121's prefix-filtered join, on its 1-in-4 sample precedent);
    * split is the first md5 byte of the cluster id (< 0xcd train,
    * < 0xe6 val, else test ≈ 80/10/10), compared as a hex STRING so
    * both engines decide identically with no base conversion.
    *
    * Fully oracle-checked — including the distributed CC labeling,
    * which hash-matches a DuckDB `WITH RECURSIVE` min-label
    * propagation (the strongest gate shape in the repo: a custom
    * iterative operator with an ANSI oracle). The LSH labeling
    * (q49) stays the approximate full-corpus path; this exact
    * variant is the one a leakage audit wants, since a recall miss
    * in LSH is precisely a leaked pair. Scale shape: q121's join
    * (no cartesian), CC on the pair graph (contracts after one
    * round), one narrow hash derivation.
    */
  val clusterSplit: QueryDef = QueryDef.sql(
    "q110_cluster_split",
    """WITH RECURSIVE t AS (SELECT doc_id,
      |  list_distinct(string_split(text, ' ')) AS toks FROM documents
      |  WHERE doc_id % 4 = 0),
      | p AS (SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM t a JOIN t b ON a.doc_id < b.doc_id
      |   AND 5 * len(b.toks) >= 3 * len(a.toks)
      |   AND 5 * len(a.toks) >= 3 * len(b.toks)
      |   AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / (len(a.toks) + len(b.toks)
      |       - len(list_intersect(a.toks, b.toks))) >= 0.6),
      | sym AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
      | r(node, lab) AS (
      |  SELECT doc_id, doc_id FROM t
      |  UNION
      |  SELECT s.b, r.lab FROM r JOIN sym s ON r.node = s.a),
      | lab AS (SELECT node AS doc_id, min(lab) AS cluster_id
      |  FROM r GROUP BY node)
      | SELECT doc_id, cluster_id,
      |  CASE WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 2)
      |        < 'cd' THEN 'train'
      |       WHEN substring(md5(CAST(cluster_id AS VARCHAR)), 1, 2)
      |        < 'e6' THEN 'val'
      |       ELSE 'test' END AS split
      | FROM lab ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val sub = Tables.documents(s, d).filter(col("doc_id") % 4 === 0)
    val labels = graft.dedup.Dedup.exactClusterLabels(s, d)
    val b = substring(md5(col("cluster_id").cast("string")), 1, 2)
    sub.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("split",
        when(b < "cd", "train").when(b < "e6", "val").otherwise("test"))
      .orderBy("doc_id")
  }

  /** q144 — DSIR data selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank every
    * document by the importance ratio of a TARGET distribution (the
    * `source = 'src0'` quality slice, q143's reference prior) over
    * the RAW corpus distribution, both estimated on HASHED unigram
    * features, and select the top-N. The hashing is the method's
    * scale trick and this operator's: features bucket by a 3-hex-char
    * md5 prefix (4096 buckets — the engine-portable spelling of
    * DSIR's 10⁴-dim hashed n-grams; collisions are part of the
    * estimator), so BOTH count tables are bounded at 4096 rows BY
    * CONSTRUCTION regardless of corpus or vocabulary size — where
    * q143's LM tables size with the reference vocabulary, DSIR's
    * size with a constant. Per-doc score = mean per-token log₁₀
    * importance ratio (add-one smoothing on the shared observed
    * bucket support), summed through DECIMAL(28,12) for
    * order-independent parity.
    *
    * Selection is top-SelectN by (score, doc_id): Spark plans the
    * sort+limit as TakeOrderedAndProject (per-partition top-N, one
    * merge — no global sort), and the output rank windows over the
    * SelectN-row result, bounded by the constant. The DuckDB oracle
    * spells the same ranking as a full window, which it can afford.
    *
    * Spelling rule (the q150/q131 floor-grid discipline, adopted
    * after round 9's one wrong answer): no rounded double that can
    * cross zero leaves an operator. The r9 cut emitted
    * `round(score, 4)` and doc 41's tiny-negative mean rounded to
    * +0.0 in Spark (BigDecimal HALF_UP drops the sign) but -0.0 in
    * DuckDB (round-toward-signed-zero) — value-equal, hash-different.
    * The score now leaves on the BIGINT 1e4 lattice
    * (`floor(s/n·1e4)`): both engines compute the identical IEEE
    * double chain and `floor` lands on an integer, which has no
    * signed zero to disagree about.
    */
  /** The q144/q151 shared score pipeline, SQL half: CTEs `tok` → `sc`
    * producing (doc_id, source, n_toks, score_q4) — the hashed-unigram
    * importance score on the BIGINT 1e4 lattice. Selection (q144
    * top-N) and resampling (q151 Gumbel-top-N) both start here.
    */
  private val DsirScoreCtes: String =
    """WITH tok AS (SELECT doc_id, source,
      |   unnest(string_split(text, ' ')) AS t FROM documents),
      | f AS (SELECT doc_id, source, substring(md5(t), 1, 3) AS b
      |  FROM tok),
      | ct AS (SELECT b, count(*) AS c FROM f WHERE source = 'src0'
      |  GROUP BY b),
      | cr AS (SELECT b, count(*) AS c FROM f GROUP BY b),
      | nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ct),
      | nr AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cr),
      | nb AS (SELECT count(*) AS nb FROM cr),
      | lr AS (SELECT cr.b, CAST(
      |   log10(CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE) /
      |     CAST((SELECT n FROM nt) + (SELECT nb FROM nb) AS DOUBLE))
      |   - log10(CAST(cr.c + 1 AS DOUBLE) /
      |     CAST((SELECT n FROM nr) + (SELECT nb FROM nb) AS DOUBLE))
      |   AS DECIMAL(28,12)) AS lg
      |  FROM cr LEFT JOIN ct ON cr.b = ct.b),
      | agg AS (SELECT f.doc_id, f.source, count(*) AS n_toks,
      |   CAST(sum(lr.lg) AS DOUBLE) AS s
      |  FROM f JOIN lr ON f.b = lr.b GROUP BY f.doc_id, f.source),
      | sc AS (SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks,
      |   CAST(floor(s / n_toks * 1e4) AS BIGINT) AS score_q4 FROM agg)"""
      .stripMargin

  /** The q144/q151 shared score pipeline, Spark half — same contract
    * as [[DsirScoreCtes]].
    *
    * One tokenization pass: the per-(doc, bucket) count table is the
    * smallest frame every downstream term derives from (doc count ×
    * ≤4096 buckets, vs three re-scans of the exploded token stream);
    * cnt · decimal(lg) == per-token decimal sums exactly, so the
    * oracle's per-token spelling hash-matches. Both count tables ride
    * ONE conditional aggregate (target is a slice of raw, so ct is a
    * filtered sum): the token stream is scanned exactly twice — once
    * into the bucket table, once into the per-doc scores. The
    * bucket-level ratio table is ≤ 4096 rows joined + aggregated
    * driver-free, then broadcast onto the per-doc counts.
    */
  private[graft] def dsirScores(s: SparkSession, d: String): DataFrame =
    dsirScoresOver(Tables.documents(s, d))

  /** [[dsirScores]] over any `(doc_id, source, text)` frame — exposed
    * so the q153 curation composition can score the span-cleaned,
    * bucket-filtered survivors instead of the raw corpus.
    */
  private[graft] def dsirScoresOver(docs: DataFrame): DataFrame = {
    // conditional fan-out (r20): the token explode + md5 bucketing is
    // the dominant cost and a one-row-group corpus serializes it;
    // identity below the size gate and on non-file inputs (q153's
    // checkpointed `surv`)
    val g = graft.Scale.rebalanceNarrowWideScan(docs)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("t"))
      .groupBy(col("doc_id"), col("source"),
        substring(md5(col("t")), 1, 3).as("b"))
      .agg(count(lit(1)).as("cnt"))
      // One materialization of the (doc, bucket) count table (r19):
      // g feeds both the bucket-ratio build and the final per-doc
      // score join, and each reference re-ran the token explode +
      // md5 bucketing — the operator's dominant cost. g is bounded
      // by docs × ≤4096 narrow rows.
      .localCheckpoint()
    val bc = g.groupBy("b").agg(sum("cnt").as("cr"),
      sum(when(col("source") === "src0", col("cnt")).otherwise(0L))
        .as("ct"))
    val totals = bc.agg(sum("cr").as("nr"), count(lit(1)).as("nb"),
      sum("ct").as("nt"))
    val lr = bc
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log10((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
          (col("nt") + col("nb")).cast("double"))
         - log10((col("cr") + 1).cast("double") /
          (col("nr") + col("nb")).cast("double")))
          .cast("decimal(28,12)").as("lg"))
    // cnt enters the product as DECIMAL(9,0), NOT long: a long
    // promotes to decimal(20,0) and (28,12)×(20,0) needs precision
    // 49 > 38, so Spark's precision-loss rule silently truncates the
    // product scale to 6 — a 1e-6 rounding per bucket that drifts s
    // off the oracle's exact per-token sum (caught by q151 at
    // sf0.001: doc 94's mean sat 1.1e-4 from a 1e4-grid line and
    // flipped its floor). (9,0)×(28,12) → (38,12), exact; 1e9 tokens
    // of one doc in one md5 bucket is the documented envelope.
    g.join(broadcast(lr), "b")
      .groupBy("doc_id", "source")
      .agg(sum("cnt").as("n_toks"),
        sum(col("cnt").cast("decimal(9,0)") * col("lg"))
          .cast("double").as("s"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        floor(col("s") / col("n_toks") * lit(1e4)).cast("long")
          .as("score_q4"))
  }

  val dsirSelect: QueryDef = {
    val SelectN = 200
    QueryDef.sql(
      "q144_dsir_select",
      (DsirScoreCtes +
        s""",
        | top AS (SELECT *, row_number() OVER
        |   (ORDER BY score_q4 DESC, doc_id) AS rank FROM sc)
        | SELECT doc_id, source, n_toks, score_q4, CAST(rank AS INT) AS rank
        | FROM top WHERE rank <= $SelectN ORDER BY doc_id"""
        .stripMargin).replaceAll("\n", "")
    ) { (s, d) =>
      val sc = dsirScores(s, d)
      val top = sc.orderBy(desc("score_q4"), asc("doc_id")).limit(SelectN)
      top.withColumn("rank",
          row_number().over(Window.orderBy(desc("score_q4"), asc("doc_id")))
            .cast("int"))
        .orderBy("doc_id")
    }
  }

  /** q151 — DSIR importance RESAMPLING, the sampled half the paper
    * actually prescribes (Xie et al. 2023 §3: draw examples with
    * probability ∝ the importance weight, where q144's top-N is the
    * deterministic limit): Gumbel-top-N (Efraimidis–Spirakis via the
    * Gumbel-max trick) — key_i = score_i + G_i with G_i a Gumbel(0,1)
    * draw, take the N largest keys ⟺ sample N without replacement
    * with P ∝ exp-scale(score). Here score is the mean log₁₀
    * importance ratio, so G enters divided by ln 10:
    * key = score − log₁₀(−ln u).
    *
    * Determinism discipline (the q85/q107 hash-order rule): u derives
    * from md5(doc_id ‖ ':dsir') — 8 hex chars → integer h, u =
    * (h+0.5)/2³² ∈ (0,1) strictly — reproducible across engines and
    * runs; the selection key leaves on the BIGINT 1e6 lattice
    * (`floor(key·1e6)`, the q150 floor-grid rule) with doc_id
    * tie-break, so the selected SET is oracle-checkable, not just
    * plausible. Scale shape: identical to q144 — constant-size count
    * tables, broadcast ratio join, and the top-N plans as
    * TakeOrderedAndProject (per-partition top-N, no global sort).
    * The proportionality property itself is gate-checked (chi-square
    * of per-source sample counts vs importance-share expectation).
    */
  val dsirResample: QueryDef = {
    val SampleN = 100
    QueryDef.sql(
      "q151_dsir_resample",
      (DsirScoreCtes +
        s""",
        | u AS (SELECT doc_id, source, score_q4,
        |   CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
        |     || ':dsir'), 1, 8) AS BIGINT) AS DOUBLE) AS h FROM sc),
        | k AS (SELECT doc_id, source, score_q4,
        |   CAST(floor((CAST(score_q4 AS DOUBLE) / 1e4
        |     - log10(-ln((h + 0.5) / 4294967296.0))) * 1e6) AS BIGINT)
        |    AS key_q FROM u),
        | top AS (SELECT *, row_number() OVER
        |   (ORDER BY key_q DESC, doc_id) AS rank FROM k)
        | SELECT doc_id, source, score_q4, key_q, CAST(rank AS INT) AS rank
        | FROM top WHERE rank <= $SampleN ORDER BY doc_id"""
        .stripMargin).replaceAll("\n", "")
    ) { (s, d) =>
      val h = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":dsir"))), 1, 8), 16, 10).cast("long").cast("double")
      val keyed = dsirScores(s, d)
        .select(col("doc_id"), col("source"), col("score_q4"),
          floor((col("score_q4").cast("double") / lit(1e4) -
            log10(-log((h + lit(0.5)) / lit(4294967296.0)))) * lit(1e6))
            .cast("long").as("key_q"))
      val top = keyed.orderBy(desc("key_q"), asc("doc_id")).limit(SampleN)
      top.withColumn("rank",
          row_number().over(Window.orderBy(desc("key_q"), asc("doc_id")))
            .cast("int"))
        .orderBy("doc_id")
    }
  }

  /** q147 — water-filling token-budget allocation: split a global
    * training-token budget B across (source, lang) groups so that
    * group g receives a_g = min(cap_g, λ·w_g) with Σ a_g = B — the
    * closed-form solution of max Σ w_g·log(a_g) s.t. caps, i.e. the
    * constrained version of the mixture-table construction every LM
    * training run publishes (epochs-per-source under a total budget,
    * the GPT-3/LLaMA-style data table; weights here are q107's
    * temperature weights w = √avail, caps are [[MaxEpochs]] repeats
    * of each group's available tokens, B = [[BudgetX]]× the corpus).
    *
    * λ is found exactly, not by iteration: sort groups by saturation
    * point r_g = cap_g/w_g ascending; for each boundary "first k
    * groups saturated" the candidate λ_k = (B − Σ_{j≤k} cap_j) /
    * Σ_{j>k} w_j, and the unique valid boundary is the one with
    * r_k ≤ λ_k ≤ r_{k+1} (water-filling's standard prefix-sum
    * solution). The boundary test itself never touches a float: both
    * inequalities are evaluated on their exact cross-multiplied
    * integer forms ((B−Σcap)·wq vs cap·(Σw remaining), DECIMAL(38,0)
    * / HUGEINT — the q107 envelope) on the 1e9-quantized √ grid, so
    * a water level landing exactly on a saturation point still
    * matches its row — the pick cannot flip between engines or
    * silently come back empty; λ and the allocations are single
    * identical-spelling double expressions.
    *
    * Scale shape: the only corpus-sized work is the per-group token
    * count (hash aggregate, map-side partials). The water-filling
    * itself runs on the group summary — |sources|×|langs| rows, tiny
    * BY CONSTRUCTION at any corpus size — so its windows are
    * single-partition by design, not by accident.
    */
  /** Per-group repeat cap (epochs) and global budget multiple for
    * [[tokenBudget]]: B = BudgetX·Σavail < MaxEpochs·Σavail = Σcap,
    * so the water level always lands strictly inside the caps and a
    * valid boundary row is guaranteed to exist. (Declared BEFORE
    * tokenBudget: the oracle string interpolates them at object
    * init, where a later-declared val is still 0.)
    */
  val MaxEpochs = 4
  val BudgetX = 2

  val tokenBudget: QueryDef = {
    QueryDef.sql(
      "q147_token_budget",
      s"""WITH g AS (SELECT source, lang,
         |   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
         |  FROM documents GROUP BY source, lang),
         | q AS (SELECT source, lang, avail,
         |   CAST($MaxEpochs AS BIGINT) * avail AS cap,
         |   CAST(floor(sqrt(CAST(avail AS DOUBLE)) * 1e9) AS BIGINT)
         |     AS wq FROM g),
         | t AS (SELECT CAST(sum(wq) AS BIGINT) AS totw,
         |   CAST($BudgetX AS BIGINT) * CAST(sum(avail) AS BIGINT) AS b
         |  FROM q),
         | s AS (SELECT source, lang, avail, cap, wq,
         |   CAST(cap AS DOUBLE) * 1e9 / CAST(wq AS DOUBLE) AS r FROM q),
         | w AS (SELECT source, lang, avail, cap, wq, r,
         |   coalesce(sum(cap) OVER (ORDER BY r, source, lang
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |     CAST(0 AS BIGINT)) AS cumcap,
         |   coalesce(sum(wq) OVER (ORDER BY r, source, lang
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |     CAST(0 AS BIGINT)) AS cumw,
         |   lag(cap) OVER (ORDER BY r, source, lang) AS prev_cap,
         |   lag(wq) OVER (ORDER BY r, source, lang) AS prev_wq
         |  FROM s),
         | c AS (SELECT w.*, t.b, t.totw, CAST(b - cumcap AS DOUBLE) * 1e9
         |     / CAST(totw - cumw AS DOUBLE) AS lam FROM w, t),
         | lam AS (SELECT lam FROM c WHERE
         |   CAST(b - cumcap AS HUGEINT) * CAST(wq AS HUGEINT)
         |     <= CAST(cap AS HUGEINT) * CAST(totw - cumw AS HUGEINT)
         |   AND (prev_wq IS NULL OR
         |     CAST(b - cumcap AS HUGEINT) * CAST(prev_wq AS HUGEINT)
         |       >= CAST(prev_cap AS HUGEINT) * CAST(totw - cumw AS HUGEINT))
         |  ORDER BY r, source, lang LIMIT 1)
         | SELECT source, lang, avail AS avail_tokens,
         |  cap AS cap_tokens,
         |  least(cap, CAST(floor(lam.lam * CAST(wq AS DOUBLE) / 1e9)
         |    AS BIGINT)) AS alloc_tokens,
         |  CAST(least(cap, CAST(floor(lam.lam * CAST(wq AS DOUBLE)
         |      / 1e9) AS BIGINT)) AS DOUBLE) / CAST(avail AS DOUBLE)
         |    AS epochs
         | FROM c, lam ORDER BY source, lang"""
        .stripMargin.replaceAll("\n", "")
    ) { (s, d) =>
      waterFillOver(Tables.documents(s, d)
        .select(col("source"), col("lang"),
          size(split(col("text"), " ")).as("nt"))
        .groupBy("source", "lang")
        .agg(sum("nt").cast("long").as("avail")))
    }
  }

  /** The q147 water-filling allocation over any
    * `(source, lang, avail)` group summary — exposed so the q153
    * curation composition can budget its selected set. Same contract
    * as [[tokenBudget]]: exact BIGINT boundary decisions, allocation
    * = min(cap, λ·w).
    */
  private[graft] def waterFillOver(g: DataFrame): DataFrame = {
    {
      val q = g.select(col("source"), col("lang"), col("avail"),
        (lit(MaxEpochs.toLong) * col("avail")).as("cap"),
        floor(sqrt(col("avail").cast("double")) * lit(1e9)).cast("long")
          .as("wq"))
      val t = q.agg(sum("wq").cast("long").as("totw"),
        (lit(BudgetX.toLong) * sum("avail").cast("long")).as("b"))
      val sRows = q.withColumn("r",
        col("cap").cast("double") * lit(1e9) / col("wq").cast("double"))
      val ord = Window.orderBy(col("r"), col("source"), col("lang"))
      val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
      val w = sRows
        .withColumn("cumcap", coalesce(sum("cap").over(prev), lit(0L)))
        .withColumn("cumw", coalesce(sum("wq").over(prev), lit(0L)))
        .withColumn("prev_cap", lag(col("cap"), 1).over(ord))
        .withColumn("prev_wq", lag(col("wq"), 1).over(ord))
      val c = w.crossJoin(broadcast(t))
        .withColumn("lam", (col("b") - col("cumcap")).cast("double") *
          lit(1e9) / (col("totw") - col("cumw")).cast("double"))
      // Boundary pick on the EXACT cross-multiplied integers, never
      // the float lam/r: lam_k ≤ r_k ⟺ (B−cumcap)·wq ≤ cap·(totw−cumw)
      // and lam_k ≥ r_{k-1} likewise — so a water level landing
      // exactly on a saturation point can never round every candidate
      // row out and silently empty the CTE (r9 ADVICE). DECIMAL(38,0)
      // (Spark) / HUGEINT (oracle) hold the ~n^1.5·1e9 products exact
      // — the q107 envelope.
      val lam = c.filter(
          (col("b") - col("cumcap")).cast("decimal(38,0)") * col("wq") <=
            col("cap").cast("decimal(38,0)") *
              (col("totw") - col("cumw")) &&
          (col("prev_wq").isNull ||
            (col("b") - col("cumcap")).cast("decimal(38,0)") *
              col("prev_wq") >=
              col("prev_cap").cast("decimal(38,0)") *
                (col("totw") - col("cumw"))))
        .orderBy(col("r"), col("source"), col("lang")).limit(1)
        .select(col("lam").as("lamstar"))
      val alloc = least(col("cap"),
        floor(col("lamstar") * col("wq").cast("double") / lit(1e9))
          .cast("long"))
      c.crossJoin(broadcast(lam))
        .select(col("source"), col("lang"),
          col("avail").as("avail_tokens"), col("cap").as("cap_tokens"),
          alloc.as("alloc_tokens"),
          (alloc.cast("double") / col("avail").cast("double"))
            .as("epochs"))
        .orderBy("source", "lang")
    }
  }

  val defs: Seq[QueryDef] =
    Seq(negativeSample, temperatureSample, reservoirSample, clusterSplit,
      dsirSelect, dsirResample, tokenBudget)
}
