package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end curation flow a training-data pipeline actually
  * runs, composed from the engine's operators: quality filter → exact
  * dedup → benchmark decontamination → stratified sample → mix
  * report. Each stage is a DataFrame→DataFrame function (usable on
  * its own); q62 chains them and is oracle-gated end-to-end, so the
  * COMPOSITION is hash-checked, not just the pieces.
  *
  * Scale shape: the only corpus-wide shuffles are the dedup hash-agg,
  * the stratify window, and the final small aggregate; the benchmark
  * shingle set broadcasts; everything else is narrow. No stage
  * materializes an intermediate corpus copy.
  */
object Curation {

  val MinWords = 30
  val PerStratum = 50
  val BenchMod = 97

  /** Reference-free quality gate (here: minimum length; thresholds on
    * q40's richer score drop in the same way).
    */
  def qualityFilter(docs: DataFrame, minWords: Int = MinWords): DataFrame =
    docs.filter(size(split(col("text"), " ")) >= minWords)

  /** Exact dedup, keep-smallest-id — one hash-agg + semi join. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keep = docs
      .groupBy(md5(col("text")).as("fp")).agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Drop the benchmark set itself and every doc sharing a word
    * trigram with it. Contamination is judged against the FULL corpus
    * (`allDocs`), not the already-filtered survivors — a doc's
    * contamination status must not depend on earlier pipeline stages.
    */
  def decontaminate(docs: DataFrame, allDocs: DataFrame,
      benchMod: Int = BenchMod): DataFrame = {
    val contaminated = graft.dedup.Dedup
      .benchShingleHits(allDocs, benchMod).select("doc_id")
    docs.filter(col("doc_id") % benchMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Deterministic ≤K-per-(lang, source) downsample by md5 order. */
  def stratify(docs: DataFrame, k: Int = PerStratum): DataFrame = {
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** q62 — the chained pipeline, reported as the training-mix table
    * (docs + tokens per stratum after all gates).
    */
  val pipeline: QueryDef = QueryDef.sql(
    "q62_curation_pipeline",
    s"""WITH quality AS (
       |  SELECT doc_id, lang, source, text FROM documents
       |  WHERE len(string_split(text, ' ')) >= $MinWords),
       | dedup AS (
       |  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
       | kept AS (
       |  SELECT q.* FROM quality q JOIN dedup d ON q.doc_id = d.doc_id),
       | t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       | sh AS (SELECT doc_id, unnest(list_distinct(
       |  [array_to_string(toks[i:i+2], ' ')
       |   for i in generate_series(1, greatest(len(toks)-2, 1))])) AS s
       |  FROM t),
       | bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % $BenchMod = 0),
       | contaminated AS (
       |  SELECT DISTINCT sh.doc_id FROM sh JOIN bench ON sh.s = bench.s),
       | clean AS (
       |  SELECT k.* FROM kept k
       |  WHERE k.doc_id % $BenchMod <> 0
       |    AND NOT EXISTS (SELECT 1 FROM contaminated c
       |                    WHERE c.doc_id = k.doc_id)),
       | sampled AS (
       |  SELECT doc_id, lang, source, text, row_number() OVER
       |    (PARTITION BY lang, source
       |     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
       |  FROM clean)
       | SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       | FROM sampled WHERE rk <= $PerStratum
       | GROUP BY lang, source ORDER BY lang, source""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val curated = stratify(
      decontaminate(exactDedup(qualityFilter(docs)), docs))
    curated
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .orderBy("lang", "source")
  }

  /** q117 — curation v2: the round-5 composition. Normalize (q116's
    * canonical form) → quality gate on NORMALIZED tokens → exact
    * dedup on the normalized text (so case/punctuation variants
    * collapse — the pairing q116's scaladoc promises) → α=½
    * temperature resampling by source (q107's integer-exact caps
    * over the SURVIVORS) → per-source mix report. Oracle-gated as a
    * composition end-to-end, like q62.
    *
    * Scale shape: normalization and the quality gate are narrow; the
    * dedup hash-agg and the ranking are the only corpus shuffles;
    * cap arithmetic runs on the source-cardinality aggregate
    * (broadcast). Ranking uses the q69/q107 two-phase bucket prefix
    * sum, so no reducer ever sees a whole source's rows — a dominant
    * source costs the same as a balanced one.
    */
  val pipelineV2: QueryDef = QueryDef.sql(
    "q117_curation_v2",
    s"""WITH n AS (SELECT doc_id, source,
       |   trim(regexp_replace(regexp_replace(lower(text),
       |     '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS t
       |  FROM documents),
       | q AS (SELECT * FROM n WHERE len(string_split(t, ' ')) >= $MinWords),
       | k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(t)),
       | ded AS (SELECT q.* FROM q JOIN k USING (doc_id)),
       | c AS (SELECT source, count(*) AS cn FROM ded GROUP BY source),
       | qq AS (SELECT source, cn,
       |   CAST(floor(sqrt(CAST(cn AS DOUBLE)) * 1e9) AS BIGINT) AS qv
       |   FROM c),
       | tt AS (SELECT CAST(sum(qv) AS BIGINT) AS qsum,
       |   CAST(sum(cn) AS BIGINT) AS total FROM qq),
       | caps AS (SELECT source,
       |   least(CAST(total AS HUGEINT) // 2 * qv // qsum, cn)
       |   AS cap FROM qq, tt),
       | r AS (SELECT doc_id, source, t, row_number() OVER (
       |   PARTITION BY source
       |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM ded),
       | sel AS (SELECT r.* FROM r JOIN caps USING (source)
       |   WHERE rk <= cap)
       | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(string_split(t, ' '))) AS BIGINT) AS n_tokens
       | FROM sel GROUP BY source ORDER BY source""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    // r19 restructure (guide §2.3/§8 — decide with small rows): the
    // old spelling carried the normalized TEXT through every exchange
    // and re-ran the regex-normalize chain once per consumer (the
    // plan referenced `ded` from four subtrees; StageProbe r19 showed
    // four serial single-task ~0.7 s stages — the documents file is
    // one row group, so each re-scan was also serial). Now: normalize
    // ONCE, immediately project text down
    // to (fp = md5(t), ntok) — everything downstream (dedup, caps,
    // two-phase ranking, the final mix table) needs only those — and
    // localCheckpoint the ~30 B/row survivor table so the four
    // consumers read it instead of re-deriving. Same output, same
    // oracle: fp/ntok are the identical expressions over t.
    val n = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", ""), " +", " ")).as("t"))
    val q = n.filter(size(split(col("t"), " ")) >= MinWords)
      .select(col("doc_id"), col("source"), md5(col("t")).as("fp"),
        size(split(col("t"), " ")).as("ntok"))
      .localCheckpoint()
    val keep = q.groupBy("fp")
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val ded = q.join(keep, Seq("doc_id"), "left_semi")
    val counts = ded.groupBy("source").agg(count(lit(1)).as("cn"))
    val qv = counts.withColumn("qv",
      floor(sqrt(col("cn").cast("double")) * lit(1e9)).cast("long"))
    val tt = qv.agg(sum("qv").cast("long").as("qsum"),
      sum("cn").cast("long").as("total"))
    val caps = qv.crossJoin(broadcast(tt))
      .select(col("source"),
        // DECIMAL(38,0) intermediate — see q107's cap comment: the
        // BIGINT product overflows past ~7M docs; HUGEINT on the
        // oracle side keeps both engines exact and identical.
        least(expr("CAST(total div 2 AS DECIMAL(38,0)) * qv div qsum"),
          col("cn")).as("cap"))
    // q107's two-phase ranking (not a plain per-source window, which
    // funnels each source through ONE reducer): 256 md5 buckets rank
    // in parallel, and only the (source, bucket) offset table rides
    // a window — same total order, same rk, hash-identical output.
    val hashed = ded
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
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok").cast("long")).as("n_tokens"))
      .orderBy("source")
  }

  /** q120 — per-document curation audit: for EVERY input document,
    * which q62 stage kept or dropped it (`kept`, `dropped_quality`,
    * `dropped_duplicate`, `dropped_benchmark`, `dropped_contaminated`,
    * `dropped_sample`) — the "why did my document disappear" query
    * every pipeline operator eventually needs, and the provenance
    * record an audited training run has to ship. Statuses follow
    * stage precedence, so each doc reports the FIRST gate that
    * removed it; CurationSpec reconciles the audit's kept set with
    * q62's mix table exactly.
    *
    * Scale shape: the same shuffles as q62 (dedup hash-agg, stratify
    * window, shingle-hit computation) plus left joins of the drop
    * sets back onto the corpus by doc_id — ids-only tables, no extra
    * corpus-wide exchange beyond the final status projection.
    */
  val audit: QueryDef = QueryDef.sql(
    "q120_curation_audit",
    s"""WITH quality AS (
       |  SELECT doc_id, lang, source, text FROM documents
       |  WHERE len(string_split(text, ' ')) >= $MinWords),
       | keep AS (
       |  SELECT md5(text) AS fp, min(doc_id) AS keeper FROM quality
       |  GROUP BY md5(text)),
       | t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       | sh AS (SELECT doc_id, unnest(list_distinct(
       |  [array_to_string(toks[i:i+2], ' ')
       |   for i in generate_series(1, greatest(len(toks)-2, 1))])) AS s
       |  FROM t),
       | bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % $BenchMod = 0),
       | contaminated AS (
       |  SELECT DISTINCT sh.doc_id FROM sh JOIN bench ON sh.s = bench.s),
       | clean AS (
       |  SELECT q.* FROM quality q JOIN keep k ON md5(q.text) = k.fp
       |  WHERE q.doc_id = k.keeper AND q.doc_id % $BenchMod <> 0
       |    AND NOT EXISTS (SELECT 1 FROM contaminated c
       |                    WHERE c.doc_id = q.doc_id)),
       | rk AS (SELECT doc_id, row_number() OVER (PARTITION BY lang, source
       |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM clean)
       | SELECT d.doc_id,
       |  CASE
       |   WHEN len(string_split(d.text, ' ')) < $MinWords
       |     THEN 'dropped_quality'
       |   WHEN d.doc_id <> (SELECT keeper FROM keep k
       |                     WHERE k.fp = md5(d.text))
       |     THEN 'dropped_duplicate'
       |   WHEN d.doc_id % $BenchMod = 0 THEN 'dropped_benchmark'
       |   WHEN EXISTS (SELECT 1 FROM contaminated c
       |                WHERE c.doc_id = d.doc_id)
       |     THEN 'dropped_contaminated'
       |   WHEN (SELECT rk FROM rk WHERE rk.doc_id = d.doc_id)
       |     > $PerStratum THEN 'dropped_sample'
       |   ELSE 'kept' END AS status
       | FROM documents d ORDER BY d.doc_id""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    // r19 restructure (guide §2.3): every stage of the audit decides
    // on (fp = md5(text), nw = token count) — never on text itself —
    // so the doc table is projected to those ~50 B rows ONCE and
    // localCheckpointed; the keepers join, the rank window, and the
    // final status projection all consume the narrow form. Statuses
    // and ordering are byte-identical — fp/nw are the same
    // expressions the stages applied before.
    val proj = docs
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("text")).as("fp"),
        size(split(col("text"), " ")).as("nw"))
      .localCheckpoint()
    val quality = proj.filter(col("nw") >= MinWords)
    val keepers = quality.groupBy("fp").agg(min("doc_id").as("keeper"))
    val contaminated = graft.dedup.Dedup.benchShingleHits(docs, BenchMod)
      .select(col("doc_id")).withColumn("is_cont", lit(true))
    val clean = quality
      .join(keepers.select(col("keeper").as("doc_id")),
        Seq("doc_id"), "left_semi")
      .filter(col("doc_id") % BenchMod =!= 0)
      .join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti")
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ranked = clean.withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("rk"))
    proj.select(col("doc_id"), col("fp"), col("nw"))
      .join(keepers, Seq("fp"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .join(ranked, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("nw") < MinWords, "dropped_quality")
          .when(col("doc_id") =!= col("keeper"), "dropped_duplicate")
          .when(col("doc_id") % BenchMod === 0, "dropped_benchmark")
          .when(col("is_cont"), "dropped_contaminated")
          .when(col("rk") > PerStratum, "dropped_sample")
          .otherwise("kept").as("status"))
      .orderBy("doc_id")
  }

  /** q153 selection size: a real cut of the bucket survivors at every
    * SF (500-doc corpora keep ~333 after the tail drop; 5000-doc keep
    * ~3333).
    */
  val SelectNV3 = 150
  /** q153 packing: q67's shard budget and prefix-sum bucket count. */
  val ShardBudget = 1024L
  val PackBuckets = 32

  /** q153 — curation v3: the round-9/10 operator generation composed
    * as ONE lineage, proving the pieces chain without a driver-side
    * seam: exact-substring span REMOVAL (q138, Lee et al. 2022) →
    * CCNet-style perplexity bucketing on the CLEANED text with the
    * worst (tail) third dropped (q143) → DSIR importance selection of
    * the top [[SelectNV3]] survivors (q144) → water-filling token
    * budget across the selected (source, lang) groups (q147) →
    * next-fit shard packing of the selected docs (q67). Output: one
    * row per selected doc with its score, shard, and its group's
    * budget allocation.
    *
    * Every stage reuses the exact operator the standalone query
    * ships ([[graft.dedup.Dedup.removeSharedSpans]],
    * [[graft.text.TextAnalysis.perplexityBucketsOver]],
    * [[graft.ml.Sampling.dsirScoresOver]],
    * [[graft.ml.Sampling.waterFillOver]],
    * [[graft.text.TextAnalysis.packShardsOver]]), and the oracle
    * chains the five standalone oracles' CTEs — so the COMPOSITION is
    * hash-checked end to end, the q62/q117 discipline.
    *
    * Scale shape: the stages' own shapes compose unchanged (span
    * removal's 1/16 content sample, broadcast LM and ratio tables,
    * TakeOrderedAndProject selection, group-summary water-fill,
    * two-phase prefix-sum packing). `cleaned` and the bucket
    * survivors are localCheckpointed — each feeds two downstream
    * stages, and re-deriving the token-explode chain per consumer
    * would double the dominant cost (cluster spelling: checkpoint or
    * table rotation, the LPA discipline); `sel` is
    * [[SelectNV3]]-row-bounded and checkpointed for the same reason.
    */
  val pipelineV3: QueryDef = {
    val st = graft.dedup.Dedup.SpanTokens
    val cap = graft.dedup.Dedup.SpanDfCap
    val me = graft.ml.Sampling.MaxEpochs
    val bx = graft.ml.Sampling.BudgetX
    QueryDef.sql(
      "q153_curation_v3",
      s"""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents),
         | g0 AS (SELECT doc_id, i, array_to_string(
         |   toks[i:i+${st - 1}], ' ') AS gram
         |  FROM t0, LATERAL (SELECT unnest(generate_series(1,
         |   len(toks) - ${st - 1})) AS i)
         |  WHERE len(toks) >= $st),
         | sg0 AS (SELECT doc_id, i, gram FROM g0
         |  WHERE substring(md5(gram), 1, 1) = '0'),
         | dfs0 AS (SELECT gram, count(DISTINCT doc_id) AS df,
         |   min(doc_id) AS keeper FROM sg0 GROUP BY gram),
         | rm0 AS (SELECT sg0.doc_id, sg0.i FROM sg0
         |  JOIN dfs0 ON sg0.gram = dfs0.gram
         |  WHERE dfs0.df >= 2 AND dfs0.df <= $cap
         |    AND sg0.doc_id > dfs0.keeper),
         | cov0 AS (SELECT DISTINCT rm0.doc_id, rm0.i + o.o AS j FROM rm0,
         |  LATERAL (SELECT unnest(generate_series(0, ${st - 1})) AS o) o),
         | tok0 AS (SELECT t0.doc_id, u.i, t0.toks[u.i] AS tk FROM t0,
         |  LATERAL (SELECT unnest(generate_series(1, len(t0.toks)))
         |   AS i) u),
         | kept0 AS (SELECT tok0.doc_id, tok0.i, tok0.tk FROM tok0
         |  LEFT JOIN cov0 ON tok0.doc_id = cov0.doc_id AND tok0.i = cov0.j
         |  WHERE cov0.j IS NULL),
         | cleaned AS (SELECT d.doc_id, d.source, d.lang,
         |   coalesce(k.ct, '') AS text
         |  FROM documents d LEFT JOIN (SELECT doc_id,
         |    string_agg(tk, ' ' ORDER BY i) AS ct FROM kept0
         |    GROUP BY doc_id) k ON d.doc_id = k.doc_id),
         | ref1 AS (SELECT string_split(text, ' ') AS toks FROM cleaned
         |  WHERE source = 'src0'),
         | c21 AS (SELECT b, count(*) AS c2 FROM
         |   (SELECT unnest([toks[i-1] || ' ' || toks[i]
         |     for i in generate_series(2, len(toks))]) AS b FROM ref1)
         |  GROUP BY b),
         | c11 AS (SELECT w, count(*) AS c1 FROM
         |   (SELECT unnest(toks) AS w FROM ref1) GROUP BY w),
         | v1 AS (SELECT count(*) AS v FROM c11),
         | t1 AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
         |  FROM cleaned),
         | bg1 AS (SELECT doc_id, lang, unnest([toks[i-1] || ' ' || toks[i]
         |   for i in generate_series(2, len(toks))]) AS b FROM t1
         |  WHERE len(toks) >= 2),
         | scored1 AS (SELECT bg1.doc_id, bg1.lang,
         |   CAST(log10(CAST(COALESCE(c21.c2, 0) + 1 AS DOUBLE) /
         |     CAST(COALESCE(c11.c1, 0) + (SELECT v FROM v1) + 1 AS DOUBLE))
         |    AS DECIMAL(28,12)) AS lg
         |  FROM bg1 LEFT JOIN c21 ON bg1.b = c21.b
         |   LEFT JOIN c11 ON split_part(bg1.b, ' ', 1) = c11.w),
         | agg1 AS (SELECT doc_id, lang, count(*) AS n_bigrams,
         |   CAST(sum(lg) AS DOUBLE) AS sum_lg FROM scored1
         |  GROUP BY doc_id, lang),
         | p1 AS (SELECT doc_id, lang,
         |   round(-sum_lg / n_bigrams, 4) AS ppl FROM agg1),
         | b1 AS (SELECT doc_id, ntile(3) OVER
         |   (PARTITION BY lang ORDER BY ppl, doc_id) AS nt FROM p1),
         | surv AS (SELECT c.* FROM cleaned c JOIN b1
         |   ON c.doc_id = b1.doc_id WHERE b1.nt <= 2),
         | tok2 AS (SELECT doc_id, source,
         |   unnest(string_split(text, ' ')) AS t FROM surv),
         | f2 AS (SELECT doc_id, source, substring(md5(t), 1, 3) AS b
         |  FROM tok2),
         | ct2 AS (SELECT b, count(*) AS c FROM f2 WHERE source = 'src0'
         |  GROUP BY b),
         | cr2 AS (SELECT b, count(*) AS c FROM f2 GROUP BY b),
         | nt2 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ct2),
         | nr2 AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cr2),
         | nb2 AS (SELECT count(*) AS nb FROM cr2),
         | lr2 AS (SELECT cr2.b, CAST(
         |   log10(CAST(COALESCE(ct2.c, 0) + 1 AS DOUBLE) /
         |     CAST((SELECT n FROM nt2) + (SELECT nb FROM nb2) AS DOUBLE))
         |   - log10(CAST(cr2.c + 1 AS DOUBLE) /
         |     CAST((SELECT n FROM nr2) + (SELECT nb FROM nb2) AS DOUBLE))
         |   AS DECIMAL(28,12)) AS lg
         |  FROM cr2 LEFT JOIN ct2 ON cr2.b = ct2.b),
         | agg2 AS (SELECT f2.doc_id, f2.source, count(*) AS n_toks,
         |   CAST(sum(lr2.lg) AS DOUBLE) AS s
         |  FROM f2 JOIN lr2 ON f2.b = lr2.b GROUP BY f2.doc_id, f2.source),
         | sc2 AS (SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks,
         |   CAST(floor(s / n_toks * 1e4) AS BIGINT) AS score_q4 FROM agg2),
         | top2 AS (SELECT *, row_number() OVER
         |   (ORDER BY score_q4 DESC, doc_id) AS rank FROM sc2),
         | sel AS (SELECT top2.doc_id, top2.source, top2.n_toks,
         |   top2.score_q4, s2.lang FROM top2 JOIN surv s2
         |   ON top2.doc_id = s2.doc_id WHERE top2.rank <= $SelectNV3),
         | g3 AS (SELECT source, lang, CAST(sum(n_toks) AS BIGINT) AS avail
         |  FROM sel GROUP BY source, lang),
         | q3 AS (SELECT source, lang, avail,
         |   CAST($me AS BIGINT) * avail AS cap,
         |   CAST(floor(sqrt(CAST(avail AS DOUBLE)) * 1e9) AS BIGINT)
         |     AS wq FROM g3),
         | t3 AS (SELECT CAST(sum(wq) AS BIGINT) AS totw,
         |   CAST($bx AS BIGINT) * CAST(sum(avail) AS BIGINT) AS b
         |  FROM q3),
         | s3 AS (SELECT source, lang, avail, cap, wq,
         |   CAST(cap AS DOUBLE) * 1e9 / CAST(wq AS DOUBLE) AS r FROM q3),
         | w3 AS (SELECT source, lang, avail, cap, wq, r,
         |   coalesce(sum(cap) OVER (ORDER BY r, source, lang
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |     CAST(0 AS BIGINT)) AS cumcap,
         |   coalesce(sum(wq) OVER (ORDER BY r, source, lang
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |     CAST(0 AS BIGINT)) AS cumw,
         |   lag(cap) OVER (ORDER BY r, source, lang) AS prev_cap,
         |   lag(wq) OVER (ORDER BY r, source, lang) AS prev_wq
         |  FROM s3),
         | c3 AS (SELECT w3.*, t3.b, t3.totw, CAST(b - cumcap AS DOUBLE)
         |    * 1e9 / CAST(totw - cumw AS DOUBLE) AS lam FROM w3, t3),
         | lam3 AS (SELECT lam FROM c3 WHERE
         |   CAST(b - cumcap AS HUGEINT) * CAST(wq AS HUGEINT)
         |     <= CAST(cap AS HUGEINT) * CAST(totw - cumw AS HUGEINT)
         |   AND (prev_wq IS NULL OR
         |     CAST(b - cumcap AS HUGEINT) * CAST(prev_wq AS HUGEINT)
         |       >= CAST(prev_cap AS HUGEINT) * CAST(totw - cumw AS HUGEINT))
         |  ORDER BY r, source, lang LIMIT 1),
         | alloc3 AS (SELECT source, lang,
         |   least(cap, CAST(floor(lam3.lam * CAST(wq AS DOUBLE) / 1e9)
         |     AS BIGINT)) AS alloc_tokens FROM c3, lam3),
         | pk AS (SELECT doc_id, n_toks, SUM(n_toks) OVER
         |   (ORDER BY doc_id % $PackBuckets, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS cum FROM sel),
         | sh AS (SELECT doc_id, CAST(FLOOR((cum - n_toks) / $ShardBudget)
         |   AS BIGINT) AS shard FROM pk)
         | SELECT sel.doc_id, sel.source, sel.lang, sel.n_toks,
         |  sel.score_q4, sh.shard, alloc3.alloc_tokens
         | FROM sel JOIN sh ON sel.doc_id = sh.doc_id
         |  JOIN alloc3 ON sel.source = alloc3.source
         |   AND sel.lang = alloc3.lang
         | ORDER BY sel.doc_id""".stripMargin.replaceAll("\n", "")
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      // r20: scale-conditional fan-out of the checkpoint spine. The
      // cleaned/surv checkpoints inherit the documents scan's
      // partitioning, and a single-row-group (single-writer) corpus
      // leaves them at ONE partition — serializing the whole
      // downstream perplexity + DSIR chain. Fan out only when the
      // corpus is narrow AND large ([[graft.Scale.fanOutTarget]]):
      // at bench scale the decision is None and the r19-measured
      // plan (fan-out there cost +73 %) is byte-identical.
      // A repartition changes no row, and every consumer joins or
      // aggregates — output identical, CurationSpec pins parity.
      val fan = graft.Scale.fanOutTarget(docs)
      def fanned(df: DataFrame): DataFrame =
        fan.map(df.repartition(_)).getOrElse(df)
      // r19: the UNORDERED operator cores — the standalone queries'
      // final orderBys would be materialized inside these checkpoints
      // (each global sort also re-executes its child stage to sample
      // range bounds), and every consumer here joins or aggregates,
      // so the order bought nothing.
      val cleaned = fanned(graft.dedup.Dedup
        .removeSharedSpansCore(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "source", "lang"), "doc_id")
        .select(col("doc_id"), col("source"), col("lang"),
          col("cleaned_text").as("text")))
        .localCheckpoint()
      val surv = fanned(cleaned.join(
        graft.text.TextAnalysis.perplexityBucketsCore(cleaned)
          .filter(col("bucket") =!= "tail").select("doc_id"),
        "doc_id")).localCheckpoint()
      // sel is ≤ SelectNV3 rows BY CONSTRUCTION (the limit constant) —
      // collect it into a LOCAL relation instead of localCheckpoint
      // (r20): its three consumers (the alloc group summary, the
      // shard packing, the final join) then read a LocalTableScan,
      // whose windows/joins plan as trivial local stages, instead of
      // each paying a checkpoint-scan job. Driver traffic is bounded
      // by the constant at any corpus size (the q155 union-find /
      // guide §8 "decide with small rows" pattern); the DSIR chain
      // still runs distributed exactly once, materialized here.
      val selTop = graft.ml.Sampling.dsirScoresOver(surv)
        .orderBy(desc("score_q4"), asc("doc_id")).limit(SelectNV3)
        .join(surv.select("doc_id", "lang"), "doc_id")
      val sel = s.createDataFrame(
        java.util.Arrays.asList(selTop.collect(): _*), selTop.schema)
      val alloc = graft.ml.Sampling.waterFillOver(
        sel.groupBy("source", "lang")
          .agg(sum("n_toks").cast("long").as("avail")))
        .select(col("source"), col("lang"), col("alloc_tokens"))
      val shards = graft.text.TextAnalysis.packShardsOver(
        sel.select(col("doc_id"), col("n_toks").as("ntok")),
        ShardBudget, PackBuckets)
      sel.join(shards.select("doc_id", "shard"), "doc_id")
        .join(broadcast(alloc), Seq("source", "lang"))
        .select(col("doc_id"), col("source"), col("lang"), col("n_toks"),
          col("score_q4"), col("shard"), col("alloc_tokens"))
        .orderBy("doc_id")
    }
  }

  val defs: Seq[QueryDef] = Seq(pipeline, pipelineV2, audit, pipelineV3)
}
