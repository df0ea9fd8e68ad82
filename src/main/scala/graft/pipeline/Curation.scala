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
    val n = Tables.documents(s, d).select(col("doc_id"), col("source"),
      trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""), " +", " ")).as("t"))
    val q = n.filter(size(split(col("t"), " ")) >= MinWords)
    val keep = q.groupBy(md5(col("t")).as("fp"))
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
        sum(size(split(col("t"), " ")).cast("long")).as("n_tokens"))
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
    val quality = qualityFilter(docs)
    val keepers = quality.groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keeper"))
    val contaminated = graft.dedup.Dedup.benchShingleHits(docs, BenchMod)
      .select(col("doc_id")).withColumn("is_cont", lit(true))
    val clean = decontaminate(exactDedup(quality), docs)
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ranked = clean.withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("rk"))
    docs.select(col("doc_id"), col("text"))
      .withColumn("fp", md5(col("text")))
      .join(keepers, Seq("fp"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .join(ranked, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(size(split(col("text"), " ")) < MinWords, "dropped_quality")
          .when(col("doc_id") =!= col("keeper"), "dropped_duplicate")
          .when(col("doc_id") % BenchMod === 0, "dropped_benchmark")
          .when(col("is_cont"), "dropped_contaminated")
          .when(col("rk") > PerStratum, "dropped_sample")
          .otherwise("kept").as("status"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(pipeline, pipelineV2, audit)
}
