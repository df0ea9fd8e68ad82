package graft.text

import graft.{QueryDef, Tables}
import graft.dedup.Dedup.shingles
import graft.functions.HashFunctions.{minhash_sig, sig_matches}
import graft.functions.FrequencyAggregates.heavy_hitters
import graft.functions.SketchAggregates.minhash_union
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation over the
  * `documents` table: corpus stats, token counting, quality scoring,
  * n-gram language ID, bottom-k fingerprinting. All per-row work is
  * narrow (no shuffle except the explicit groupBys), so every query
  * scales linearly with corpus size.
  */
object TextAnalysis {

  private[graft] val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")

  private def toks(c: Column): Column = split(c, " ")

  /** Per-document surface statistics. Counts cast to long so Spark's
    * int `size`/`length` match DuckDB's int64 list/char lengths.
    */
  val textStats: QueryDef = QueryDef.sql(
    "q37_text_stats",
    // chars_per_word unrounded: an int/int quotient is bit-identical
    // across engines, while rounding it risks decimal half-ties
    """SELECT doc_id, n_chars, length(text) AS len,
      | len(string_split(text, ' ')) AS n_words,
      | len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
      | CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
      | AS chars_per_word
      | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"), col("n_chars"),
      length(col("text")).cast("long").as("len"),
      size(toks(col("text"))).cast("long").as("n_words"),
      size(array_distinct(toks(col("text")))).cast("long")
        .as("n_distinct_words"),
      (length(col("text")).cast("double") / size(toks(col("text"))))
        .as("chars_per_word"))
      .orderBy("doc_id")
  }

  /** Corpus rollup per language/source. Integer sums are exact in
    * both engines, so no DECIMAL dance is needed.
    */
  val langStats: QueryDef = QueryDef.sql(
    "q38_lang_stats",
    """SELECT lang, source, count(*) AS n_docs,
      | CAST(sum(n_chars) AS BIGINT) AS total_chars,
      | CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
      | FROM documents GROUP BY lang, source
      | ORDER BY lang, source""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        (sum("n_chars").cast("double") / count(lit(1))).as("avg_chars"))
      .orderBy("lang", "source")
  }

  /** Token counting: whitespace tokens plus a BPE-ish subword
    * estimate (runs of ≤4 letters — a cheap stand-in for learned
    * merges; the regex is codegen'd, no UDF).
    */
  val tokenCount: QueryDef = QueryDef.sql(
    "q39_token_count",
    """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
      | len(regexp_extract_all(text, '[a-z]+')) AS word_tokens,
      | len(regexp_extract_all(text, '[a-z]{1,4}')) AS subword_tokens
      | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
        .cast("long").as("word_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]{1,4}"), lit(0)))
        .cast("long").as("subword_tokens"))
      .orderBy("doc_id")
  }

  /** Quality scoring: stopword ratio (fluency proxy) blended with a
    * saturating length credit — the shape of the reference-free
    * quality filters used in corpus curation.
    */
  val qualityScore: QueryDef = QueryDef.sql(
    "q40_quality_score",
    s"""SELECT doc_id,
       | len(list_filter(string_split(text, ' '),
       |   t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")})))
       |   AS stop_cnt,
       | len(string_split(text, ' ')) AS n_words,
       |   0.5 * (CAST(len(list_filter(string_split(text, ' '),
       |     t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")})))
       |     AS DOUBLE) / len(string_split(text, ' ')))
       | + 0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0,
       |     1.0) AS quality
       | FROM documents ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val t = toks(col("text"))
    val stopCnt = size(filter(t, x => x.isin(stopwords: _*)))
    val nWords = size(t)
    Tables.documents(s, d).select(
      col("doc_id"),
      stopCnt.cast("long").as("stop_cnt"),
      nWords.cast("long").as("n_words"),
      // unrounded: every term is an exact-input IEEE op (int ratios,
      // power-of-two scalars), bit-identical across engines — see the
      // q03 note on decimal half-ties
      (lit(0.5) * (stopCnt.cast("double") / nWords) +
        lit(0.5) * least(nWords.cast("double") / 100.0, lit(1.0)))
        .as("quality"))
      .orderBy("doc_id")
  }

  /** Heuristic language ID: score each candidate language by hits
    * against a tiny stopword profile, pick the argmax (deterministic
    * tiebreak by profile order). Declarative argmax: array of
    * (score, lang) structs → array_max picks lexicographically.
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "est", "une"),
    "es" -> Seq("el", "los", "de", "y", "es", "una"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni", "ta"))
  val langId: QueryDef = QueryDef.sql(
    "q41_lang_id",
    s"""WITH profiles(plang, words) AS (VALUES ${langProfiles.map {
         case (l, ws) =>
           s"('$l', [${ws.map("'" + _ + "'").mkString(",")}])"
       }.mkString(", ")}),
       | scored AS (SELECT d.doc_id, d.lang, p.plang,
       |  len(list_filter(string_split(d.text, ' '),
       |    t -> list_contains(p.words, t))) AS score
       |  FROM documents d CROSS JOIN profiles p),
       | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |  ORDER BY score DESC, plang DESC) AS rn FROM scored)
       | SELECT doc_id, lang, plang AS predicted_lang, score
       | FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val t = toks(col("text"))
    val scored = array(langProfiles.map { case (lang, words) =>
      struct(
        size(filter(t, x => x.isin(words: _*))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      array_max(scored).getField("lang").as("predicted_lang"),
      array_max(scored).getField("score").cast("long").as("score"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: bottom-4 sketch of word-trigram shingle
    * hashes (order-invariant — Broder's sketching), collapsed to one
    * value. Equal fingerprints ⇒ near-identical shingle sets.
    *
    * The shingle hash is md5, not xxhash64: md5 is the one hash both
    * engines implement bit-identically, which upgrades this query
    * from rows-only to fully hash-checked — bottom-4 selection works
    * on the hex STRINGS (fixed-length lowercase hex sorts in numeric
    * order, so no base conversion is needed anywhere). At 100 TB the
    * swap back to the codegen'd xxhash64 kernel is a one-line change
    * (same shape, ~3× cheaper per shingle); the md5 spelling is the
    * cross-engine-verifiable reference.
    */
  val fingerprint: QueryDef = QueryDef.sql(
    "q42_fingerprint",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents),
      | sh AS (SELECT doc_id, list_distinct(
      |   [array_to_string(toks[i:i+2], ' ')
      |    for i in generate_series(1, greatest(len(toks)-2, 1))]) AS shs
      |  FROM t),
      | hs AS (SELECT doc_id, list_sort([md5(x) for x in shs]) AS hh
      |  FROM sh)
      | SELECT doc_id, md5(array_to_string(hh[1:4], ',')) AS fingerprint,
      |  array_to_string(hh[1:4], ',') AS sketch
      | FROM hs ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val hashes = array_sort(
      transform(shingles(col("text"), 3), sh => md5(sh)))
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(concat_ws(",", slice(hashes, 1, 4))).as("fingerprint"),
      concat_ws(",", slice(hashes, 1, 4)).as("sketch"))
      .orderBy("doc_id")
  }

  /** Token-window document chunking — the shape every LLM training
    * pipeline needs: fixed-size overlapping chunks (size 64, stride
    * 48) per document. Pure narrow ops (split + sequence + explode +
    * slice): no shuffle at all, so at 100 TB it runs scan-speed and
    * parallelism is the input split count.
    */
  val chunk: QueryDef = QueryDef.sql(
    "q52_doc_chunks",
    """SELECT doc_id, CAST(off / 48 AS BIGINT) AS chunk_idx,
      |  array_to_string(toks[off + 1 : off + 64], ' ') AS chunk_text,
      |  CAST(len(toks[off + 1 : off + 64]) AS BIGINT) AS n_tokens
      |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |  LATERAL (SELECT unnest(generate_series(0, len(toks) - 1, 48)) AS off)
      |ORDER BY doc_id, chunk_idx""".stripMargin.replaceAll("\n", " ")
  ) { (s, d) =>
    val t = split(col("text"), " ")
    Tables.documents(s, d)
      .select(col("doc_id"), t.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(48))).as("off"))
      .select(col("doc_id"),
        (col("off") / 48).cast("long").as("chunk_idx"),
        array_join(slice(col("toks"), col("off") + 1, lit(64)), " ")
          .as("chunk_text"),
        size(slice(col("toks"), col("off") + 1, lit(64))).cast("long")
          .as("n_tokens"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Deterministic stratified sampling: at most K docs per
    * (lang, source) stratum, chosen by md5-hashed order — the standard
    * way a training-mix pipeline downsamples over-represented strata
    * reproducibly (same corpus → same sample, no RNG state). One
    * window shuffle; Spark 4 plans the rank filter as
    * WindowGroupLimit, so each partition keeps K rows early instead
    * of fully sorting every stratum.
    */
  val stratifiedSample: QueryDef = QueryDef.sql(
    "q54_stratified_sample",
    """SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS rk
      | FROM (SELECT doc_id, lang, source, row_number() OVER
      |   (PARTITION BY lang, source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |   FROM documents) t
      | WHERE rk <= 10 ORDER BY lang, source, rk""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("doc_id"), col("lang"), col("source"),
        col("rk").cast("long").as("rk"))
      .orderBy("lang", "source", "rk")
  }

  /** PII redaction — a standard curation pass before any text reaches
    * a training mix. The synthetic corpus carries no PII, so the query
    * deterministically plants an email + phone per document and then
    * redacts them: the interesting part (regex scan + global replace +
    * per-doc counts, all codegen'd narrow ops, zero shuffle) is real;
    * the md5 of the redacted text makes the full output hash-gateable
    * without emitting long strings.
    */
  val piiRedact: QueryDef = {
    val emailRe = """[a-z0-9]+@[a-z]+\.[a-z]+"""
    val phoneRe = "[0-9]{3}-[0-9]{4}"
    QueryDef.sql(
      "q59_pii_redact",
      s"""WITH aug AS (SELECT doc_id,
         |  text || ' contact user' || doc_id || '@example.com or 555-' ||
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
         |  FROM documents)
         | SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$emailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '$phoneRe')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(t, '$emailRe', '<EMAIL>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g')) AS redacted_md5
         | FROM aug ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
    ) { (s, d) =>
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      Tables.documents(s, d).select(col("doc_id"), aug.as("t"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phoneRe), lit(0)))
            .cast("long").as("n_phones"),
          md5(regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("redacted_md5"))
        .orderBy("doc_id")
    }
  }

  /** Per-language top terms by document frequency (stopwords dropped) —
    * the vocabulary profile a mix designer reads before weighting
    * sources. explode → two-level aggregate → WindowGroupLimit top-k;
    * the token explode is narrow, so the only shuffles are the
    * (lang, term) aggregate and the per-lang window.
    */
  val topTerms: QueryDef = QueryDef.sql(
    "q61_top_terms",
    s"""WITH tok AS (SELECT lang,
       |  unnest(list_distinct(string_split(text, ' '))) AS t FROM documents),
       | df AS (SELECT lang, t, count(*) AS doc_freq FROM tok
       |  WHERE t NOT IN (${stopwords.map("'" + _ + "'").mkString(",")})
       |  GROUP BY lang, t),
       | r AS (SELECT *, row_number() OVER (PARTITION BY lang
       |  ORDER BY doc_freq DESC, t) AS rk FROM df)
       | SELECT lang, t AS term, doc_freq, CAST(rk AS INT) AS rk
       | FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val w = Window.partitionBy("lang").orderBy(desc("doc_freq"), asc("t"))
    Tables.documents(s, d)
      .select(col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      .filter(!col("t").isin(stopwords: _*))
      .groupBy("lang", "t").agg(count(lit(1)).as("doc_freq"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("t").as("term"), col("doc_freq"), col("rk"))
      .orderBy("lang", "rk")
  }

  /** Distinct (lang, token) row bound under which q63 serves the
    * EXACT pairwise vocabulary Jaccard (a linear token self-join
    * keyed by token — quadratic only in languages sharing a token,
    * linear in vocabulary); above it the minhash sketch path. The
    * routing probe checks TOTAL token count against this bound
    * (total ≥ distinct, so the cheap signal is conservative).
    * Override with `spark.graft.exactVocabLimit`.
    */
  def exactVocabLimit(s: SparkSession): Long =
    s.conf.getOption("spark.graft.exactVocabLimit")
      .map(_.toLong).getOrElse(20000000L)

  private def q63VocabOk(s: SparkSession, d: String): Boolean =
    // Routed on TOTAL token count, not distinct (lang, token) rows:
    // the distinct count costs the same explode+distinct shuffle as
    // the exact answer itself (the r11 ADVICE finding), while the
    // total is a narrow scan + sum. Total ≥ distinct, so the proxy
    // is a sound upper bound — it can only err toward the sketch
    // tier, never route an unaffordable corpus to the exact join.
    graft.Scale.within(s, s"$d#q63_vocab", exactVocabLimit(s))(
      // coalesce: sum over zero rows is null — an empty corpus routes
      // to the (trivially affordable) exact regime, not an NPE
      Tables.documents(s, d)
        .select(size(toks(col("text"))).cast("long").as("n"))
        .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0))

  /** The raw minhash tier measured by the q63 gate (estimate within
    * 4σ of exact), independent of which regime the registered query
    * serves: per-language vocabulary sketch via the custom
    * [[graft.functions.MinHashUnion]] aggregate (one narrow pass,
    * k·8 bytes per group, map-side partials), pairwise estimates
    * from sketches alone — no token-pair work at any corpus size.
    */
  def minhashVocabJaccard(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val rowSig = minhash_sig(
      transform(toks(col("text")), t => xxhash64(t)), k)
    val sk = Tables.documents(s, d)
      .select(col("lang"), rowSig.as("sig"))
      .groupBy("lang").agg(minhash_union(col("sig"), k).as("sketch"))
    val a = sk.select(col("lang").as("lang_a"), col("sketch").as("sk_a"))
    val b = sk.select(col("lang").as("lang_b"), col("sketch").as("sk_b"))
    a.join(b, col("lang_a") < col("lang_b"))
      .select(col("lang_a"), col("lang_b"),
        // m/k with k a power of two is binary-exact — emit raw per
        // the rounding-parity discipline
        (sig_matches(col("sk_a"), col("sk_b")).cast("double") / k)
          .as("est_vocab_jaccard"))
  }

  /** Corpus-level similarity profile with a REGIME (the q68
    * graduation pattern): pairwise per-language vocabulary Jaccard —
    * EXACT (token equi self-join, floor-grid ppm quantized so both
    * engines decide on BIGINT division) while the distinct
    * (lang, token) table fits [[exactVocabLimit]], the minhash
    * sketch above it (the only shape with no token-pair work at
    * 100 TB — [[minhashVocabJaccard]], which the gate keeps
    * measuring either way). Zero-overlap pairs appear in both
    * regimes (size cross join + left join, languages are few).
    */
  val corpusSketch: QueryDef = QueryDef.sqlCutover(
    "q63_corpus_sketch",
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      | toks AS (SELECT DISTINCT lang, t FROM tok),
      | sizes AS (SELECT lang, count(*) AS n FROM toks GROUP BY lang),
      | inter AS (SELECT a.lang AS lang_a, b.lang AS lang_b,
      |  count(*) AS ni FROM toks a JOIN toks b
      |  ON a.t = b.t AND a.lang < b.lang GROUP BY 1, 2)
      | SELECT sa.lang AS lang_a, sb.lang AS lang_b,
      |  CAST(COALESCE(i.ni, 0) * 1000000
      |    // (sa.n + sb.n - COALESCE(i.ni, 0)) AS BIGINT) AS jaccard_q6,
      |  'exact' AS regime
      | FROM sizes sa JOIN sizes sb ON sa.lang < sb.lang
      | LEFT JOIN inter i ON i.lang_a = sa.lang AND i.lang_b = sb.lang
      | ORDER BY lang_a, lang_b""".stripMargin.replaceAll("\n", "")
  ) { (s, d) => !q63VocabOk(s, d) } { (s, d) =>
    if (q63VocabOk(s, d)) {
      val tokTbl = Tables.documents(s, d)
        .select(col("lang"), explode(toks(col("text"))).as("t"))
        .distinct()
      val sizes = tokTbl.groupBy("lang").agg(count(lit(1)).as("n"))
      val inter = tokTbl.select(col("lang").as("lang_a"), col("t"))
        .join(tokTbl.select(col("lang").as("lang_b"), col("t")), "t")
        .filter(col("lang_a") < col("lang_b"))
        .groupBy("lang_a", "lang_b").agg(count(lit(1)).as("ni"))
      sizes.select(col("lang").as("lang_a"), col("n").as("na"))
        .join(sizes.select(col("lang").as("lang_b"), col("n").as("nb")),
          col("lang_a") < col("lang_b"))
        .join(inter, Seq("lang_a", "lang_b"), "left")
        .select(col("lang_a"), col("lang_b"),
          expr("coalesce(ni, 0L) * 1000000L div " +
            "(na + nb - coalesce(ni, 0L))").as("jaccard_q6"),
          lit("exact").as("regime"))
        .orderBy("lang_a", "lang_b")
    } else
      minhashVocabJaccard(s, d)
        .select(col("lang_a"), col("lang_b"),
          (round(col("est_vocab_jaccard") * 1000000).cast("long"))
            .as("jaccard_q6"),
          lit("approx").as("regime"))
        .orderBy("lang_a", "lang_b")
  }

  /** Repetition scoring — the Gopher-style quality rule that flags
    * template/spam documents by how much their mode token dominates:
    * rep_ratio = max term frequency / token count. Two shuffles — on
    * (doc_id, term) for the frequency table, then on doc_id over the
    * already-collapsed per-term rows (distinct terms per doc, not
    * tokens) — no joins, no windows.
    */
  val repetition: QueryDef = QueryDef.sql(
    "q64_repetition",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      | tf AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t),
      | agg AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_tf,
      |  CAST(sum(c) AS BIGINT) AS n_toks FROM tf GROUP BY doc_id)
      | SELECT doc_id, max_tf, n_toks,
      |  CAST(max_tf AS DOUBLE) / n_toks AS rep_ratio
      | FROM agg ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("max_tf"), sum("c").as("n_toks"))
      .select(col("doc_id"), col("max_tf"), col("n_toks"),
        // unrounded on purpose: k/n of small integers can sit exactly
        // on a decimal half-tie where engines' round() rules diverge;
        // the raw IEEE quotient is bit-identical everywhere
        (col("max_tf").cast("double") / col("n_toks")).as("rep_ratio"))
      .orderBy("doc_id")
  }

  /** Unigram-LM surprisal — the model-based quality signal every
    * curation pipeline layers on top of the heuristic rules: docs are
    * scored by the mean negative log-probability of their tokens
    * under the corpus unigram distribution (high = unusual/garbled,
    * low = templated). The "model" is one grouped count; scoring is a
    * broadcast join of that vocabulary back onto the token stream —
    * at 100 TB the vocab table is tiny relative to the corpus, so the
    * corpus shuffles only for the (doc) aggregate. The per-doc log
    * sum goes through DECIMAL(28,12) (order-independent), and the
    * output rounds at 4 (log10 is libm-derived — rounding absorbs ulp
    * differences per the parity discipline).
    */
  val surprisal: QueryDef = QueryDef.sql(
    "q65_unigram_surprisal",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      | tf AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
      | tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tf),
      | scored AS (SELECT tok.doc_id,
      |  CAST(log10(CAST(tf.c AS DOUBLE)) AS DECIMAL(28,12)) AS lg
      |  FROM tok JOIN tf ON tok.t = tf.t),
      | agg AS (SELECT doc_id, count(*) AS n_toks,
      |  CAST(sum(lg) AS DOUBLE) AS sum_lg FROM scored GROUP BY doc_id)
      | SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
      |  round(log10((SELECT CAST(n AS DOUBLE) FROM tot)) - sum_lg / n_toks,
      |    4) AS surprisal
      | FROM agg ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val tf = tok.groupBy("t").agg(count(lit(1)).as("c"))
    // corpus token total rides in as a broadcast single-row join, not
    // a driver .head — the tf derivation isn't re-run for a scalar
    val total = tf.agg(sum("c").as("total"))
    tok.join(broadcast(tf), "t")
      .select(col("doc_id"),
        log10(col("c").cast("double")).cast("decimal(28,12)").as("lg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("lg").cast("double").as("sum_lg"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_toks"),
        round(log10(col("total").cast("double")) - col("sum_lg") / col("n_toks"), 4)
          .as("surprisal"))
      .orderBy("doc_id")
  }

  /** Sequence packing — assign documents to fixed-token-budget
    * training shards: a deterministic global order (bucket-major, so
    * the order itself is parallelizable), a running token total over
    * it, and `shard = floor(start_offset / budget)` (next-fit with
    * straddle: a doc crossing a budget boundary belongs to the shard
    * it starts in).
    *
    * The running total is the classic TWO-PHASE distributed prefix
    * sum — intra-bucket window (shuffles on the bucket key, scales
    * out) plus a bucket-offset table computed from the P per-bucket
    * totals (the ONLY single-partition window runs over P=32 rows,
    * constant at any corpus size, then broadcasts back). A naive
    * `SUM OVER (ORDER BY ...)` with no PARTITION BY — the oracle's
    * spelling — would funnel 100 TB through one task.
    */
  val packShards: QueryDef = {
    val budget = 1024L // tokens per shard
    val nBuckets = 32
    QueryDef.sql(
      "q67_pack_shards",
      s"""SELECT doc_id, ntok,
         | CAST(FLOOR((cum - ntok) / $budget) AS BIGINT) AS shard
         | FROM (SELECT doc_id, ntok,
         |   SUM(ntok) OVER (ORDER BY doc_id % $nBuckets, doc_id
         |     ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM (SELECT doc_id, len(string_split(text, ' ')) AS ntok
         |   FROM documents))
         | ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
    ) { (s, d) =>
      packShardsOver(Tables.documents(s, d).select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("ntok")), budget, nBuckets)
    }
  }

  /** The q67 packing transform over any `(doc_id, ntok)` frame —
    * exposed so the q153 curation composition can pack its selected
    * set. Two-phase distributed prefix sum; see [[packShards]].
    */
  def packShardsOver(docs: DataFrame, budget: Long,
      nBuckets: Int): DataFrame = {
    val base = docs.select(col("doc_id"),
      col("ntok").cast("long").as("ntok"),
      pmod(col("doc_id"), lit(nBuckets)).as("bucket"))
    val wIntra = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = base.withColumn("icum", sum("ntok").over(wIntra))
    // P rows total: the exclusive prefix of per-bucket sums
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("bucket").agg(sum("ntok").as("btot"))
      .withColumn("off", coalesce(sum("btot").over(wOff), lit(0L)))
      .select("bucket", "off")
    intra.join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("ntok"),
        // integer-valued longs below 2^53: the double quotient and
        // its floor are exact, matching DuckDB's float division
        floor((col("icum") + col("off") - col("ntok")) / lit(budget))
          .cast("long").as("shard"))
      .orderBy("doc_id")
  }

  /** Corpus mixing to target proportions — the reweighting step of a
    * training mix: given integer weights per language (en 4 : de 2 :
    * fr 2 : es 1 : zh 1, tenths), take the LARGEST total the corpus
    * can supply at exactly those proportions (t = min over strata of
    * n·10/w), then select each stratum's quota deterministically by
    * md5 order. All integer-exact arithmetic, so the selection is
    * oracle-able.
    *
    * The per-stratum rank does NOT use one window partition per
    * language — at corpus scale a single language is a large fraction
    * of all rows and a per-lang window funnels it through one
    * reducer. Instead the q67 two-phase pattern per stratum: rank
    * within (lang, md5-prefix-bucket) — 256-way parallel — plus a
    * lang×256-row offset table; string order of md5 makes
    * bucket-major order equal flat md5 order, so the result matches
    * the oracle's naive single-window spelling row-for-row.
    */
  val mixProportions: QueryDef = {
    val mix = Seq("en" -> 4, "de" -> 2, "fr" -> 2, "es" -> 1, "zh" -> 1)
    val mixVals = mix.map { case (l, w) => s"('$l', $w)" }.mkString(", ")
    QueryDef.sql(
      "q69_mix_proportions",
      s"""WITH w(lang, wt) AS (VALUES $mixVals),
         | c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         | t AS (SELECT min(floor(n * 10 / wt)) AS t FROM c JOIN w USING (lang)),
         | caps AS (SELECT lang, CAST(floor(wt * t / 10) AS BIGINT) AS cap
         |   FROM w, t),
         | r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
         |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents)
         | SELECT r.doc_id, r.lang, CAST(r.rk AS BIGINT) AS rk
         | FROM r JOIN caps USING (lang) WHERE rk <= cap
         | ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
    ) { (s, d) =>
      val wdf = {
        import s.implicits._
        mix.toDF("lang", "wt")
      }
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val t = counts.join(wdf, "lang")
        .agg(min(floor(col("n") * 10 / col("wt"))).as("t"))
      val caps = wdf.crossJoin(broadcast(t))
        .select(col("lang"),
          floor(col("wt") * col("t") / lit(10)).cast("long").as("cap"))
      val hashed = docs
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("bkt", substring(col("h"), 1, 2))
      val wIntra = Window.partitionBy("lang", "bkt")
        .orderBy(col("h"), col("doc_id"))
      val intra = hashed.withColumn("irk", row_number().over(wIntra))
      val wOff = Window.partitionBy("lang").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = hashed.groupBy("lang", "bkt").agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(sum("bn").over(wOff), lit(0L)))
        .select("lang", "bkt", "off")
      intra.join(broadcast(offs), Seq("lang", "bkt"))
        .withColumn("rk", col("off") + col("irk"))
        .join(broadcast(caps), "lang")
        .filter(col("rk") <= col("cap"))
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy("doc_id")
    }
  }

  /** Sub-document boilerplate removal (the CCNet/RefinedWeb-style
    * pass that document-level dedup can't do): split every doc into
    * non-overlapping 32-token chunks, count how many DISTINCT docs
    * each exact chunk occurs in, and drop chunks that recur across
    * documents — headers, footers, templates. Reported per doc as
    * kept/boilerplate chunk counts and surviving token count.
    *
    * Scale shape: one narrow chunking pass, one hash-agg on the chunk
    * hash (map-side partials), one equi-join back on the hash, one
    * doc rollup. The chunk-hash shuffle is the cost — ids+hash only,
    * never chunk text.
    */
  val boilerplate: QueryDef = {
    val W = 32
    QueryDef.sql(
      "q70_boilerplate",
      s"""WITH c AS (
         | SELECT doc_id, md5(array_to_string(toks[off + 1 : off + $W], ' ')) AS h,
         |   len(toks[off + 1 : off + $W]) AS n
         | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |  LATERAL (SELECT unnest(generate_series(0, len(toks) - 1, $W)) AS off)),
         | df AS (SELECT h, count(DISTINCT doc_id) AS docs FROM c GROUP BY h)
         | SELECT c.doc_id,
         |  CAST(count(*) FILTER (WHERE docs = 1) AS BIGINT) AS kept_chunks,
         |  CAST(count(*) FILTER (WHERE docs > 1) AS BIGINT) AS boiler_chunks,
         |  CAST(COALESCE(sum(n) FILTER (WHERE docs = 1), 0) AS BIGINT) AS kept_tokens
         | FROM c JOIN df USING (h)
         | GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
        .replaceAll("\n", "")
    ) { (s, d) =>
      val c = Tables.documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), size(col("toks")) - 1, lit(W)))
            .as("off"))
        .select(col("doc_id"),
          md5(array_join(slice(col("toks"), col("off") + 1, lit(W)), " "))
            .as("h"),
          size(slice(col("toks"), col("off") + 1, lit(W))).as("n"))
      val freq = c.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("docs"))
      c.join(freq, "h")
        .groupBy("doc_id")
        .agg(
          sum(when(col("docs") === 1, 1).otherwise(0)).as("kept_chunks"),
          sum(when(col("docs") > 1, 1).otherwise(0)).as("boiler_chunks"),
          sum(when(col("docs") === 1, col("n")).otherwise(0))
            .cast("long").as("kept_tokens"))
        .orderBy("doc_id")
    }
  }

  /** q74 — bigram-LM surprisal, the second-order refinement of q65:
    * docs scored by the mean negative log-probability of their
    * bigrams under an add-one-smoothed corpus bigram model,
    * P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁)+V). A unigram model calls
    * repeated rare words "surprising" even in fluent context; the
    * bigram model scores TRANSITIONS, which is what separates
    * garbled/shuffled text from merely unusual vocabulary — the
    * standard pre-perplexity quality gate when no trained LM is at
    * hand.
    *
    * Same scale shape as q65: the bigram and context-count tables are
    * vocabulary-sized (tiny vs the corpus) and broadcast back onto
    * the token stream; V rides as a broadcast one-row cross join, not
    * a driver collect; the only corpus-wide shuffle is the per-doc
    * aggregate. Log sums go through DECIMAL(28,12) (order-
    * independent), output rounds at 4 (absorbs libm ulps). Docs with
    * fewer than two tokens have no bigrams and drop out (both
    * engines, by construction of the inner join).
    */
  val bigramSurprisal: QueryDef = QueryDef.sql(
    "q74_bigram_surprisal",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |  FROM documents),
      | bg AS (SELECT doc_id, unnest([toks[i-1] || ' ' || toks[i]
      |   for i in generate_series(2, len(toks))]) AS b FROM t),
      | c2 AS (SELECT b, count(*) AS c2 FROM bg GROUP BY b),
      | c1 AS (SELECT w, count(*) AS c1 FROM
      |   (SELECT unnest(toks) AS w FROM t) GROUP BY w),
      | v AS (SELECT count(*) AS v FROM c1),
      | scored AS (SELECT bg.doc_id,
      |   CAST(log10(CAST(c2.c2 + 1 AS DOUBLE) /
      |     CAST(c1.c1 + (SELECT v FROM v) AS DOUBLE))
      |    AS DECIMAL(28,12)) AS lg
      |  FROM bg JOIN c2 ON bg.b = c2.b
      |   JOIN c1 ON split_part(bg.b, ' ', 1) = c1.w),
      | agg AS (SELECT doc_id, count(*) AS n_bigrams,
      |   CAST(sum(lg) AS DOUBLE) AS sum_lg FROM scored GROUP BY doc_id)
      | SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  round(-sum_lg / n_bigrams, 4) AS surprisal
      | FROM agg ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("toks"))
    val bg = t.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(2), size(col("toks"))),
        i => concat_ws(" ", element_at(col("toks"), i - 1),
          element_at(col("toks"), i)))).as("b"))
    val c2 = bg.groupBy("b").agg(count(lit(1)).as("c2"))
    val c1 = t.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    bg.join(broadcast(c2), "b")
      .join(broadcast(c1.withColumnRenamed("w", "w1")),
        substring_index(col("b"), " ", 1) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log10((col("c2") + 1).cast("double") /
          (col("c1") + col("v")).cast("double"))
          .cast("decimal(28,12)").as("lg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("lg").cast("double").as("sum_lg"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("sum_lg") / col("n_bigrams"), 4).as("surprisal"))
      .orderBy("doc_id")
  }

  /** q78 — tf-idf top terms per document: q61 ranks terms per
    * LANGUAGE by raw frequency; this ranks per DOCUMENT with the
    * inverse-document-frequency weight that suppresses corpus-wide
    * filler — the classic keyword/topic-surfacing operator (and the
    * feature weighting under sparse retrieval).
    *
    * Scale shape: tf is one (doc, term) hash aggregate; df derives
    * from tf with a second vocabulary-sized aggregate; both df and
    * the corpus count broadcast back onto tf (vocab ≪ corpus); the
    * per-doc top-5 is a WindowGroupLimit-bounded rank. log10 is
    * libm-derived → round(4) per the parity discipline.
    */
  val tfidfTerms: QueryDef = QueryDef.sql(
    "q78_tfidf_terms",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      | tf AS (SELECT doc_id, t, count(*) AS tf FROM tok
      |  GROUP BY doc_id, t),
      | df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
      | n AS (SELECT count(*) AS n FROM documents),
      | scored AS (SELECT tf.doc_id, tf.t, tf.tf,
      |   CAST(tf.tf AS DOUBLE) *
      |     log10(CAST((SELECT n FROM n) AS DOUBLE) / df.df) AS tfidf
      |  FROM tf JOIN df ON tf.t = df.t),
      | r AS (SELECT doc_id, t, tf, tfidf, row_number() OVER
      |   (PARTITION BY doc_id ORDER BY tfidf DESC, t) AS rank
      |  FROM scored)
      | SELECT doc_id, t AS term, CAST(tf AS BIGINT) AS tf,
      |  round(tfidf, 4) AS tfidf, CAST(rank AS INT) AS rank
      | FROM r WHERE rank <= 5
      | ORDER BY doc_id, rank""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val tf = tok.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("t"))
    tf.join(broadcast(df), "t")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("t"), col("tf"),
        (col("tf").cast("double") *
          log10(col("n").cast("double") / col("df"))).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("t").as("term"), col("tf"),
        round(col("tfidf"), 4).as("tfidf"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  /** q85 — deterministic weighted Bernoulli sampling: keep each doc
    * with probability `w` (here a length-derived weight; any [0,1)
    * score column works — quality, dedup keeper-ness, language
    * priority). The coin is the doc's md5 prefix compared against the
    * weight mapped to the same 32-bit hex grid — pure per-row
    * arithmetic, zero shuffle, zero RNG state, and REPRODUCIBLE:
    * rerunning the pipeline (or re-sampling a replicated shard on
    * another executor) keeps exactly the same rows, which is what
    * separates a curation sampler from `rand() < w`. Corpus-mixing
    * quotas (q69) pick exact counts; this is the per-row-probability
    * complement.
    */
  val weightedSample: QueryDef = QueryDef.sql(
    "q85_weighted_sample",
    """WITH w AS (SELECT doc_id, n_chars,
      |  least(CAST(0.95 AS DOUBLE), CAST(n_chars AS DOUBLE)/1000.0)
      |    AS w FROM documents)
      | SELECT doc_id, n_chars, w FROM w
      | WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |  < lpad(lower(hex(CAST(floor(w*4294967296) AS BIGINT))), 8, '0')
      | ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        least(lit(0.95), col("n_chars").cast("double") / 1000.0).as("w"))
      .filter(substring(md5(col("doc_id").cast("string")), 1, 8) <
        lpad(lower(hex(floor(col("w") * 4294967296L))), 8, "0"))
      .orderBy("doc_id")
  }

  /** Two-pass EXACT heavy hitters — the bounded-state spelling of
    * corpus term frequency for key spaces too large to shuffle.
    * Pass 1: one narrow scan folds into a single k=64-counter
    * Misra–Gries summary ([[graft.functions.MisraGries]], map-side
    * partials, k counters per partition — never a vocabulary-sized
    * hash aggregate). The MG guarantee makes the summary a SUPERSET
    * of every token with frequency > N/(k+1) ⊇ > N/30. Pass 2:
    * recount exactly, but only over the ≤ 64 surviving candidates
    * (broadcast semi-join keeps the second aggregate's key space at
    * most k), then apply the threshold `cnt * 30 > N` in integer
    * arithmetic. The superset guarantee is what makes the two-pass
    * result EXACT — hence a full DuckDB oracle despite the sketch in
    * the middle.
    */
  val heavyHitters: QueryDef = QueryDef.sql(
    "q88_heavy_hitters",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      | tot AS (SELECT count(*) AS n FROM tok)
      | SELECT t AS term, count(*) AS cnt FROM tok GROUP BY t
      | HAVING count(*) * 30 > (SELECT n FROM tot)
      | ORDER BY cnt DESC, term""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("t"))
    val sketch = tok
      .agg(heavy_hitters(col("t"), 64).as("hh"), count(lit(1)).as("n"))
    val cand = sketch
      .select(col("n"), explode(col("hh")).as("e"))
      .select(col("n"), col("e.item").as("t"))
    tok.join(broadcast(cand), "t")
      .groupBy("t", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(30L) > col("n"))
      .select(col("t").as("term"), col("cnt"))
      .orderBy(desc("cnt"), asc("term"))
  }

  /** Quality percentile gate: keep documents at or above their
    * language's 75th-percentile quality score (q40's formula) — the
    * "keep the best quartile per language" curation cut, with the
    * threshold DERIVED from the corpus rather than hand-set, so one
    * knob survives distribution shift across languages and crawls.
    *
    * This spelling computes the per-language threshold exactly (one
    * row_number window per language = one shuffle; threshold row
    * broadcast back). At 100 TB the drop-in replacement for the
    * threshold CTE is the KLL sketch aggregate (q66,
    * [[graft.functions.KllQuantiles]]) — same join contract, sketch
    * error instead of a per-language sort; this exact spelling is
    * what the oracle can check (and what the sketch is gated against
    * in QuantileSpec).
    */
  val qualityGate: QueryDef = QueryDef.sql(
    "q95_quality_gate",
    s"""WITH q AS (SELECT doc_id, lang,
       |   0.5 * (CAST(len(list_filter(string_split(text, ' '),
       |     t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")})))
       |     AS DOUBLE) / len(string_split(text, ' ')))
       |   + 0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE)
       |     / 100.0, 1.0) AS quality
       |   FROM documents),
       | r AS (SELECT lang, quality, row_number() OVER (PARTITION BY lang
       |   ORDER BY quality, doc_id) AS rk,
       |   count(*) OVER (PARTITION BY lang) AS n FROM q),
       | thr AS (SELECT lang, quality AS thr FROM r
       |   WHERE rk = CAST(ceil(0.75 * n) AS BIGINT))
       | SELECT q.doc_id, q.lang, q.quality, thr.thr
       | FROM q JOIN thr USING (lang) WHERE q.quality >= thr.thr
       | ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val t = toks(col("text"))
    val stopCnt = size(filter(t, x => x.isin(stopwords: _*)))
    val nWords = size(t)
    val q = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      (lit(0.5) * (stopCnt.cast("double") / nWords) +
        lit(0.5) * least(nWords.cast("double") / 100.0, lit(1.0)))
        .as("quality"))
    val w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    val thr = q
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .filter(col("rk") === ceil(lit(0.75) * col("n")).cast("long"))
      .select(col("lang"), col("quality").as("thr"))
    q.join(broadcast(thr), "lang")
      .filter(col("quality") >= col("thr"))
      .select(col("doc_id"), col("lang"), col("quality"), col("thr"))
      .orderBy("doc_id")
  }

  /** Window size / document-frequency floor for [[repeatedNgrams]].
    * Baked into the oracle string, so constants rather than conf
    * dials; the production knobs are the same two numbers.
    */
  private val NgramN = 5
  private val NgramMinDocs = 3

  /** Corpus-frequent n-gram masking stats — the token-level reading
    * of substring-dedup (Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better"): a 5-gram that recurs across
    * ≥3 DISTINCT documents is template/boilerplate text, and a
    * document whose positions are mostly such n-grams is a template
    * instance (q70 catches this at chunk granularity; this catches
    * spans that straddle chunk boundaries). Emits per-doc totals, the
    * flagged-position count, and the flagged fraction — the score a
    * curation pass thresholds on.
    *
    * Scale shape: two passes over the corpus (the n-gram explode
    * feeds both the document-frequency aggregate and the flag join —
    * at 100 TB persist the exploded table or accept the re-scan; the
    * explode itself is narrow). Per-doc totals need no explode at all
    * (`size - n + 1` arithmetic). The frequent set is the join's
    * build side: at this threshold it is heavy-hitter-sized, so it
    * broadcasts; if a corpus pushes it past broadcast range, the
    * q68 pattern (bloom over the frequent hashes) is the drop-in
    * next tier. Strings keep the oracle exact; hashing the n-grams
    * (fingerprint's xxhash64 route) halves the shuffle bytes when
    * collisions are acceptable.
    */
  val repeatedNgrams: QueryDef = QueryDef.sql(
    "q98_repeated_ngrams",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |   FROM documents WHERE len(string_split(text, ' ')) >= $NgramN),
       | g AS (SELECT doc_id, array_to_string(toks[i:i+${NgramN - 1}], ' ')
       |   AS ng FROM t, UNNEST(generate_series(1, len(toks) - ${NgramN - 1}))
       |   AS u(i)),
       | freq AS (SELECT ng FROM g GROUP BY ng
       |   HAVING count(DISTINCT doc_id) >= $NgramMinDocs),
       | tot AS (SELECT doc_id,
       |   CAST(len(toks) - ${NgramN - 1} AS BIGINT) AS n_ngrams FROM t),
       | fl AS (SELECT doc_id, count(*) AS n_flagged
       |   FROM g JOIN freq USING (ng) GROUP BY doc_id)
       | SELECT tot.doc_id, n_ngrams,
       |   COALESCE(n_flagged, 0) AS n_flagged,
       |   CAST(COALESCE(n_flagged, 0) AS DOUBLE) / n_ngrams
       |     AS flagged_frac
       | FROM tot LEFT JOIN fl USING (doc_id)
       | ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    repeatedNgramStats(Tables.documents(s, d), NgramN, NgramMinDocs)
      .orderBy("doc_id")
  }

  /** Library entry behind q98 — per-doc corpus-frequent n-gram
    * coverage over any frame with (`doc_id`, `text`). See
    * [[repeatedNgrams]] for the scale discussion.
    */
  def repeatedNgramStats(documents: org.apache.spark.sql.DataFrame,
      n: Int, minDocs: Int): org.apache.spark.sql.DataFrame = {
    val docs = documents
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
    // Positions, not distinct n-grams: the flagged FRACTION weights a
    // template span by how much of the document it covers.
    val g = docs.select(col("doc_id"),
      explode(transform(
        sequence(lit(1), size(col("toks")) - lit(n - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("ng"))
    val freq = g.groupBy("ng")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs).select("ng")
    val tot = docs.select(col("doc_id"),
      (size(col("toks")) - lit(n - 1)).cast("long").as("n_ngrams"))
    val flagged = g.join(broadcast(freq), "ng")
      .groupBy("doc_id").agg(count(lit(1)).as("n_flagged"))
    tot.join(flagged, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_flagged"))
      .select(col("doc_id"), col("n_ngrams"), col("n_flagged"),
        (col("n_flagged").cast("double") / col("n_ngrams"))
          .as("flagged_frac"))
  }

  /** Corpus-frequent n-gram span REMOVAL — the cleanup pass q98 only
    * scores: every token position covered by a 5-gram that recurs in
    * ≥3 distinct documents is dropped, and the survivors re-join in
    * original order. This is the token-level substring dedup of Lee
    * et al. 2021 as an actual transform (q70 does the chunk-level
    * version; this catches spans that straddle chunk boundaries).
    *
    * Scale shape: q98's two corpus passes plus one more narrow
    * shuffle — covered positions expand flagged starts ×n but carry
    * only (doc_id, pos); the anti-join streams token positions
    * against that, and the re-assembly groupBy is the same
    * token-wide shuffle q52's chunker already pays. The frequent
    * set broadcasts (heavy-hitter-sized); past broadcast range the
    * q68 bloom tier drops in.
    */
  val maskRepeatedNgrams: QueryDef = QueryDef.sql(
    "q100_mask_ngrams",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |   FROM documents),
       | g AS (SELECT doc_id, i, array_to_string(toks[i:i+${NgramN - 1}], ' ')
       |   AS ng FROM t, UNNEST(generate_series(1, len(toks) - ${NgramN - 1}))
       |   AS u(i) WHERE len(toks) >= $NgramN),
       | freq AS (SELECT ng FROM g GROUP BY ng
       |   HAVING count(DISTINCT doc_id) >= $NgramMinDocs),
       | cov AS (SELECT DISTINCT doc_id, p FROM g JOIN freq USING (ng),
       |   UNNEST(generate_series(i, i + ${NgramN - 1})) AS c(p)),
       | tp AS (SELECT doc_id, p, toks[p] AS tok FROM t,
       |   UNNEST(generate_series(1, len(toks))) AS u(p)),
       | kept AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
       |   ANTI JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p),
       | m AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS masked,
       |   count(*) AS n_kept FROM kept GROUP BY doc_id)
       | SELECT t.doc_id, COALESCE(masked, '') AS masked,
       |   COALESCE(n_kept, 0) AS n_kept,
       |   CAST(len(toks) AS BIGINT) AS n_total
       | FROM t LEFT JOIN m USING (doc_id)
       | ORDER BY t.doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    maskRepeatedNgramSpans(Tables.documents(s, d), NgramN, NgramMinDocs)
      .orderBy("doc_id")
  }

  /** Library entry behind q100 — drop tokens covered by
    * corpus-frequent n-grams over any frame with (`doc_id`, `text`).
    * Emits (doc_id, masked, n_kept, n_total); a fully-templated doc
    * survives as an empty string, so the caller can threshold.
    */
  def maskRepeatedNgramSpans(documents: org.apache.spark.sql.DataFrame,
      n: Int, minDocs: Int): org.apache.spark.sql.DataFrame = {
    val docs = documents.select(col("doc_id"), toks(col("text")).as("toks"))
    val long = docs.filter(size(col("toks")) >= n)
    val g = long.select(col("doc_id"),
      explode(transform(
        sequence(lit(1), size(col("toks")) - lit(n - 1)),
        i => struct(i.as("i"),
          concat_ws(" ", slice(col("toks"), i, lit(n))).as("ng")))).as("e"))
      .select(col("doc_id"), col("e.i").as("i"), col("e.ng").as("ng"))
    val freq = g.groupBy("ng")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs).select("ng")
    val covered = g.join(broadcast(freq), "ng")
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + lit(n - 1))).as("p"))
      .distinct()
    val tokpos = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val kept = tokpos.join(covered, Seq("doc_id", "p"), "left_anti")
    val m = kept.groupBy("doc_id").agg(
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("p"), col("tok")))),
        _.getField("tok"))).as("masked"),
      count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"), size(col("toks")).cast("long").as("n_total"))
      .join(m, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_kept")).na.fill("", Seq("masked"))
      .select(col("doc_id"), col("masked"), col("n_kept"), col("n_total"))
  }

  /** Pairwise cross-source 5-gram-shingle Jaccard — the mixing
    * diagnostic that tells you two "different" crawls are the same
    * corpus (or that a source leaked into another) before you assign
    * mixture weights. Every unordered source pair gets its exact
    * shingle-set Jaccard; zero-overlap pairs are kept (the grid
    * comes from a size-table cross join, not the intersection join).
    *
    * Scale shape: shingles dedup to (source, shingle) first, so the
    * self-join shuffles each distinct shingle once and fans out
    * C(k,2) per shingle only across the handful of sources sharing
    * it — bounded by #sources², never by corpus size. The per-source
    * size table is #sources rows. At 100 TB the exact distinct
    * shingle set is the expensive part; the drop-in estimate tier is
    * the q63 minhash-union sketch per source (pairwise signature
    * agreement estimates the same Jaccard — SketchSpec pins the
    * estimate against this exact query). Jaccard is a ratio of
    * exact counts → raw IEEE quotient (the q03 parity discipline).
    */
  val sourceOverlap: QueryDef = QueryDef.sql(
    "q105_source_overlap",
    s"""WITH t AS (SELECT source, string_split(text, ' ') AS toks
       |   FROM documents),
       | sh AS (SELECT DISTINCT source,
       |   array_to_string(toks[i:i+${NgramN - 1}], ' ') AS sh
       |   FROM t, UNNEST(generate_series(1, len(toks) - ${NgramN - 1}))
       |   AS u(i) WHERE len(toks) >= $NgramN),
       | sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
       | inter AS (SELECT a.source AS src_a, b.source AS src_b,
       |   count(*) AS n_common FROM sh a JOIN sh b
       |   ON a.sh = b.sh AND a.source < b.source GROUP BY 1, 2),
       | grid AS (SELECT x.source AS src_a, y.source AS src_b,
       |   x.n + y.n AS sum_n FROM sizes x JOIN sizes y
       |   ON x.source < y.source)
       | SELECT g.src_a, g.src_b, COALESCE(n_common, 0) AS n_common,
       |   CAST(COALESCE(n_common, 0) AS DOUBLE) /
       |     (sum_n - COALESCE(n_common, 0)) AS jaccard
       | FROM grid g LEFT JOIN inter USING (src_a, src_b)
       | ORDER BY src_a, src_b""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    sourceShingleOverlap(Tables.documents(s, d), NgramN)
      .orderBy("src_a", "src_b")
  }

  /** Library entry behind q105 — exact pairwise shingle Jaccard
    * between values of the `source` column, over any frame with
    * (`source`, `text`).
    */
  def sourceShingleOverlap(documents: org.apache.spark.sql.DataFrame,
      n: Int): org.apache.spark.sql.DataFrame = {
    val docs = documents
      .select(col("source"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
    val sh = docs.select(col("source"),
      explode(transform(
        sequence(lit(1), size(col("toks")) - lit(n - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("sh"))
      .distinct()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    val grid = sizes.as("x").join(sizes.as("y"),
        col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"),
        (col("x.n") + col("y.n")).as("sum_n"))
    grid.join(inter, Seq("src_a", "src_b"), "left")
      .na.fill(0L, Seq("n_common"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("sum_n") - col("n_common"))).as("jaccard"))
  }

  /** q111 — Shannon entropy of each document's word distribution:
    * H = log2(n) − (Σ c·log2 c)/n over per-word counts c. The
    * information-theoretic repetition signal that complements q64's
    * mode fraction: a template that cycles five phrases scores high
    * on diversity-of-mode but low on entropy; fluent text sits near
    * log2 of its vocabulary size. Low-entropy docs are the
    * boilerplate/spam tail every curation pass drops.
    *
    * Scale shape: two hash aggregates — (doc_id, word) counts, then
    * the per-doc rollup — no joins, no windows; both have map-side
    * partials. Float discipline (the q65 pattern): each c·log2(c)
    * term goes through DECIMAL(28,12) so the sum is
    * partition-order-independent, and the final round(…,4) absorbs
    * cross-engine libm ulps in log2.
    */
  val wordEntropy: QueryDef = QueryDef.sql(
    "q111_word_entropy",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      | c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
      | t AS (SELECT doc_id, c, CAST(CAST(c AS DOUBLE) *
      |   log2(CAST(c AS DOUBLE)) AS DECIMAL(28,12)) AS term FROM c),
      | agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |   CAST(count(*) AS BIGINT) AS n_distinct,
      |   CAST(sum(term) AS DOUBLE) AS st FROM t GROUP BY doc_id)
      | SELECT doc_id, n_tokens, n_distinct,
      |  round(log2(CAST(n_tokens AS DOUBLE)) - st / n_tokens, 4) + 0.0
      |    AS word_entropy
      | FROM agg ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val counts = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    counts
      .select(col("doc_id"), col("c"),
        (col("c").cast("double") * log2(col("c").cast("double")))
          .cast("decimal(28,12)").as("term"))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_distinct"),
        sum("term").cast("double").as("st"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        // + 0.0 normalizes a signed zero (the q144 r9 lesson): an
        // all-same-word doc's log2(n) − st/n is a quantization
        // residual that can round to -0.0 in DuckDB vs +0.0 here.
        (round(log2(col("n_tokens").cast("double")) -
          col("st") / col("n_tokens"), 4) + lit(0.0)).as("word_entropy"))
      .orderBy("doc_id")
  }

  /** q116 — canonical text normalization: lowercase, strip characters
    * outside [a-z0-9 ], squeeze runs of spaces, trim — the cleaning
    * pass that runs before any exact-dedup/fingerprint stage so that
    * case and punctuation variants collapse to one canonical form
    * (feeding q30's hash-dedup, q42's fingerprints, the q60 shingle
    * set). Pure narrow string ops — no shuffle at all, scan-speed at
    * any corpus size — and deterministic (fixed regex classes are
    * engine-portable), so the full normalized text hash-matches the
    * oracle. Reports before/after char and token counts per doc.
    */
  val normalize: QueryDef = QueryDef.sql(
    "q116_normalize",
    """WITH n AS (SELECT doc_id,
      |   trim(regexp_replace(regexp_replace(lower(text),
      |     '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text,
      |   text FROM documents)
      | SELECT doc_id, norm_text,
      |  CAST(length(text) AS BIGINT) AS chars_before,
      |  CAST(length(norm_text) AS BIGINT) AS chars_after,
      |  CAST(len(string_split(norm_text, ' ')) AS BIGINT) AS n_tokens
      | FROM n ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", ""), " +", " ")).as("norm_text"))
      .select(col("doc_id"), col("norm_text"),
        length(col("text")).cast("long").as("chars_before"),
        length(col("norm_text")).cast("long").as("chars_after"),
        size(split(col("norm_text"), " ")).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** q142 — INTRA-document duplicate-n-gram signals, completing the
    * Gopher repetition family (Rae et al. 2021, Table A1): q64 is the
    * mode-TOKEN ratio and q98/q100 flag n-grams frequent ACROSS the
    * corpus; what a self-repeating spam/template page trips is
    * repetition WITHIN itself — the fraction of tokens claimed by the
    * document's own most common 2-gram (Gopher's top-n-gram rule,
    * threshold 0.20) and the fraction of token positions covered by a
    * 5-gram occurring ≥ 2 times in the same document (Gopher's
    * duplicate-n-gram rule, threshold 0.15). Both are per-document
    * aggregates — the corpus never joins against itself, so the whole
    * operator is two narrow (doc_id, ngram) shuffles + per-doc
    * rollups: embarrassingly parallel at any corpus size. Ratios of
    * exact counts emit as raw IEEE quotients and the flag as an INT
    * (the q03/q64 parity discipline).
    */
  val intraDocRepetition: QueryDef = QueryDef.sql(
    "q142_intradoc_repetition",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |   FROM documents),
      | g2 AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS ng
      |   FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
      |   WHERE len(toks) >= 2),
      | top2 AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS max_c2 FROM
      |   (SELECT doc_id, ng, count(*) AS c FROM g2 GROUP BY doc_id, ng)
      |   GROUP BY doc_id),
      | g5 AS (SELECT doc_id, i, array_to_string(toks[i:i+4], ' ') AS ng
      |   FROM t, UNNEST(generate_series(1, len(toks) - 4)) AS u(i)
      |   WHERE len(toks) >= 5),
      | d5 AS (SELECT doc_id, ng FROM g5 GROUP BY doc_id, ng
      |   HAVING count(*) >= 2),
      | cov AS (SELECT DISTINCT g5.doc_id, p FROM g5 JOIN d5
      |   ON g5.doc_id = d5.doc_id AND g5.ng = d5.ng,
      |   UNNEST(generate_series(i, i + 4)) AS c(p)),
      | covn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cov
      |   FROM cov GROUP BY doc_id)
      | SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
      |   COALESCE(max_c2, 0) AS max_c2,
      |   COALESCE(n_cov, 0) AS dup5_cov_toks,
      |   CAST(COALESCE(max_c2, 0) * 2 AS DOUBLE) / len(toks) AS top2_frac,
      |   CAST(COALESCE(n_cov, 0) AS DOUBLE) / len(toks) AS dup5_frac,
      |   CAST(CASE WHEN
      |     CAST(COALESCE(max_c2, 0) * 2 AS DOUBLE) / len(toks) > 0.2
      |     OR CAST(COALESCE(n_cov, 0) AS DOUBLE) / len(toks) > 0.15
      |    THEN 1 ELSE 0 END AS INT) AS flagged
      | FROM t LEFT JOIN top2 USING (doc_id) LEFT JOIN covn USING (doc_id)
      | ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    intraDocRepetitionStats(Tables.documents(s, d)).orderBy("doc_id")
  }

  /** Library entry behind q142 over any frame with (doc_id, text).
    * The top-2-gram rule is faithful to Gopher: it is the MOST
    * FREQUENT gram's token share even when that gram occurs once, so
    * very short documents trip it trivially — Gopher composes it
    * after a min-length rule (50 ≤ words), which here is q43's
    * length gate / Curation's MinWords.
    */
  def intraDocRepetitionStats(documents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val t = documents.select(col("doc_id"), toks(col("text")).as("toks"))
    val g2 = t.filter(size(col("toks")) >= 2).select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("ng"))
    val top2 = g2.groupBy("doc_id", "ng").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("max_c2"))
    val g5 = t.filter(size(col("toks")) >= 5).select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("toks")) - lit(4)),
        i => struct(i.as("i"),
          concat_ws(" ", slice(col("toks"), i, lit(5))).as("ng")))).as("e"))
      .select(col("doc_id"), col("e.i").as("i"), col("e.ng").as("ng"))
    val d5 = g5.groupBy("doc_id", "ng").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("doc_id", "ng")
    val cov = g5.join(d5, Seq("doc_id", "ng"))
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + lit(4))).as("p"))
      .distinct()
    val covn = cov.groupBy("doc_id").agg(count(lit(1)).as("n_cov"))
    val top2f = (coalesce(col("max_c2"), lit(0L)) * 2).cast("double") /
      size(col("toks"))
    val dup5f = coalesce(col("n_cov"), lit(0L)).cast("double") /
      size(col("toks"))
    t.join(top2, Seq("doc_id"), "left").join(covn, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        coalesce(col("max_c2"), lit(0L)).as("max_c2"),
        coalesce(col("n_cov"), lit(0L)).as("dup5_cov_toks"),
        top2f.as("top2_frac"), dup5f.as("dup5_frac"),
        when(top2f > 0.2 || dup5f > 0.15, 1).otherwise(0)
          .cast("int").as("flagged"))
  }

  /** q143 — CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data"): a language model trained on a REFERENCE slice
    * (here `source = 'src0'`, standing in for CCNet's Wikipedia
    * prior) scores every document's perplexity, and each language's
    * documents split into head/middle/tail thirds of the perplexity
    * ranking — the operational buckets CCNet samples from. Distinct
    * from q65/q74, whose LMs are trained on the scored corpus
    * itself: the reference prior is what makes the score a QUALITY
    * transfer, and the buckets — not the raw score — are the
    * pipeline's product. The LM is q74's add-one bigram with a +1
    * escape in the denominator so out-of-reference histories keep
    * positive mass (LEFT joins, not inner).
    *
    * Scale shape: the reference counts are vocabulary-sized and
    * broadcast onto the scored-bigram stream (per-term log-probs sum
    * through DECIMAL(28,12), the order-independent parity
    * discipline). The broadcast carries a bounded-reference
    * contract, which is CCNet's own deployment shape (the trained
    * KenLM ships to every worker): the LM tables size with the
    * REFERENCE slice's vocabulary — which saturates for natural
    * language — not with the scored corpus; a reference too large to
    * broadcast takes the shuffle-join spelling of the same plan. The per-language thirds are NOT a per-language
    * global sort — `ntile` windowed by language puts an entire
    * language in one task, the classic skew-killer at corpus scale.
    * Instead the rank decomposes by VALUE (q135's first-occurrence
    * discipline): rounded scores are discrete, so a per-(lang, ppl)
    * count table (small, windowed per language over distinct values
    * only, broadcast back) gives the strictly-less base rank, a
    * row_number over the fine-grained (lang, ppl) partitions gives
    * the within-value offset, and the ntile bucket is then pure
    * arithmetic against the per-language totals. The DuckDB oracle
    * spells the same ranking as a plain ntile(3) — identical
    * semantics, engine-checked.
    */
  val perplexityBuckets: QueryDef = QueryDef.sql(
    "q143_perplexity_buckets",
    """WITH ref AS (SELECT string_split(text, ' ') AS toks
      |  FROM documents WHERE source = 'src0'),
      | c2 AS (SELECT b, count(*) AS c2 FROM
      |   (SELECT unnest([toks[i-1] || ' ' || toks[i]
      |     for i in generate_series(2, len(toks))]) AS b FROM ref)
      |  GROUP BY b),
      | c1 AS (SELECT w, count(*) AS c1 FROM
      |   (SELECT unnest(toks) AS w FROM ref) GROUP BY w),
      | v AS (SELECT count(*) AS v FROM c1),
      | t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
      |  FROM documents),
      | bg AS (SELECT doc_id, lang, unnest([toks[i-1] || ' ' || toks[i]
      |   for i in generate_series(2, len(toks))]) AS b FROM t
      |  WHERE len(toks) >= 2),
      | scored AS (SELECT bg.doc_id, bg.lang,
      |   CAST(log10(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE) /
      |     CAST(COALESCE(c1.c1, 0) + (SELECT v FROM v) + 1 AS DOUBLE))
      |    AS DECIMAL(28,12)) AS lg
      |  FROM bg LEFT JOIN c2 ON bg.b = c2.b
      |   LEFT JOIN c1 ON split_part(bg.b, ' ', 1) = c1.w),
      | agg AS (SELECT doc_id, lang, count(*) AS n_bigrams,
      |   CAST(sum(lg) AS DOUBLE) AS sum_lg FROM scored
      |  GROUP BY doc_id, lang),
      | p AS (SELECT doc_id, lang, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |   round(-sum_lg / n_bigrams, 4) AS ppl FROM agg),
      | b AS (SELECT *, ntile(3) OVER
      |   (PARTITION BY lang ORDER BY ppl, doc_id) AS nt FROM p)
      | SELECT doc_id, lang, n_bigrams, ppl,
      |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
      |   ELSE 'tail' END AS bucket
      | FROM b ORDER BY doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) => perplexityBucketsOver(Tables.documents(s, d)) }

  /** The q143 transform over any `(doc_id, lang, source, text)` frame
    * — exposed so the q153 curation composition can bucket the
    * span-cleaned corpus instead of the raw one. Reference prior is
    * the frame's own `source = 'src0'` slice.
    */
  def perplexityBucketsOver(docs: DataFrame): DataFrame =
    perplexityBucketsCore(docs).orderBy("doc_id")

  /** [[perplexityBucketsOver]] WITHOUT the final global sort — for
    * compositions (q153) that immediately join/filter the result:
    * the sort below a checkpoint is materialized (range-partitioning
    * additionally re-executes the last stage to sample bounds), and
    * the optimizer cannot remove it across the checkpoint boundary.
    */
  def perplexityBucketsCore(docs0: DataFrame): DataFrame = {
    // conditional fan-out (r20): the bigram explode (ref LM build +
    // per-doc scoring) is the dominant cost and a one-row-group
    // corpus serializes it; identity below the size gate and on
    // non-file inputs (q153's checkpointed `cleaned`)
    val docs = graft.Scale.rebalanceNarrowWideScan(docs0)
    val ref = docs.filter(col("source") === "src0")
      .select(toks(col("text")).as("toks"))
    val c2 = ref.filter(size(col("toks")) >= 2)
      .select(explode(transform(sequence(lit(2), size(col("toks"))),
        i => concat_ws(" ", element_at(col("toks"), i - 1),
          element_at(col("toks"), i)))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c2"))
    val c1 = ref.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    val bg = docs.select(col("doc_id"), col("lang"),
        toks(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(2), size(col("toks"))),
          i => concat_ws(" ", element_at(col("toks"), i - 1),
            element_at(col("toks"), i)))).as("b"))
    val p = bg
      .join(broadcast(c2), Seq("b"), "left")
      .join(broadcast(c1.withColumnRenamed("w", "w1")),
        substring_index(col("b"), " ", 1) === col("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("lang"),
        log10((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v") + 1).cast("double"))
          .cast("decimal(28,12)").as("lg"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("lg").cast("double").as("sum_lg"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        round(-col("sum_lg") / col("n_bigrams"), 4).as("ppl"))
      // One materialization of the doc-level score table (r19): p is
      // consumed by THREE subtrees (the value-count base table, the
      // per-language totals, and the final bucket join), and each
      // reference re-ran the whole corpus bigram explode + LM probe —
      // the operator's dominant cost — from scratch. p is one narrow
      // row per doc.
      .localCheckpoint()
    // Value-decomposed per-language rank (no per-language sort task):
    // strictly-less base from the distinct-value count table + a
    // fine-grained within-value row_number.
    val vcounts = p.groupBy("lang", "ppl").agg(count(lit(1)).as("cnt"))
    val cumW = Window.partitionBy("lang").orderBy("ppl")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = vcounts
      .withColumn("base", sum("cnt").over(cumW) - col("cnt"))
      .select("lang", "ppl", "base")
    val totals = p.groupBy("lang").agg(count(lit(1)).as("n"))
    val intraW = Window.partitionBy("lang", "ppl").orderBy("doc_id")
    p.join(broadcast(base), Seq("lang", "ppl"))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("rank", col("base") + row_number().over(intraW))
      .withColumn("b1", (col("n") / 3).cast("long") +
        when(col("n") % 3 >= 1, 1L).otherwise(0L))
      .withColumn("b2", col("b1") + (col("n") / 3).cast("long") +
        when(col("n") % 3 >= 2, 1L).otherwise(0L))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("ppl"),
        when(col("rank") <= col("b1"), "head")
          .when(col("rank") <= col("b2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  val defs: Seq[QueryDef] = Seq(
    textStats, langStats, tokenCount, qualityScore, langId, fingerprint,
    chunk, stratifiedSample, piiRedact, topTerms, corpusSketch, repetition,
    surprisal, packShards, mixProportions, boilerplate, bigramSurprisal,
    tfidfTerms, weightedSample, heavyHitters, qualityGate, repeatedNgrams,
    maskRepeatedNgrams, sourceOverlap, wordEntropy, normalize,
    intraDocRepetition, perplexityBuckets)
}
