package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: the "what is in this table" pass a
  * curation pipeline runs before trusting a new 100 TB drop — per
  * column: row count, filled count, exact distinct count, min/max.
  * The reference exposes per-collection stats through its storage
  * layer; here the profile is a single declarative aggregate.
  */
object Profiling {

  /** Melt `columns` of `df` (already cast to string by the caller
    * where formatting matters) into (col_name, v) rows. The melt
    * multiplies row COUNT by the column count but each row is just
    * two short strings, so the shuffle stays narrow; profiling k
    * columns costs one pass + one narrow shuffle, not k passes.
    */
  def melt(df: DataFrame, columns: Seq[String]): DataFrame = {
    val entries = columns.flatMap(c => Seq(lit(c), col(c).cast("string")))
    df.select(explode(map(entries: _*)).as(Seq("col_name", "v")))
  }

  /** Per-column profile over the melted frame: counts, exact
    * distinct, lexicographic min/max (string semantics by design —
    * deterministic across engines, no float formatting hazards).
    *
    * Scale shape: one hash aggregate with map-side partials; the
    * distinct count is exact (Expand over the group) — at 100 TB
    * swap `count_distinct` for `approx_count_distinct` (the q45 HLL
    * path) to keep the aggregate single-phase.
    */
  def profile(melted: DataFrame): DataFrame =
    melted.groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        count(col("v")).as("n_filled"),
        count_distinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .orderBy("col_name")

  /** q99: profile the `orders` table. Timestamp formatted to a date
    * string on both sides; doubles excluded by design (double→string
    * formatting is engine-specific; a numeric profile would go
    * through the DECIMAL discipline instead).
    */
  val columnProfile: QueryDef = QueryDef.sql(
    "q99_column_profile",
    """WITH m AS (
      |  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v FROM orders
      |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
      |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
      |  UNION ALL SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d') FROM orders)
      | SELECT col_name, count(*) AS n_rows, count(v) AS n_filled,
      |   count(DISTINCT v) AS n_distinct, min(v) AS min_v, max(v) AS max_v
      | FROM m GROUP BY col_name ORDER BY col_name""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val src = Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_custkey"),
      col("o_orderstatus"),
      col("o_orderpriority"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
    profile(melt(src, Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_orderdate")))
  }

  /** q145 — per-source dataset card ("datasheet"): the one-row-per-
    * provenance summary a curation pipeline publishes alongside the
    * corpus (Gebru et al. 2021, "Datasheets for Datasets"): volume
    * (docs, tokens, mean doc length), language mix (distinct
    * languages, dominant language and its share), exact-duplicate
    * rate (1 − distinct content hashes / docs — the q30 signal
    * rolled up to provenance grain), and mean chars-per-token (a
    * tokenizer-
    * fertility proxy: sources whose ratio diverges are encoding
    * outliers). Everything is a per-source aggregate — two hash
    * aggregations over the corpus plus a window over the tiny
    * (source, lang) count table for the dominant language; nothing
    * scales with anything but the number of sources.
    */
  val sourceDatasheet: QueryDef = QueryDef.sql(
    "q145_source_datasheet",
    """WITH d AS (SELECT source, lang, md5(text) AS h,
      |   len(string_split(text, ' ')) AS n_toks, n_chars
      |  FROM documents),
      | base AS (SELECT source,
      |   count(*) AS docs,
      |   count(DISTINCT lang) AS langs,
      |   CAST(sum(n_toks) AS BIGINT) AS total_tokens,
      |   round(avg(CAST(n_toks AS DOUBLE)), 4) AS avg_doc_tokens,
      |   round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*),
      |     4) AS dup_text_rate,
      |   round(CAST(sum(n_chars) AS DOUBLE) / sum(n_toks), 4)
      |     AS chars_per_token
      |  FROM d GROUP BY source),
      | lc AS (SELECT source, lang, count(*) AS c FROM d
      |  GROUP BY source, lang),
      | top AS (SELECT source, lang AS top_lang, c,
      |   row_number() OVER (PARTITION BY source
      |     ORDER BY c DESC, lang) AS rn FROM lc)
      | SELECT base.source, CAST(docs AS BIGINT) AS docs,
      |  CAST(langs AS BIGINT) AS langs, total_tokens, avg_doc_tokens,
      |  dup_text_rate, chars_per_token, top.top_lang,
      |  round(CAST(top.c AS DOUBLE) / base.docs, 4) AS top_lang_share
      | FROM base JOIN top ON base.source = top.source AND top.rn = 1
      | ORDER BY base.source""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    // the distinct-count shuffles 32-byte content hashes, not full
    // document texts (md5 is the cross-engine hash, q42's precedent)
    val docs = Tables.documents(s, d).select(col("source"), col("lang"),
      md5(col("text")).as("h"),
      size(split(col("text"), " ")).cast("long").as("n_toks"),
      col("n_chars"))
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("docs"),
      countDistinct("lang").as("langs"),
      sum("n_toks").as("total_tokens"),
      round(avg(col("n_toks").cast("double")), 4).as("avg_doc_tokens"),
      round(lit(1.0) - countDistinct("h").cast("double") /
        count(lit(1)), 4).as("dup_text_rate"),
      round(sum("n_chars").cast("double") / sum("n_toks"), 4)
        .as("chars_per_token"))
    val lc = docs.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(desc("c"), asc("lang"))
    val top = lc.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c"))
    base.join(top, "source")
      .select(col("source"), col("docs"), col("langs"),
        col("total_tokens"), col("avg_doc_tokens"), col("dup_text_rate"),
        col("chars_per_token"), col("top_lang"),
        round(col("c").cast("double") / col("docs"), 4)
          .as("top_lang_share"))
      .orderBy("source")
  }

  val defs: Seq[QueryDef] = Seq(columnProfile, sourceDatasheet)
}
