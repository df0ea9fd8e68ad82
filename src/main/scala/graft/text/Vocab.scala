package graft.text

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequency-vocabulary construction + token-id encoding — the step
  * that turns a curated text corpus into the integer sequences a
  * trainer actually consumes. Two halves, both shaped for 100 TB:
  *
  *   1. vocab build: one corpus-wide (token → count) hash aggregate
  *      (map-side partials make this |vocab|-sized, not corpus-sized),
  *      then top-V via `TakeOrderedAndProject` — the global sort never
  *      materializes; only V rows reach the single-partition window
  *      that assigns the dense ids.
  *   2. encoding: the V-row vocab broadcasts onto the exploded
  *      (doc, pos, token) stream — no shuffle of the corpus for the
  *      lookup; the only corpus-wide shuffle is the per-doc
  *      re-assembly aggregate, which carries (doc_id, pos, id) ints,
  *      never the token strings.
  *
  * Out-of-vocabulary tokens map to id 0 (the UNK convention). Ids are
  * 1-based dense ranks by (count desc, token asc) — fully
  * deterministic, so the whole encode is oracle-checkable.
  */
object Vocab {

  val VocabSize = 20

  /** q80 — build the top-V vocabulary and encode every document as
    * its comma-joined token-id sequence.
    */
  val vocabEncode: QueryDef = QueryDef.sql(
    "q80_vocab_encode",
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       | e AS (SELECT doc_id, unnest(toks) AS tok,
       |   generate_subscripts(toks, 1) AS pos FROM t),
       | v AS (SELECT tok, row_number() OVER
       |   (ORDER BY count(*) DESC, tok) AS id
       |  FROM e GROUP BY tok
       |  ORDER BY count(*) DESC, tok LIMIT $VocabSize)
       | SELECT e.doc_id,
       |  string_agg(CAST(coalesce(v.id, 0) AS VARCHAR), ','
       |    ORDER BY e.pos) AS ids,
       |  count(*) AS n_tokens
       | FROM e LEFT JOIN v USING (tok)
       | GROUP BY e.doc_id ORDER BY e.doc_id"""
      .stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val e = Tables.documents(s, d).select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val counts = e.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // top-V never sorts the full vocabulary; the id-assigning window
    // runs on V rows in one (tiny) partition.
    val vocab = counts.orderBy(desc("cnt"), asc("tok")).limit(VocabSize)
      .withColumn("id",
        row_number().over(Window.orderBy(desc("cnt"), asc("tok"))))
      .select("tok", "id")
    e.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("id"), lit(0)).as("id"))
      .groupBy("doc_id")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("id")))),
            x => x.getField("id").cast("string")),
          ",").as("ids"),
        count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")
  }

  /** Terms entering the q149 Zipf regression — the standard head-only
    * fit (the tail bends off the power law and a 100 TB corpus has an
    * unbounded singleton tail; the head is where the law holds).
    */
  val ZipfTopK = 100

  /** q149 — per-source vocabulary profile: the corpus-statistics
    * card a data-quality audit reads before mixing sources. Per
    * source: token/type counts, hapax count (singleton types — the
    * OCR-noise/boilerplate tail indicator), top-term mass share, and
    * the Zipf rank-frequency slope — least-squares of ln f on ln rank
    * over the top-[[ZipfTopK]] types. Natural text sits near −1
    * (Zipf 1949); a slope far off it flags templated or synthetic
    * text, the same signal family as q64/q111 but at SOURCE grain,
    * where it steers mixing weights rather than per-doc drops.
    *
    * Scale shape: one (source, term) hash aggregate (map-side
    * partials bound it by |sources|·|vocab|, not corpus size), a
    * per-source top-K that Spark plans as WindowGroupLimit (only K
    * rows per source survive the rank shuffle), and two tiny
    * per-source rollups joined at |sources| rows. Float discipline
    * (the q150/q131 floor-grid rule — no DECIMAL cast half-tie can
    * reach the slope): every ln-product term lands on the BIGINT
    * 1e12 lattice via `floor(term·1e12)` — floor of identical IEEE
    * doubles is tie-free in both engines, where a DECIMAL(28,12)
    * cast rounds and r9 measured exactly that cast flipping a q150
    * bit cross-engine. Sums are exact BIGINT (≤ ~1.3e16 ≪ 2⁶³, from
    * |ln·ln| ≤ 127 over K=100 terms), rescaled to double by one
    * identical-spelling /1e12; the closed-form slope is then one
    * identical double expression on both engines, and the final
    * round(…,4)+0.0 absorbs libm ulps and normalizes any signed
    * zero. top_share stays an unrounded int/int quotient
    * (bit-identical — the q37 precedent).
    */
  val zipfProfile: QueryDef = QueryDef.sql(
    "q149_zipf_profile",
    s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       | f AS (SELECT source, w, CAST(count(*) AS BIGINT) AS f
       |  FROM tok GROUP BY source, w),
       | stats AS (SELECT source, CAST(sum(f) AS BIGINT) AS n_tokens,
       |   CAST(count(*) AS BIGINT) AS n_distinct,
       |   CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |     AS hapax,
       |   CAST(max(f) AS DOUBLE) / CAST(sum(f) AS DOUBLE) AS top_share
       |  FROM f GROUP BY source),
       | rk AS (SELECT source, f, row_number() OVER (PARTITION BY source
       |   ORDER BY f DESC, w ASC) AS rk FROM f),
       | top AS (SELECT source,
       |   CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e12) AS BIGINT) AS x,
       |   CAST(floor(ln(CAST(f AS DOUBLE)) * 1e12) AS BIGINT) AS y,
       |   CAST(floor(ln(CAST(rk AS DOUBLE)) * ln(CAST(f AS DOUBLE))
       |     * 1e12) AS BIGINT) AS xy,
       |   CAST(floor(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))
       |     * 1e12) AS BIGINT) AS xx
       |  FROM rk WHERE rk <= $ZipfTopK),
       | fit AS (SELECT source, CAST(count(*) AS DOUBLE) AS k,
       |   CAST(sum(x) AS DOUBLE) / 1e12 AS sx,
       |   CAST(sum(y) AS DOUBLE) / 1e12 AS sy,
       |   CAST(sum(xy) AS DOUBLE) / 1e12 AS sxy,
       |   CAST(sum(xx) AS DOUBLE) / 1e12 AS sxx
       |  FROM top GROUP BY source)
       | SELECT stats.source, n_tokens, n_distinct, hapax, top_share,
       |  round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) + 0.0
       |    AS zipf_slope
       | FROM stats JOIN fit ON stats.source = fit.source
       | ORDER BY stats.source""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val f = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).cast("long").as("f"))
    val stats = f.groupBy("source").agg(
      sum("f").cast("long").as("n_tokens"),
      count(lit(1)).cast("long").as("n_distinct"),
      sum(when(col("f") === 1, 1).otherwise(0)).cast("long").as("hapax"),
      (max("f").cast("double") / sum("f").cast("double")).as("top_share"))
    val rk = f.withColumn("rk", row_number().over(
      Window.partitionBy("source").orderBy(desc("f"), asc("w"))))
      .filter(col("rk") <= ZipfTopK)
    val lx = log(col("rk").cast("double"))
    val ly = log(col("f").cast("double"))
    val fit = rk.select(col("source"),
        floor(lx * lit(1e12)).cast("long").as("x"),
        floor(ly * lit(1e12)).cast("long").as("y"),
        floor(lx * ly * lit(1e12)).cast("long").as("xy"),
        floor(lx * lx * lit(1e12)).cast("long").as("xx"))
      .groupBy("source").agg(
        count(lit(1)).cast("double").as("k"),
        (sum("x").cast("double") / lit(1e12)).as("sx"),
        (sum("y").cast("double") / lit(1e12)).as("sy"),
        (sum("xy").cast("double") / lit(1e12)).as("sxy"),
        (sum("xx").cast("double") / lit(1e12)).as("sxx"))
    stats.join(fit, "source")
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        col("hapax"), col("top_share"),
        (round((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")), 4) + lit(0.0))
          .as("zipf_slope"))
      .orderBy("source")
  }

  val defs: Seq[QueryDef] = Seq(vocabEncode, zipfProfile)
}
