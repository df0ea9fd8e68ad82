package graft.text

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-side operators over the `documents` corpus: BM25 scoring
  * and inverted-index (posting-list) construction — the lexical-search
  * counterpart to the embedding ANN in `graft.search`. A curation
  * pipeline uses these to pull topic slices out of a 100 TB corpus
  * (BM25 against a topic query) and to build the term → docs index
  * that powers contamination lookups and corpus exploration.
  */
object Retrieval {

  private def toks(c: Column): Column = split(c, " ")

  /** Fixed topic query for the registered q89 instance; BM25 over the
    * synthetic corpus vocabulary.
    */
  private val queryTerms = Seq("join", "hash", "window", "vector")

  /** BM25 (k1=1.2, b=0.75, Lucene-style non-negative idf) of every
    * document against a fixed term query.
    *
    * Scale shape: the only corpus-wide shuffles are the per-doc
    * length aggregate and the final per-doc score sum — both narrow
    * (doc_id + one number). The token stream is filtered to the
    * query's terms BEFORE its aggregate, so the tf shuffle carries
    * O(matching docs × |query|) rows, not the corpus vocabulary; df /
    * idf / corpus stats are term-count-sized and ride as broadcasts.
    * Float discipline: per-term scores go through DECIMAL(28,12) so
    * the per-doc sum is partition-order-independent, and the output
    * rounds at 4 decimals to absorb libm ulp differences in `ln`
    * (the q65 discipline).
    */
  val bm25: QueryDef = QueryDef.sql(
    "q89_bm25",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |   FROM documents),
      | len AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
      | stats AS (SELECT count(*) AS n,
      |   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM len),
      | tf AS (SELECT doc_id, t, count(*) AS tf FROM tok
      |   WHERE t IN ('join','hash','window','vector') GROUP BY doc_id, t),
      | df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
      | idf AS (SELECT t,
      |   ln((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5) /
      |      (CAST(df AS DOUBLE) + 0.5) + 1.0) AS idf FROM df),
      | scored AS (SELECT tf.doc_id,
      |   CAST((idf.idf * (CAST(tf.tf AS DOUBLE) * 2.2)) /
      |        (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |          (CAST(len.dl AS DOUBLE) / (SELECT avgdl FROM stats))))
      |     AS DECIMAL(28,12)) AS s
      |   FROM tf JOIN idf ON tf.t = idf.t JOIN len ON tf.doc_id = len.doc_id)
      | SELECT doc_id, round(CAST(sum(s) AS DOUBLE), 4) AS bm25
      | FROM scored GROUP BY doc_id
      | ORDER BY bm25 DESC, doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("t"))
    val len = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = len.agg(count(lit(1)).as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = tok.filter(col("t").isin(queryTerms: _*))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("t"),
        log((col("n").cast("double") - col("df") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)).as("idf"))
    tf.join(broadcast(idf), "t")
      .join(len, "doc_id")
      .crossJoin(broadcast(stats.select(col("avgdl"))))
      .select(col("doc_id"),
        ((col("idf") * (col("tf").cast("double") * lit(2.2))) /
          (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
            (col("dl").cast("double") / col("avgdl")))))
          .cast("decimal(28,12)").as("s"))
      .groupBy("doc_id")
      .agg(round(sum("s").cast("double"), 4).as("bm25"))
      .orderBy(desc("bm25"), asc("doc_id"))
  }

  /** Inverted index: per term, the document frequency plus the first
    * 20 doc ids as a comma-joined posting string (capped so a stopword
    * at corpus scale can't blow up a row).
    *
    * Scale shape: per-doc distinct tokens explode narrowly; the
    * posting cap runs as a WindowGroupLimit (top-20 per term pushed
    * into the shuffle's partial side, no full per-term sort); df is a
    * second aggregate over the same exploded stream, joined back
    * term-to-term. Row width is bounded by the cap everywhere past
    * the window.
    */
  val invertedIndex: QueryDef = QueryDef.sql(
    "q90_inverted_index",
    """WITH tok AS (SELECT DISTINCT doc_id,
      |   unnest(string_split(text, ' ')) AS t FROM documents),
      | d AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
      | r AS (SELECT t, doc_id FROM (SELECT t, doc_id,
      |   row_number() OVER (PARTITION BY t ORDER BY doc_id) AS rk
      |   FROM tok) WHERE rk <= 20),
      | p AS (SELECT t, string_agg(doc_id, ',' ORDER BY doc_id) AS postings
      |   FROM r GROUP BY t)
      | SELECT p.t AS term, d.df, p.postings FROM p
      | JOIN d ON p.t = d.t ORDER BY term""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(array_distinct(toks(col("text")))).as("t"))
    val dfreq = tok.groupBy("t").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("t").orderBy("doc_id")
    tok.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .groupBy("t")
      .agg(array_join(
        transform(sort_array(collect_list(col("doc_id"))),
          _.cast("string")), ",").as("postings"))
      .join(dfreq, "t")
      .select(col("t").as("term"), col("df"), col("postings"))
      .orderBy("term")
  }

  val defs: Seq[QueryDef] = Seq(bm25, invertedIndex)
}
