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

  val defs: Seq[QueryDef] = Seq(vocabEncode)
}
