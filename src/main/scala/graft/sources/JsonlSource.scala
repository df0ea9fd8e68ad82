package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the S1-family source for the interchange
  * format LLM training corpora actually ship in (one JSON document
  * per line). Built as `text` scan + `from_json` rather than
  * `spark.read.json`: the parse is a codegen'd expression over a
  * trivially-splittable line source, the schema is DECLARED (no
  * sampling inference pass over 100 TB), and malformed input is
  * policy, not crashes — Spark's native JSON scan cannot filter on
  * its corrupt-record column without caching the scan (SPARK-21610),
  * while this spelling routes every line exactly once.
  *
  * Policy: a line routes to QUARANTINE when it is not valid JSON or
  * when a REQUIRED field (doc_id, text) is null/absent after parse —
  * schema drift on required fields is corruption, not data. Optional
  * fields (lang, source) pass through as nulls for downstream
  * defaulting. `n_chars` is derived, not trusted: a stated length
  * that disagrees with the text is the kind of silent upstream skew
  * a curation pipeline must not inherit.
  */
object JsonlSource {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  // from_json in PERMISSIVE mode parses a broken line to an all-null
  // struct, indistinguishable from a JSON object that legitimately
  // lacks every optional field — the corrupt-record channel restores
  // the distinction at the expression level (a malformed line, or a
  // field that violates the declared type, lands its raw text here).
  private val parseSchema: StructType =
    documentsSchema.add(StructField("_malformed", StringType))

  private def parsed(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(col("value").as("raw"),
        from_json(col("value"), parseSchema,
          Map("columnNameOfCorruptRecord" -> "_malformed")).as("r"))

  private def corrupt: Column =
    col("r").isNull || col("r._malformed").isNotNull ||
      col("r.doc_id").isNull || col("r.text").isNull

  /** Clean documents in the engine's `documents` shape (n_chars
    * derived from the text).
    */
  def documents(spark: SparkSession, path: String): DataFrame =
    parsed(spark, path)
      .filter(!corrupt)
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
        col("r.lang").as("lang"), col("r.source").as("source"),
        length(col("r.text")).cast("long").as("n_chars"))

  /** The rejected lines, verbatim, with the reason — the quarantine
    * side every production ingest keeps for reprocessing/audit.
    */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    parsed(spark, path)
      .filter(corrupt)
      .select(col("raw"),
        when(col("r").isNull || col("r._malformed").isNotNull,
            "malformed")
          .when(col("r.doc_id").isNull, "missing_doc_id")
          .otherwise("missing_text").as("reason"))
}
