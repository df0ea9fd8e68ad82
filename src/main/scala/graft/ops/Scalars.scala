package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function and scalar-aggregate surface: SURVEY §2.8 (F3–F6)
  * and the rescoring/RMSE aggregates (A7–A9). All built-ins — the
  * reference's per-record driver arithmetic
  * (`StreamingRecommender.scala:205-252`, `ALSTrainer.scala:65-79`)
  * becomes codegen'd column expressions.
  */
object Scalars {

  /** F3/F6 — log10 / square / sqrt. Squares are written `x * x` (not
    * `pow`) so both engines produce bit-identical IEEE doubles; log10
    * is rounded to 4 places to absorb last-ulp libm differences.
    */
  val scalarMath: QueryDef = QueryDef.sql(
    "q13_scalar_math",
    """SELECT event_id, round(log10(value + 1), 4) AS log_value,
      | value * value AS value_sq, sqrt(value) AS value_sqrt
      | FROM events ORDER BY event_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        round(log10(col("value") + 1), 4).as("log_value"),
        (col("value") * col("value")).as("value_sq"),
        sqrt(col("value")).as("value_sqrt"))
      .orderBy("event_id")
  }

  /** A8/A9 — the streaming rescorer's conditional counters as a batch
    * aggregation: per user, how many high / low events, and the
    * log-bias term `log10(high+1) - log10(low+1)`
    * (`StreamingRecommender.scala:205-229,250-252`). `count(CASE …)`
    * keeps the type int64 on both engines.
    */
  val conditionalAgg: QueryDef = QueryDef.sql(
    "q15_conditional_agg",
    """SELECT user_id, count(CASE WHEN value > 300 THEN 1 END) AS n_high,
      | count(CASE WHEN value <= 300 THEN 1 END) AS n_low,
      | round(log10(count(CASE WHEN value > 300 THEN 1 END) + 1)
      | - log10(count(CASE WHEN value <= 300 THEN 1 END) + 1), 4) + 0.0 AS bias
      | FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val nHigh = count(when(col("value") > 300, lit(1)))
    val nLow = count(when(col("value") <= 300, lit(1)))
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        nHigh.as("n_high"),
        nLow.as("n_low"),
        // + 0.0 normalizes a signed zero (the q144 r9 lesson): the
        // log-ratio can round to -0.0 in DuckDB vs +0.0 here.
        (round(log10(nHigh + 1) - log10(nLow + 1), 4) + lit(0.0)).as("bias"))
      .orderBy("user_id")
  }

  /** A7/J3/F6 — RMSE between per-part mean quantity (the "model") and
    * actual quantities: equi join on the composite key, squared error,
    * mean, sqrt (`ALSTrainer.scala:65-79`). Error sums go through
    * DECIMAL so the scalar is partition-order-independent.
    */
  val rmse: QueryDef = QueryDef.sql(
    "q16_rmse",
    """WITH p AS (SELECT l_partkey,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      | AS pred FROM lineitem GROUP BY l_partkey)
      | SELECT round(sqrt(CAST(sum(CAST((l_quantity - pred) * (l_quantity - pred)
      | AS DECIMAL(28,10))) AS DOUBLE) / count(*)), 6) AS rmse
      | FROM lineitem JOIN p USING (l_partkey)""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val pred = li.groupBy("l_partkey")
      .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("pred"))
    val err = (col("l_quantity") - col("pred")) *
      (col("l_quantity") - col("pred"))
    li.join(pred, "l_partkey")
      .agg(round(
        sqrt(sum(err.cast("decimal(28,10)")).cast("double") /
          count(lit(1))), 6).as("rmse"))
  }

  /** F4/F5/P7 — string surface: contains-filter, split, first-N-words
    * (the reference's `substring_index` log extraction,
    * `LogProcess.java:20-23`), length.
    */
  val stringFuncs: QueryDef = QueryDef.sql(
    "q19_string_funcs",
    """SELECT doc_id, array_to_string(string_split(text, ' ')[1:3], ' ')
      | AS first3, string_split(text, ' ')[1] AS first_word,
      | length(text) AS len FROM documents
      | WHERE contains(text, 'spark') ORDER BY doc_id""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("text").contains("spark"))
      .select(
        col("doc_id"),
        substring_index(col("text"), " ", 3).as("first3"),
        split(col("text"), " ").getItem(0).as("first_word"),
        length(col("text")).as("len"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] =
    Seq(scalarMath, conditionalAgg, rmse, stringFuncs)
}
