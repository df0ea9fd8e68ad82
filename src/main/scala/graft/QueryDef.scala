package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * string over the same parquet tables. Queries without an oracle get
  * the driver's weaker rows-only check.
  *
  * Determinism contract (so the driver's hash compare is stable):
  *   - every query ends in a total ORDER BY with tie-breaking keys;
  *   - floating aggregates are summed through DECIMAL casts (exact,
  *     order-independent) and only then cast back to DOUBLE;
  *   - the session time zone is UTC on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Rows-only checked query (not expressible in portable ANSI SQL). */
  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
