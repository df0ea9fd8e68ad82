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
    oracle: Option[String],
    approxWhen: Option[(SparkSession, String) => Boolean] = None) {

  /** True when, for this (session, sfDir), the query runs an
    * approximate branch (e.g. the LSH cutover above
    * `spark.graft.exactPairLimit`) and its exact oracle therefore
    * doesn't apply. The verify dump omits the oracle in that regime so
    * the driver records a rows-only check instead of a confusing hash
    * mismatch.
    */
  def isApproximateFor(s: SparkSession, d: String): Boolean =
    approxWhen.exists(f => f(s, d))
}

object QueryDef {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Oracled query with a scale cutover: `approx` reports (per
    * session/sfDir, memoized through `Scale.exactOk`) whether the
    * approximate branch is active, in which case the oracle is
    * withheld from the verify dump.
    */
  def sqlCutover(name: String, oracle: String)(
      approx: (SparkSession, String) => Boolean)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle), Some(approx))

  /** Rows-only checked query (not expressible in portable ANSI SQL). */
  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
