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

  val defs: Seq[QueryDef] = Seq(columnProfile)
}
