package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nested-result shapes and event-time windowing.
  *
  * The reference's single nested type is `UserRecs(userId,
  * recs: Seq[Recommendation])` built driver-side from sorted lists
  * (`OfflineRecommender.scala:18-22,77-84`); here it's
  * `collect_list(struct(...))` over a rank-limited window — built
  * executor-side, one shuffle, bounded row width.
  */
object Nested {

  /** A4/A5 nested output: per-customer top-3 orders as an
    * array-of-struct column (sorted by rank inside the array).
    * The emitted frame flattens the array to a deterministic
    * `rank:orderkey:price` string (price through DECIMAL(12,2), which
    * is exact — the synthetic prices are 2-decimal — and renders
    * identically on both engines, unlike raw double-to-string or JSON
    * float formatting); callers wanting the typed array-of-struct
    * drop that projection.
    */
  val nestedTopOrders: QueryDef = QueryDef.sql(
    "q46_nested_recs",
    """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice, row_number()
      | OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      | AS rn FROM orders)
      | SELECT o_custkey,
      |  string_agg(rn || ':' || o_orderkey || ':' ||
      |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
      |    '|' ORDER BY rn) AS recs,
      |  count(*) AS n_recs
      | FROM r WHERE rn <= 3 GROUP BY o_custkey
      | ORDER BY o_custkey""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("o_custkey")
        .agg(sort_array(collect_list(struct(
          col("rn"), col("o_orderkey"), col("o_totalprice")))).as("recs_arr"))
        .select(col("o_custkey"),
          array_join(transform(col("recs_arr"), r =>
            concat_ws(":", r.getField("rn"), r.getField("o_orderkey"),
              r.getField("o_totalprice").cast("decimal(12,2)"))), "|")
            .as("recs"),
          size(col("recs_arr")).cast("long").as("n_recs"))
        .orderBy("o_custkey")
  }

  /** Event-time tumbling windows (1 day) per event type — the
    * event-time semantics the reference never had (it drops the wire
    * timestamp, `StreamingRecommender.scala:117`). This batch query
    * is the exact plan the streaming variant runs with a watermark;
    * DuckDB's time_bucket is the oracle.
    */
  val tumblingWindow: QueryDef = QueryDef.sql(
    "q47_tumbling_window",
    """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
      | event_type, count(*) AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      | FROM events GROUP BY window_start, event_type
      | ORDER BY window_start, event_type""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("window_start", "event_type")
  }

  /** q87 — SLIDING event-time windows (1 day, sliding every 6 h):
    * the trending-metrics shape (each event counted in day-long
    * windows at 4 offsets). Spark's `window(slide)` expands each row
    * to duration/slide copies BEFORE the hash aggregate — a
    * constant-factor map-side blowup, still one shuffle, and the
    * partial aggregate collapses it back to |windows|×|types| rows.
    * The oracle makes the same expansion explicit with a 4-row
    * offset cross join onto `time_bucket`.
    */
  val slidingWindow: QueryDef = QueryDef.sql(
    "q87_sliding_window",
    """SELECT time_bucket(INTERVAL '6 hours', ts)
      |   - o.k * INTERVAL '6 hours' AS window_start,
      | event_type, count(*) AS n,
      | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      | FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) o(k)
      | GROUP BY window_start, event_type
      | ORDER BY window_start, event_type""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day", "6 hours").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("window_start", "event_type")
  }

  val defs: Seq[QueryDef] = Seq(nestedTopOrders, tumblingWindow,
    slidingWindow)
}
