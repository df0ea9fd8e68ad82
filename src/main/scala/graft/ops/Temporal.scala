package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators a large-scale behavioral/training-data
  * pipeline needs beyond the reference's surface (its only temporal
  * op is the epoch→yyyyMM UDF, `StatisticsRecommender.scala:73-76`):
  * gap-based sessionization and as-of (most-recent-prior) joins.
  *
  * Scale design: both are one-shuffle operators — a single
  * hash-partition by user_id followed by an in-partition sort; no
  * self-join, no range explosion. At 100 TB the shuffle is the
  * unavoidable minimum (the data must be grouped per entity); salting
  * is unnecessary because user keys are high-cardinality, and AQE
  * handles residual skew.
  */
object Temporal {

  val SessionGapSec = 1800L

  /** Gap-based sessionization: a new session starts after ≥30 min of
    * user inactivity. lag → gap flag → running sum = session index;
    * the whole derivation is two window functions over ONE
    * partitioning (Catalyst plans a single Exchange + Sort, reused by
    * both windows and the final aggregate).
    */
  val sessionize: QueryDef = QueryDef.sql(
    "q50_sessionize",
    s"""WITH ev AS (
       |  SELECT user_id, event_id, ts FROM events),
       | flagged AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR (epoch_us(ts) // 1000000)
       |              - (epoch_us(lag(ts) OVER w) // 1000000)
       |              > $SessionGapSec
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       | sess AS (
       |  SELECT user_id, ts,
       |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged)
       | SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |   min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events,
       |   max(epoch_us(ts) // 1000000) - min(epoch_us(ts) // 1000000)
       |     AS duration_sec
       | FROM sess GROUP BY user_id, session_id
       | ORDER BY user_id, session_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = Tables.events(s, d).select("user_id", "event_id", "ts")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > SessionGapSec,
          1).otherwise(0))
    flagged
      .withColumn("session_id", sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"),
        count(lit(1)).as("n_events"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long")))
          .as("duration_sec"))
      .select(col("user_id"), col("session_id").cast("long").as("session_id"),
        col("session_start"), col("n_events"), col("duration_sec"))
      .orderBy("user_id", "session_id")
  }

  /** As-of join: each purchase joined to the user's most recent PRIOR
    * click. Implemented as a union-merge, not a join: tag both sides,
    * sort per user, and carry the last click forward with an
    * ignore-nulls window — one shuffle total, versus the naive
    * per-row subquery (quadratic) or an interval self-join (skew
    * explosion on active users).
    */
  val asofJoin: QueryDef = QueryDef.sql(
    "q51_asof_join",
    """WITH merged AS (
      |  SELECT user_id, event_id, ts, event_type, value FROM events
      |  WHERE event_type IN ('click', 'purchase')),
      | carried AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    value AS purchase_value,
      |    last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
      |      OVER w AS asof_click_value,
      |    last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
      |      OVER w AS asof_click_ts
      |  FROM merged WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      | SELECT user_id, event_id, ts, purchase_value, asof_click_ts,
      |   asof_click_value
      | FROM carried WHERE event_type = 'purchase'
      | ORDER BY user_id, event_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val merged = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select("user_id", "event_id", "ts", "event_type", "value")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    merged
      .withColumn("asof_click_value",
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true)
          .over(w))
      .withColumn("asof_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("purchase_value"),
        col("asof_click_ts"), col("asof_click_value"))
      .orderBy("user_id", "event_id")
  }

  val defs: Seq[QueryDef] = Seq(sessionize, asofJoin)
}
