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

  /** Exponential-decay popularity — the batch spelling of the
    * reference's "recent matters more" streaming bias (its stream
    * rescorer weights by recency implicitly via the last-20 buffer):
    * score(p) = Σ value·2^(−age_days/half_life). One hash-aggregate
    * shuffle with map-side partials; the decayed addends go through
    * DECIMAL(28,12) so the sum is partition-order-independent and
    * oracle-stable.
    */
  val decayScore: QueryDef = QueryDef.sql(
    "q56_decay_popularity",
    s"""WITH mx AS (
       |  SELECT max(ts) AS now FROM events WHERE event_type = 'purchase'),
       | scored AS (
       |  SELECT event_id % ${Tables.NumProducts} AS product_id,
       |    CAST(value * pow(0.5,
       |      (epoch_us(now) - epoch_us(ts)) / 86400000000.0 / 7.0)
       |      AS DECIMAL(28,12)) AS w
       |  FROM events, mx WHERE event_type = 'purchase')
       | SELECT product_id, round(CAST(sum(w) AS DOUBLE), 4) AS decay_score,
       |   CAST(count(*) AS BIGINT) AS n
       | FROM scored GROUP BY product_id
       | ORDER BY product_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("event_type") === "purchase")
    // "now" = max event time, folded in as a broadcast single-row
    // join rather than a driver collect: one job, and the corpus
    // scan+filter isn't re-derived for a scalar
    val mx = ev.agg(max("ts").as("now_ts"))
    ev.crossJoin(broadcast(mx))
      .select((col("event_id") % Tables.NumProducts).as("product_id"),
        (col("value") * pow(lit(0.5),
          (unix_micros(col("now_ts")) - unix_micros(col("ts")))
            / 86400000000.0 / 7.0)).cast("decimal(28,12)").as("w"))
      .groupBy("product_id")
      .agg(round(sum("w").cast("double"), 4).as("decay_score"),
        count(lit(1)).as("n"))
      .orderBy("product_id")
  }

  /** Conversion funnel view → click → purchase: per user, the
    * earliest view, the earliest click strictly after it, the
    * earliest purchase strictly after that, and the reached depth.
    * All three stages aggregate and join on user_id, so Catalyst
    * plans one partitioning reused across the pipeline.
    */
  val funnel: QueryDef = QueryDef.sql(
    "q57_funnel",
    """WITH v AS (
      |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      |  FROM events GROUP BY user_id),
      | c AS (
      |  SELECT e.user_id, min(e.ts) AS first_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.first_view
      |  GROUP BY e.user_id),
      | p AS (
      |  SELECT e.user_id, min(e.ts) AS first_purchase
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      |  GROUP BY e.user_id)
      | SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
      |   CAST(CASE WHEN p.first_purchase IS NOT NULL THEN 3
      |        WHEN c.first_click IS NOT NULL THEN 2
      |        WHEN v.first_view IS NOT NULL THEN 1 ELSE 0 END AS INT) AS depth
      | FROM v LEFT JOIN c ON v.user_id = c.user_id
      |        LEFT JOIN p ON v.user_id = p.user_id
      | ORDER BY v.user_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val v = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("first_view"))
    val c = ev.join(v, "user_id")
      .filter(col("event_type") === "click" && col("ts") > col("first_view"))
      .groupBy("user_id").agg(min("ts").as("first_click"))
    val p = ev.join(c, "user_id")
      .filter(col("event_type") === "purchase" &&
        col("ts") > col("first_click"))
      .groupBy("user_id").agg(min("ts").as("first_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("first_view"), col("first_click"),
        col("first_purchase"),
        when(col("first_purchase").isNotNull, 3)
          .when(col("first_click").isNotNull, 2)
          .when(col("first_view").isNotNull, 1)
          .otherwise(0).as("depth"))
      .orderBy("user_id")
  }

  /** The as-of join again, through the custom physical operator
    * ([[graft.plans.AsOfJoinExec]]: co-partition + in-partition merge
    * scan) instead of the declarative union-merge — SAME oracle SQL
    * as q51, so the custom operator is hash-gated against DuckDB.
    */
  val asofJoinExec: QueryDef = QueryDef.sql(
    "q58_asof_join_exec", asofJoin.oracle.get
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_event"), col("value").as("c_value"))
    // event_id tiebreaks align the merge scan with the oracle's
    // (ts, event_id) window ordering on duplicate timestamps
    graft.plans.AsOfJoin(purchases, clicks,
        "user_id", "ts", "c_user", "c_ts",
        leftTie = Some("event_id"), rightTie = Some("c_event"))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("purchase_value"),
        col("c_ts").as("asof_click_ts"),
        col("c_value").as("asof_click_value"))
      .orderBy("user_id", "event_id")
  }

  /** Weekly cohort retention: users are cohorted by the Monday of
    * their first event, then each (cohort, weeks-since-cohort) cell
    * counts distinct users active that week — the classic retention
    * triangle.
    *
    * Scale shape: the per-user first-week comes from a window `min`
    * over the user_id partitioning (one shuffle, reused from the
    * dedup of (user, week) pairs); the cell aggregate is a second,
    * smaller shuffle on (cohort, week). No self-join of events
    * against itself, so the plan is two narrow exchanges regardless
    * of corpus size.
    */
  val cohortRetention: QueryDef = QueryDef.sql(
    "q103_cohort_retention",
    """WITH ev AS (SELECT DISTINCT user_id,
      |   date_trunc('week', ts) AS wk FROM events),
      | c AS (SELECT user_id, wk,
      |   min(wk) OVER (PARTITION BY user_id) AS cohort FROM ev)
      | SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
      |   CAST(date_diff('day', cohort, wk) / 7 AS INT) AS week_no,
      |   count(DISTINCT user_id) AS n_users
      | FROM c GROUP BY cohort, wk
      | ORDER BY cohort_week, week_no""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val w = Window.partitionBy("user_id")
    ev.withColumn("cohort", min("wk").over(w))
      .groupBy("cohort", "wk")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_no"),
        col("n_users"))
      .orderBy("cohort_week", "week_no")
  }

  /** q125 — gap-filled daily revenue per region: densify the sparse
    * daily aggregate onto the full date spine (every region × every
    * day between the corpus min and max order dates), zero-fill the
    * missing days, and carry a running revenue total. The standard
    * time-series regularization every downstream window/trend
    * operator assumes (a day with no orders must be a 0 row, not an
    * absent row, or moving averages and decay scores silently skip
    * it).
    *
    * Scale shape: the spine is `sequence(min, max)` exploded from a
    * ONE-ROW bounds aggregate cross-joined with the region dims —
    * dims × days rows generated distributed, never a driver loop.
    * The dense left join shuffles on (region, day) against the
    * already-aggregated daily table (small), not against raw orders;
    * the cumulative window partitions by region — bounded state per
    * partition. Revenue sums ride DECIMAL(18,2) end-to-end (the
    * determinism contract), so the running total is exact and the
    * final DOUBLE cast is bit-stable on both engines.
    */
  val gapFill: QueryDef = QueryDef.sql(
    "q125_gap_fill",
    """WITH daily AS (SELECT r_name, CAST(o_orderdate AS DATE) AS day,
      |  count(*) AS n_orders,
      |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      | FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      | GROUP BY r_name, CAST(o_orderdate AS DATE)),
      | bounds AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
      |  CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
      | spine AS (SELECT r_name, unnest(generate_series(lo, hi,
      |   INTERVAL 1 DAY))::DATE AS day FROM region, bounds),
      | dense AS (SELECT s.r_name, s.day,
      |  coalesce(d.n_orders, 0) AS n_orders,
      |  coalesce(d.revenue, CAST(0 AS DECIMAL(18,2))) AS revenue
      | FROM spine s LEFT JOIN daily d
      |  ON s.r_name = d.r_name AND s.day = d.day)
      | SELECT r_name, day, n_orders,
      |  CAST(revenue AS DOUBLE) AS revenue,
      |  CAST(sum(revenue) OVER (PARTITION BY r_name ORDER BY day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   AS DOUBLE) AS cum_revenue
      | FROM dense ORDER BY r_name, day""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val daily = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("revenue"))
    val bounds = Tables.orders(s, d)
      .agg(min(col("o_orderdate").cast("date")).as("lo"),
        max(col("o_orderdate").cast("date")).as("hi"))
    val spine = Tables.region(s, d).select("r_name")
      .crossJoin(broadcast(bounds))
      .select(col("r_name"),
        explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy("r_name").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("r_name", "day"), "left")
      .select(col("r_name"), col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0).cast("decimal(18,2)"))
          .as("revenue"))
      .select(col("r_name"), col("day"), col("n_orders"),
        col("revenue").cast("double").as("revenue"),
        sum(col("revenue")).over(w).cast("double").as("cum_revenue"))
      .orderBy("r_name", "day")
  }

  /** q128 — gap sessions via Spark's NATIVE `session_window`
    * operator (the one the streaming path uses), pinned against an
    * independent gaps-and-islands SQL spelling. Boundary semantics
    * differ from q50's lag formulation in one edge: session_window's
    * end is EXCLUSIVE (end = last event + gap), so an event at
    * exactly gap distance starts a NEW session — the oracle flags
    * `diff >= gap` at microsecond precision where q50 uses strict
    * `>` at second precision. Running both spellings keeps the
    * native operator honest about exactly that edge.
    */
  val sessionWindowAgg: QueryDef = QueryDef.sql(
    "q128_session_window",
    s"""WITH ev AS (SELECT user_id, event_id, ts FROM events),
       | flagged AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
       |              >= ${SessionGapSec}000000
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       | sess AS (
       |  SELECT user_id, ts,
       |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged)
       | SELECT user_id, min(ts) AS session_start,
       |   max(ts) + INTERVAL $SessionGapSec SECOND AS session_end,
       |   CAST(count(*) AS BIGINT) AS n_events
       | FROM sess GROUP BY user_id, sid
       | ORDER BY user_id, session_start""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$SessionGapSec seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** q129 — rolling 7-day DISTINCT users per event type, by
    * contribution explode. `count(DISTINCT ...)` is not expressible
    * in a window frame (distinctness doesn't decompose over sliding
    * sums), and the naive spelling — self-join every window day
    * against its trailing week of events — is a range join that
    * explodes on hot days. The linear spelling: each (type, user,
    * day) observation CONTRIBUTES to exactly the 7 window-end days
    * it's visible from, so explode those 7 days, dedupe (type, user,
    * window-day) — one shuffle — and a plain count per (type,
    * window-day) IS the rolling distinct. Work is 7n rows whatever
    * the skew; both shuffles key on (type, day)-grade keys.
    */
  val rollingDistinct: QueryDef = QueryDef.sql(
    "q129_rolling_distinct",
    """WITH ev AS (SELECT DISTINCT event_type, user_id,
      |   CAST(ts AS DATE) AS day FROM events),
      | c AS (SELECT DISTINCT event_type, user_id,
      |   unnest(generate_series(day, day + INTERVAL 6 DAY,
      |     INTERVAL 1 DAY))::DATE AS wday
      |  FROM ev)
      | SELECT event_type, wday, CAST(count(*) AS BIGINT) AS users_7d
      | FROM c GROUP BY event_type, wday
      | ORDER BY event_type, wday""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        col("ts").cast("date").as("day")).distinct()
      .select(col("event_type"), col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("wday"))
      .distinct()
      .groupBy("event_type", "wday")
      .agg(count(lit(1)).as("users_7d"))
      .orderBy("event_type", "wday")
  }

  /** q135 — RUNNING cumulative distinct users per event type (the
    * all-time companion of q129's sliding window): also
    * frame-inexpressible as `count(DISTINCT) OVER`, and also linear
    * once decomposed — a user contributes to the running count
    * exactly once, at their FIRST day, so flag first occurrences
    * (one window keyed (type, user)), reduce to per-day new-user
    * counts, and a cumulative sum over the day series is the
    * answer. Two narrow shuffles; no distinct-state accumulation
    * anywhere.
    */
  val runningDistinct: QueryDef = QueryDef.sql(
    "q135_running_distinct",
    """WITH ev AS (SELECT DISTINCT event_type, user_id,
      |   CAST(ts AS DATE) AS day FROM events),
      | firsts AS (SELECT event_type, user_id, min(day) AS day
      |  FROM ev GROUP BY event_type, user_id),
      | daily AS (SELECT event_type, day,
      |   count(*) AS new_users FROM firsts GROUP BY event_type, day)
      | SELECT event_type, day,
      |  CAST(new_users AS BIGINT) AS new_users,
      |  CAST(sum(new_users) OVER (PARTITION BY event_type
      |   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
      |   CURRENT ROW) AS BIGINT) AS users_cum
      | FROM daily ORDER BY event_type, day""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        col("ts").cast("date").as("day"))
      .groupBy("event_type", "user_id").agg(min("day").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("new_users"))
      .select(col("event_type"), col("day"), col("new_users"),
        sum("new_users").over(w).cast("long").as("users_cum"))
      .orderBy("event_type", "day")
  }

  val defs: Seq[QueryDef] =
    Seq(sessionize, asofJoin, decayScore, funnel, asofJoinExec,
      cohortRetention, gapFill, sessionWindowAgg, rollingDistinct,
      runningDistinct)
}
