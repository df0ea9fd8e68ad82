package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's statistics batch job re-expressed Spark-first:
  * three aggregation queries over the ratings stream
  * (`StatisticsRecommender.scala:54-55,79-86,101-102` — A1/A2/A3 +
  * F1/O1 in SURVEY §2), transplanted onto the testdata `events` table
  * with `event_id % N` as the product key.
  *
  * All three are single-shuffle hash aggregations (partial map-side
  * combine + final) — at 100 TB the only exchange is on the grouping
  * key, and the global sorts are range-partitioned by Spark's
  * `orderBy`. The reference's `changeDate` UDF
  * (`StatisticsRecommender.scala:73-76`) becomes the codegen'd
  * built-in `date_format` under a pinned UTC session zone, so it
  * stays prunable and never leaves whole-stage codegen.
  */
object Statistics {

  private val prodId = (col("event_id") % Tables.NumProducts).as("product_id")

  /** A1 + O1 — historical popularity: rating count per product. */
  val rateMoreProducts: QueryDef = QueryDef.sql(
    "q01_rate_more_products",
    s"""SELECT event_id % ${Tables.NumProducts} AS product_id,
       | count(*) AS cnt FROM events GROUP BY product_id
       | ORDER BY cnt DESC, product_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .select(prodId)
      .groupBy("product_id").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("product_id"))
  }

  /** A2 + F1 + O1 — recent popularity: counts per (yyyyMM, product). */
  val rateMoreRecently: QueryDef = QueryDef.sql(
    "q02_rate_more_recently",
    s"""SELECT CAST(strftime(ts, '%Y%m') AS INT) AS yearmonth,
       | event_id % ${Tables.NumProducts} AS product_id, count(*) AS cnt
       | FROM events GROUP BY yearmonth, product_id
       | ORDER BY yearmonth DESC, cnt DESC, product_id""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .select(
        date_format(col("ts"), "yyyyMM").cast("int").as("yearmonth"),
        prodId)
      .groupBy("yearmonth", "product_id").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("yearmonth"), desc("cnt"), asc("product_id"))
  }

  /** A3 — average score per product. Sum goes through DECIMAL so the
    * result is independent of partition/merge order (a plain double
    * sum is not associative and would flake against the oracle).
    */
  val averageScore: QueryDef = QueryDef.sql(
    "q03_avg_score",
    // UNROUNDED quotient on purpose: decimal-sum / count is a ratio of
    // exact quantities, bit-identical through IEEE division on both
    // engines — while round(...,4) of such rationals can sit exactly
    // on a decimal half-tie where engine rounding rules diverge.
    // Exactness of the decimal→double cast assumes the group's cent
    // sum stays below 2^53 (~9e13 cents per product) — beyond that,
    // engines may double-round differently and the parity contract
    // needs a DECIMAL-typed output instead.
    s"""SELECT event_id % ${Tables.NumProducts} AS product_id,
       | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
       | AS avg_score FROM events GROUP BY product_id
       | ORDER BY product_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .select(prodId, col("value"))
      .groupBy("product_id")
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_score"))
      .orderBy("product_id")
  }

  /** F1 — the reference's epoch→yyyyMM `changeDate` UDF as built-in
    * date expressions (no UDF: stays codegen'd and pushdown-friendly).
    */
  val dateConvert: QueryDef = QueryDef.sql(
    "q14_date_convert",
    """SELECT event_id, ts, CAST(strftime(ts, '%Y%m') AS INT) AS yearmonth,
      | CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date FROM events
      | ORDER BY event_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"), col("ts"),
        date_format(col("ts"), "yyyyMM").cast("int").as("yearmonth"),
        to_date(col("ts")).cast("string").as("event_date"))
      .orderBy("event_id")
  }

  /** Exact grouped quantiles (interpolating, type-7 — the definition
    * Spark `percentile` and DuckDB `quantile_cont` share). At scale
    * exact percentile needs the full group sorted on one reducer per
    * group; the approximate path for 100 TB is
    * `approx_percentile` (KLL/GK sketch, mergeable map-side) — both
    * spellings exposed here, the exact one oracle-gated, rounded so
    * the last-ulp interpolation noise is absorbed.
    */
  val quantiles: QueryDef = QueryDef.sql(
    "q55_quantiles",
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      | round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
      | FROM lineitem GROUP BY l_returnflag
      | ORDER BY l_returnflag""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
      .orderBy("l_returnflag")
  }

  /** Rows-per-group bound under which q66 serves EXACT percentiles
    * (full group sorted on one reducer — seconds at 10M doubles);
    * above it a group takes the KLL sketch. Override with
    * `spark.graft.exactQuantileLimit`.
    */
  def exactQuantileLimit(s: org.apache.spark.sql.SparkSession): Long =
    s.conf.getOption("spark.graft.exactQuantileLimit")
      .map(_.toLong).getOrElse(10000000L)

  private def q66MaxGroup(s: org.apache.spark.sql.SparkSession,
      d: String): Boolean =
    graft.Scale.within(s, s"$d#q66_maxgroup", exactQuantileLimit(s))(
      Tables.lineitem(s, d).groupBy("l_returnflag").count()
        .agg(max("count")).head().getLong(0))

  /** The raw KLL tier measured by the q66 gate (rank error vs the
    * exact sort), independent of which regime the registered query
    * serves: O(k·log(n/k)) state per group, map-side partials, only
    * sketches cross the shuffle.
    */
  def kllQuantileRows(s: org.apache.spark.sql.SparkSession, d: String)
      : DataFrame = {
    import graft.functions.QuantileSketch.kll_quantiles
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(kll_quantiles(col("l_extendedprice"), 256,
        Seq(0.25, 0.5, 0.75, 0.95)).as("qs"))
      .select(col("l_returnflag"),
        col("qs").getItem(0).as("p25"),
        col("qs").getItem(1).as("p50"),
        col("qs").getItem(2).as("p75"),
        col("qs").getItem(3).as("p95"))
  }

  /** Grouped quantiles with a per-group REGIME (the q68 graduation
    * pattern, q45's sibling): groups within [[exactQuantileLimit]]
    * rows serve q55's exact interpolated percentiles; larger groups
    * serve the mergeable KLL sketch — the only per-group state that
    * stays bounded at 100 TB. The regime signal is the group row
    * count (one cheap pre-aggregate). Below the bound the result is
    * exact and oracle-checked (q55's spelling + a regime column);
    * above it the oracle is withheld and QuantileSpec + the gate keep
    * measuring the raw sketch tier's rank error
    * ([[kllQuantileRows]]).
    */
  val quantileSketch: QueryDef = QueryDef.sqlCutover(
    "q66_quantile_sketch",
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      | round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      | 'exact' AS regime
      | FROM lineitem GROUP BY l_returnflag
      | ORDER BY l_returnflag""".stripMargin.replaceAll("\n", "")
  ) { (s, d) => !q66MaxGroup(s, d) } { (s, d) =>
    import graft.functions.QuantileSketch.kll_quantiles
    val li = Tables.lineitem(s, d)
    def exactAgg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
          round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
        .withColumn("regime", lit("exact"))
    if (q66MaxGroup(s, d)) exactAgg(li).orderBy("l_returnflag")
    else {
      val counts = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val small = counts.filter(col("n") <= exactQuantileLimit(s))
        .select("l_returnflag")
      val big = counts.filter(col("n") > exactQuantileLimit(s))
        .select("l_returnflag")
      val exactPart = exactAgg(
        li.join(broadcast(small), Seq("l_returnflag"), "left_semi"))
      val approxPart = li
        .join(broadcast(big), Seq("l_returnflag"), "left_semi")
        .groupBy("l_returnflag")
        .agg(kll_quantiles(col("l_extendedprice"), 256,
          Seq(0.25, 0.5, 0.75, 0.95)).as("qs"))
        .select(col("l_returnflag"),
          col("qs").getItem(0).as("p25"),
          col("qs").getItem(1).as("p50"),
          col("qs").getItem(2).as("p75"),
          col("qs").getItem(3).as("p95"))
        .withColumn("regime", lit("approx"))
      exactPart.unionByName(approxPart).orderBy("l_returnflag")
    }
  }

  /** Per-group outlier audit: mean/stddev of `value` per event_type
    * (Welford-free: exact DECIMAL sums of x and x², variance from the
    * closed form) and the count of events beyond 3σ — the screening
    * pass that finds broken trackers / corrupted shards in a new
    * 100 TB drop before it poisons training.
    *
    * Scale shape: two passes over the corpus (stats, then flagging —
    * the same re-scan-or-persist tradeoff as q98); each pass is a
    * narrow hash agg, and the flagging pass joins the
    * event_type-sized stats table as a broadcast, so the corpus never
    * shuffles. Float discipline: sums go through DECIMAL so partial
    * order can't perturb them; mean/std derive from those exact sums
    * with IEEE double ops, so both engines compute bit-identical
    * thresholds and the 3σ comparison can't flip across engines.
    * Overflow envelope: the square's input is DECIMAL(12,6) (|value|
    * < 10⁶ — events.value is bounded well under that), so x² is
    * DECIMAL(25,12) and the 38-precision sum keeps 13 integer digits
    * of headroom ≈ 10¹³ rows per group; an 18,6 square would sit at
    * the precision ceiling where Spark (non-ANSI) NULLs silently
    * while DuckDB raises — a silent-divergence hazard at 100 TB.
    */
  val outlierStats: QueryDef = QueryDef.sql(
    "q104_outlier_stats",
    """WITH st AS (SELECT event_type, count(*) AS n,
      |   sum(CAST(value AS DECIMAL(18,6))) AS sx,
      |   sum(CAST(value AS DECIMAL(12,6)) * CAST(value AS DECIMAL(12,6))) AS sxx
      |   FROM events GROUP BY event_type),
      | m AS (SELECT event_type, n,
      |   CAST(sx AS DOUBLE) / n AS mean,
      |   sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
      |     / (n - 1)) AS std FROM st)
      | SELECT m.event_type, m.n,
      |   round(m.mean, 4) AS mean, round(m.std, 4) AS std,
      |   count(*) FILTER (WHERE abs(e.value - m.mean) > 3 * m.std)
      |     AS n_outliers
      | FROM events e JOIN m ON e.event_type = m.event_type
      | GROUP BY m.event_type, m.n, m.mean, m.std
      | ORDER BY m.event_type""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val xd = col("value").cast("decimal(18,6)")
    val xq = col("value").cast("decimal(12,6)")
    val st = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(xd).as("sx"), sum(xq * xq).as("sxx"))
    val m = st.select(col("event_type"), col("n"),
      (col("sx").cast("double") / col("n")).as("mean"),
      sqrt((col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / col("n"))
        / (col("n") - lit(1))).as("std"))
    ev.join(broadcast(m), "event_type")
      .groupBy("event_type", "n", "mean", "std")
      .agg(count(when(abs(col("value") - col("mean")) > lit(3) * col("std"),
        1)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        round(col("mean"), 4).as("mean"), round(col("std"), 4).as("std"),
        col("n_outliers"))
      .orderBy("event_type")
  }

  /** Winsorization audit: clip `value` to the per-type [p1, p99]
    * band and report how much moved — the tail-taming companion to
    * the 3σ screen in q104 (robust to the heavy tails that inflate
    * σ itself).
    *
    * Scale shape: the bounds pass uses exact `percentile` (one
    * sorted reducer per group — fine for #event_type groups; the
    * 100 TB spelling swaps in the q66 KLL sketch, same contract);
    * the clip pass re-scans events with the tiny bounds table
    * broadcast. Parity: bounds round at 4 (interpolation ulp), the
    * clipped mean is an exact-DECIMAL-sum / count raw quotient.
    */
  val winsorize: QueryDef = QueryDef.sql(
    "q106_winsorize",
    """WITH b AS (SELECT event_type,
      |   round(quantile_cont(value, 0.01), 4) AS p01,
      |   round(quantile_cont(value, 0.99), 4) AS p99
      |   FROM events GROUP BY event_type)
      | SELECT e.event_type, count(*) AS n,
      |   count(*) FILTER (WHERE e.value < p01) AS n_low,
      |   count(*) FILTER (WHERE e.value > p99) AS n_high,
      |   CAST(sum(CAST(greatest(p01, least(p99, e.value))
      |     AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS clipped_mean
      | FROM events e JOIN b USING (event_type)
      | GROUP BY e.event_type ORDER BY e.event_type""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val bounds = ev.groupBy("event_type").agg(
      round(expr("percentile(value, 0.01)"), 4).as("p01"),
      round(expr("percentile(value, 0.99)"), 4).as("p99"))
    ev.join(broadcast(bounds), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(when(col("value") < col("p01"), 1)).as("n_low"),
        count(when(col("value") > col("p99"), 1)).as("n_high"),
        (sum(greatest(col("p01"), least(col("p99"), col("value")))
          .cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as("clipped_mean"))
      .orderBy("event_type")
  }

  /** q113 — per-segment OLS trend: closed-form slope/intercept of
    * `value` over time for each event_type, the drift screen that
    * tells a broken tracker (step change) from organic growth before
    * a 100 TB drop trains anything. ONE hash aggregate computes the
    * five sufficient statistics (n, Σx, Σy, Σxy, Σx²) with map-side
    * partials — no window, no join, no second pass; the slope then
    * falls out of the sums on the tiny per-type table.
    *
    * Float discipline: x is epoch seconds re-based to a fixed 2020
    * epoch (bounds x to ~9 digits so x² sums stay far under the
    * DECIMAL(38) ceiling — same envelope reasoning as q104); all five
    * sums are exact DECIMAL, cast to double only for the final
    * closed form, which is then identical IEEE arithmetic on
    * identical inputs in both engines. round(…,6/4) on the
    * quotients absorbs nothing here but keeps output width stable.
    */
  val groupTrend: QueryDef = QueryDef.sql(
    "q113_group_trend",
    """WITH b AS (SELECT event_type,
      |   CAST(epoch_us(ts) // 1000000 - 1600000000 AS BIGINT) AS x,
      |   value AS y FROM events),
      | s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |   CAST(sum(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
      |   CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
      |   CAST(sum(CAST(x AS DECIMAL(14,0)) * CAST(y AS DECIMAL(12,6)))
      |     AS DOUBLE) AS sxy,
      |   CAST(sum(CAST(x AS DECIMAL(14,0)) * CAST(x AS DECIMAL(14,0)))
      |     AS DOUBLE) AS sxx
      |  FROM b GROUP BY event_type)
      | SELECT event_type, n,
      |   round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400.0, 6) + 0.0
      |     AS slope_per_day,
      |   round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
      |     4) + 0.0 AS intercept
      | FROM s ORDER BY event_type""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val b = Tables.events(s, d).select(col("event_type"),
      (col("ts").cast("long") - lit(1600000000L)).as("x"),
      col("value").as("y"))
    val st = b.groupBy("event_type").agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("decimal(18,0)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
      sum(col("x").cast("decimal(14,0)") * col("y").cast("decimal(12,6)"))
        .cast("double").as("sxy"),
      sum(col("x").cast("decimal(14,0)") * col("x").cast("decimal(14,0)"))
        .cast("double").as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    // + 0.0 normalizes a signed zero (the q144 r9 lesson): a drift
    // slope is near zero BY DESIGN, so its rounded value can land on
    // -0.0 in DuckDB vs +0.0 here.
    st.select(col("event_type"), col("n"),
      (round(slope * lit(86400.0), 6) + lit(0.0)).as("slope_per_day"),
      (round((col("sy") - slope * col("sx")) / col("n"), 4) + lit(0.0))
        .as("intercept"))
      .orderBy("event_type")
  }

  /** q118 — per-segment Pearson correlation between hour-of-day and
    * value: the diurnal-pattern screen (a metric that correlates with
    * wall clock is seasonal, not stationary — it needs detrending
    * before any threshold alert). Same single-hash-aggregate
    * sufficient-statistics framework as q113 with Σy² added; hour
    * derives from epoch integer arithmetic ((epoch // 3600) % 24),
    * not engine time functions, so x is engine-free. The closed form
    * runs on exact-DECIMAL sums cast to double — identical IEEE
    * arithmetic both engines; degenerate variance → NULL in both.
    */
  val groupCorrelation: QueryDef = QueryDef.sql(
    "q118_group_correlation",
    """WITH b AS (SELECT event_type,
      |   CAST((epoch_us(ts) // 1000000 // 3600) % 24 AS BIGINT) AS x,
      |   value AS y FROM events),
      | s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |   CAST(sum(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
      |   CAST(sum(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
      |   CAST(sum(CAST(x AS DECIMAL(14,0)) * CAST(y AS DECIMAL(12,6)))
      |     AS DOUBLE) AS sxy,
      |   CAST(sum(CAST(x AS DECIMAL(14,0)) * CAST(x AS DECIMAL(14,0)))
      |     AS DOUBLE) AS sxx,
      |   CAST(sum(CAST(y AS DECIMAL(12,6)) * CAST(y AS DECIMAL(12,6)))
      |     AS DOUBLE) AS syy
      |  FROM b GROUP BY event_type)
      | SELECT event_type, n,
      |   CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0
      |     THEN NULL ELSE
      |     round((n * sxy - sx * sy) /
      |       sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
      |   END AS hour_value_corr
      | FROM s ORDER BY event_type""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val b = Tables.events(s, d).select(col("event_type"),
      ((col("ts").cast("long") / 3600).cast("long") % 24).as("x"),
      col("value").as("y"))
    val st = b.groupBy("event_type").agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("decimal(18,0)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(18,6)")).cast("double").as("sy"),
      sum(col("x").cast("decimal(14,0)") * col("y").cast("decimal(12,6)"))
        .cast("double").as("sxy"),
      sum(col("x").cast("decimal(14,0)") * col("x").cast("decimal(14,0)"))
        .cast("double").as("sxx"),
      sum(col("y").cast("decimal(12,6)") * col("y").cast("decimal(12,6)"))
        .cast("double").as("syy"))
    val den = (col("n") * col("sxx") - col("sx") * col("sx")) *
      (col("n") * col("syy") - col("sy") * col("sy"))
    // + 0.0 normalizes a signed zero (the q144 r9 lesson): an
    // uncorrelated segment's r rounds to ±0.0 engine-dependently.
    st.select(col("event_type"), col("n"),
      when(den <= 0, lit(null))
        .otherwise(round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt(den), 6) + lit(0.0)).as("hour_value_corr"))
      .orderBy("event_type")
  }

  /** q132 — exact two-sample Kolmogorov–Smirnov statistic per event
    * type: the distribution-drift screen a pipeline runs between
    * corpus snapshots or A/B splits (here: the deterministic
    * event-id parity split, so the statistic measures the monitor's
    * null-hypothesis noise floor). KS = max |F₁(v) − F₂(v)| over
    * the combined support, computed EXACTLY in one pass: tag each
    * row with its split, one RANGE-framed window (ties: a RANGE
    * frame sums peers, so the CDF jumps land exactly on tied
    * values — a ROWS frame here would be wrong), then a max
    * aggregate. One shuffle on (type) for the window, one for the
    * final agg — no per-value join, no sort beyond the window's.
    * Parity: counts are ints, the two divisions and the abs/max are
    * identically-ordered IEEE ops on both engines.
    */
  val ksDrift: QueryDef = QueryDef.sql(
    "q132_ks_drift",
    """WITH t AS (SELECT event_type, value,
      |   CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS g1
      |  FROM events),
      | n AS (SELECT event_type, CAST(sum(g1) AS BIGINT) AS n1,
      |   CAST(sum(1 - g1) AS BIGINT) AS n2
      |  FROM t GROUP BY event_type),
      | c AS (SELECT event_type, value,
      |   sum(g1) OVER w AS c1, sum(1 - g1) OVER w AS c2
      |  FROM t WINDOW w AS (PARTITION BY event_type ORDER BY value
      |   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      | SELECT c.event_type,
      |  max(abs(CAST(c1 AS DOUBLE) / n.n1
      |    - CAST(c2 AS DOUBLE) / n.n2)) AS ks,
      |  any_value(n.n1) AS n1, any_value(n.n2) AS n2
      | FROM c JOIN n ON c.event_type = n.event_type
      | GROUP BY c.event_type ORDER BY c.event_type""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val t = Tables.events(s, d).select(col("event_type"), col("value"),
      when(col("event_id") % 2 === 0, 1).otherwise(0).as("g1"))
    val n = t.groupBy("event_type")
      .agg(sum("g1").cast("long").as("n1"),
        sum(lit(1) - col("g1")).cast("long").as("n2"))
    val w = Window.partitionBy("event_type").orderBy("value")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("c1", sum("g1").over(w))
      .withColumn("c2", sum(lit(1) - col("g1")).over(w))
      .join(broadcast(n), "event_type")
      .groupBy("event_type")
      .agg(max(abs(col("c1").cast("double") / col("n1")
        - col("c2").cast("double") / col("n2"))).as("ks"),
        first("n1").as("n1"), first("n2").as("n2"))
      .orderBy("event_type")
  }

  val defs: Seq[QueryDef] =
    Seq(rateMoreProducts, rateMoreRecently, averageScore, dateConvert,
      quantiles, quantileSketch, outlierStats, winsorize, groupTrend,
      groupCorrelation, ksDrift)
}
