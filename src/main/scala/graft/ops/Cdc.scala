package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture primitive a
  * training-data pipeline needs the moment its corpus is refreshed
  * in place: given two versions of a keyed table, classify every key
  * as `insert` / `delete` / `update` (unchanged keys are dropped —
  * they are the overwhelming bulk at scale and carrying them defeats
  * the point of a diff).
  *
  * Scale shape: ONE full-outer equi join on the key — Catalyst plans
  * a shuffle on the key for both sides (or a zero-shuffle sort-merge
  * when both snapshots are bucketed by the key, the layout a
  * snapshot store would use). Non-key columns ride the join packed
  * into a single struct each, and change detection is one null-safe
  * struct comparison (`<=>`), not N per-column predicates — the
  * comparison width doesn't change the plan shape. No driver
  * materialization at any point.
  *
  * The reference has no versioned store (Mongo collections are
  * overwritten in place, `DataLoader.scala:76-90`); this is the
  * operator that makes such an overwrite observable downstream.
  */
object Cdc {

  /** Generic diff: `(keys..., op)` for every key whose row was
    * inserted, deleted, or changed between `oldSnap` and `newSnap`.
    * Both inputs must share the schema; `keys` must be unique per
    * snapshot (a snapshot is a keyed table, not an event log).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    val dataCols = oldSnap.columns.filterNot(keys.contains)
    val o = oldSnap.select(keys.map(col) :+
      struct(dataCols.map(col): _*).as("__old"): _*)
    val n = newSnap.select(keys.map(col) :+
      struct(dataCols.map(col): _*).as("__new"): _*)
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("__old").isNull, lit("insert"))
          .when(col("__new").isNull, lit("delete"))
          .when(!(col("__old") <=> col("__new")), lit("update")))
      .filter(col("op").isNotNull)
      .select(keys.map(col) :+ col("op"): _*)
  }

  /** q71 — snapshot diff over two deterministic versions of `orders`:
    * version A drops keys ≡ 0 (mod 97), version B drops keys ≡ 0
    * (mod 89) and rewrites status/price for keys ≡ 0 (mod 13). The
    * modifications are integer-keyed and the floating add is applied
    * identically on both engines, so the oracle compare is exact.
    */
  val snapshotDiffQ: QueryDef = QueryDef.sql(
    "q71_snapshot_diff",
    """WITH a AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
      | b AS (SELECT o_orderkey, o_custkey,
      |   CASE WHEN o_orderkey % 13 = 0 THEN 'R' ELSE o_orderstatus END
      |     AS o_orderstatus,
      |   CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
      |     ELSE o_totalprice END AS o_totalprice,
      |   o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 89 <> 0),
      | d AS (SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |   CASE WHEN a.o_orderkey IS NULL THEN 'insert'
      |        WHEN b.o_orderkey IS NULL THEN 'delete'
      |        WHEN (a.o_custkey IS DISTINCT FROM b.o_custkey)
      |          OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
      |          OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
      |          OR (a.o_orderdate IS DISTINCT FROM b.o_orderdate)
      |          OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
      |        THEN 'update' END AS op
      |  FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey)
      | SELECT o_orderkey, op FROM d WHERE op IS NOT NULL
      | ORDER BY o_orderkey""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val orders = Tables.orders(s, d)
    val a = orders.filter(col("o_orderkey") % 97 =!= 0)
    val b = orders.filter(col("o_orderkey") % 89 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 13 === 0, lit("R"))
          .otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    snapshotDiff(a, b, Seq("o_orderkey")).orderBy("o_orderkey")
  }

  /** q83 — incremental aggregate maintenance: the other half of the
    * CDC story. A nightly-refreshed corpus metric must NOT be
    * recomputed from 100 TB of history per refresh; the maintained
    * form keeps an aggregate STATE table (count + exact decimal sum
    * per group — associative partials, the same shape Spark's own
    * partial aggregation uses) and folds each delta batch in with a
    * state ∪ delta → re-aggregate merge, touching only O(groups +
    * delta) rows. The oracle is the from-scratch aggregate over the
    * full table — the maintained result must be indistinguishable
    * from recomputation, which is exactly why the partials are
    * decimal (double partials would drift order-dependently).
    *
    * Here state = events before Jan 24, delta = the rest; the same
    * merge runs unchanged as a `foreachBatch` fold in the streaming
    * path (StreamPipeline), this is its batch spelling.
    */
  val incrementalAgg: QueryDef = QueryDef.sql(
    "q83_incremental_agg",
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      | FROM events GROUP BY event_type ORDER BY event_type"""
      .stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val ev = Tables.events(s, d).select(col("ts"), col("event_type"),
      col("value").cast("decimal(18,2)").as("v"))
    val cutoff = lit("2024-01-24 00:00:00").cast("timestamp")
    def partials(df: DataFrame): DataFrame =
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val state = partials(ev.filter(col("ts") < cutoff))
    val delta = partials(ev.filter(col("ts") >= cutoff))
    state.unionByName(delta)
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("sv").cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  /** SCD2 history build: each (user, product) interaction becomes a
    * versioned row with `[valid_from, valid_to)` effectivity — the
    * slowly-changing-dimension shape every warehouse keeps for
    * point-in-time training-data reconstruction ("what did the user's
    * state look like when this label was generated?"). The reference
    * overwrites state in place (`findAndRemove` + insert,
    * `StreamingRecommender.scala:254-263`), losing history; this is
    * the auditable spelling.
    *
    * Scale shape: one window over the natural key — a single shuffle
    * on (u, p), no self-join (the naive `lead` spelling as a
    * range-join would rescan history per row). Ties on ts break by
    * event_id on BOTH engines so version chains are deterministic;
    * the final sort pins NULLS FIRST explicitly because Spark and
    * DuckDB disagree on the default.
    */
  val scd2History: QueryDef = QueryDef.sql(
    "q93_scd2_history",
    """WITH r AS (SELECT CAST(user_id AS INT) AS u,
      |   CAST(event_id % 200 AS INT) AS p, ts, event_id, value
      |   FROM events),
      | h AS (SELECT u, p, value, ts AS valid_from,
      |   lead(ts) OVER (PARTITION BY u, p ORDER BY ts, event_id)
      |     AS valid_to FROM r)
      | SELECT u AS user_id, p AS product_id, value, valid_from, valid_to,
      |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INT)
      |    AS is_current
      | FROM h ORDER BY user_id, product_id, valid_from,
      |  valid_to NULLS FIRST, value""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val w = Window.partitionBy("u", "p").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id").cast("int").as("u"),
        (col("event_id") % 200).cast("int").as("p"),
        col("ts"), col("event_id"), col("value"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("u").as("user_id"), col("p").as("product_id"),
        col("value"), col("ts").as("valid_from"), col("valid_to"),
        when(col("valid_to").isNull, 1).otherwise(0).cast("int")
          .as("is_current"))
      .orderBy(asc("user_id"), asc("product_id"), asc("valid_from"),
        asc_nulls_first("valid_to"), asc("value"))
  }

  val defs: Seq[QueryDef] = Seq(snapshotDiffQ, incrementalAgg, scd2History)
}
