package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational core: the reference's projection/filter/join/sort
  * surface (SURVEY §2.2, §2.3, §2.6, §2.7) exercised on the TPC-H-ish
  * testdata tables. Everything is declarative DataFrame code — Catalyst
  * supplies pushdown, pruning, join selection and AQE; the only hints
  * we give are `broadcast()` on genuinely small dimension tables.
  */
object Relational {

  /** P1/P3 — projection + predicate filter, pushed to the parquet scan
    * (`OfflineRecommender.scala:57,76`). `.explain` must show
    * PushedFilters on l_quantity/l_discount and a 4-column ReadSchema.
    */
  val projectFilter: QueryDef = QueryDef.sql(
    "q04_project_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      | FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.02
      | ORDER BY l_orderkey, l_linenumber""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_discount") <= 0.02)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** A6 — distinct (`OfflineRecommender.scala:60-61`). */
  val distinctFlags: QueryDef = QueryDef.sql(
    "q05_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      | ORDER BY l_returnflag, l_linestatus""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** J3 — equi join + aggregation (`ALSTrainer.scala:68-72`). The
    * orders⋈customer join shuffles on the customer key; sums go
    * through DECIMAL for order-independence.
    */
  val joinEquiAgg: QueryDef = QueryDef.sql(
    "q06_join_equi_agg",
    """SELECT c_mktsegment, count(*) AS order_cnt,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      | FROM orders JOIN customer ON o_custkey = c_custkey
      | GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("order_cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .orderBy("c_mktsegment")
  }

  /** Flagship 5-way star join (TPC-H Q5 shape): revenue per nation in
    * ASIA for 1996 orders. Dimension tables (region, nation) are
    * explicitly broadcast — at 100 TB the fact-side shuffle on the
    * join keys is the only exchange; AQE picks broadcast for customer
    * when it fits.
    */
  val joinFiveWay: QueryDef = QueryDef.sql(
    "q07_join_5way",
    """SELECT n_name, count(*) AS line_cnt,
      | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      | AS DOUBLE) AS revenue
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      | WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      | AND o_orderdate < TIMESTAMP '1997-01-01'
      | GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
      .replaceAll("\n", "")
  ) { (s, d) =>
    val ord = Tables.orders(s, d).filter(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("line_cnt"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** J5/P6 — anti join: customers holding no pending ('P') order
    * (`StreamingRecommender.scala:182-183` NOT-IN → left_anti).
    */
  val antiJoin: QueryDef = QueryDef.sql(
    "q08_anti_join",
    """SELECT c_custkey, c_name FROM customer
      | WHERE NOT EXISTS (SELECT 1 FROM orders
      | WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      | ORDER BY c_custkey""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Semi join: customers holding at least one finished order. */
  val semiJoin: QueryDef = QueryDef.sql(
    "q09_semi_join",
    """SELECT c_custkey, c_acctbal FROM customer
      | WHERE c_acctbal > 1000 AND EXISTS (SELECT 1 FROM orders
      | WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      | ORDER BY c_custkey""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_acctbal") > 1000)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** J2/P4 — self theta join: nation pairs within a region, self-pairs
    * dropped via key inequality (`OfflineRecommender.scala:99-100`).
    */
  val selfThetaJoin: QueryDef = QueryDef.sql(
    "q10_self_theta_join",
    """SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey AS regionkey
      | FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
      | AND a.n_nationkey < b.n_nationkey
      | ORDER BY regionkey, n1, n2""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val a = Tables.nation(s, d).alias("a")
    val b = Tables.nation(s, d).alias("b")
    a.join(b,
        col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") < col("b.n_nationkey"))
      .select(
        col("a.n_name").as("n1"), col("b.n_name").as("n2"),
        col("a.n_regionkey").as("regionkey"))
      .orderBy("regionkey", "n1", "n2")
  }

  /** A4/O2 — per-group top-K as a real window function: the
    * reference's `groupByKey + sortWith.take(20)`
    * (`OfflineRecommender.scala:77-84`) becomes
    * `row_number() over (partition by ... order by ...) <= K`, which
    * Spark executes with WindowGroupLimit pushdown (per-partition
    * top-K heaps before the shuffle — no full per-group sort).
    */
  val topKPerGroup: QueryDef = QueryDef.sql(
    "q11_topk_window",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
      | FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number()
      | OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      | AS rn FROM orders) t WHERE rn <= 3
      | ORDER BY o_custkey, rn""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** O1/O3 — global top-N: orderBy+limit compiles to
    * TakeOrderedAndProject (per-partition heaps, no total sort).
    */
  val sortLimit: QueryDef = QueryDef.sql(
    "q12_sort_limit",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      | ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      | LIMIT 100""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"),
        asc("l_linenumber"))
      .limit(100)
  }

  /** Set op: union of two key spaces + re-aggregation (beyond the
    * reference, which has no set operations — SURVEY §2.7).
    */
  val unionKeys: QueryDef = QueryDef.sql(
    "q17_union",
    """SELECT key, count(*) AS cnt FROM (SELECT c_custkey AS key FROM customer
      | UNION ALL SELECT s_suppkey FROM supplier) t
      | GROUP BY key ORDER BY key""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.customer(s, d).select(col("c_custkey").as("key"))
      .union(Tables.supplier(s, d).select(col("s_suppkey").as("key")))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy("key")
  }

  /** Set op: intersect — customers with both open and finished orders. */
  val intersectKeys: QueryDef = QueryDef.sql(
    "q18_intersect",
    """SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
      | INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      | ORDER BY key""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("key"))
      .intersect(
        o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("key")))
      .orderBy("key")
  }

  /** Multiset (bag) difference — `EXCEPT ALL` — which, unlike the
    * distinct set ops (q17/q18), must track per-key multiplicities:
    * each right occurrence cancels ONE left occurrence. Spark plans
    * `exceptAll` as a count-diff aggregate + generate (one shuffle),
    * not a join per duplicate — the shape that survives a fact table
    * with millions of repeats per key. Grouped output keeps the
    * result compact and the hash compare order-free.
    */
  val exceptAll: QueryDef = QueryDef.sql(
    "q96_except_all",
    """SELECT key, count(*) AS cnt FROM (
      | SELECT l_partkey AS key FROM lineitem
      | EXCEPT ALL SELECT p_partkey FROM part) t
      | GROUP BY key ORDER BY key""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.lineitem(s, d).select(col("l_partkey").as("key"))
      .exceptAll(Tables.part(s, d).select(col("p_partkey").as("key")))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy("key")
  }

  /** q115 — bloom-pre-filtered fact-dim join: the dimension side is
    * selective (p_size = 5 keeps ~2% of parts), so its join keys fold
    * into one broadcast bloom and the FACT side filters on a scalar
    * probe BEFORE its exchange — shuffled fact bytes drop to ~the
    * matching rows plus a vanishing false-positive trickle, which the
    * real join then drops. Semantics are exactly the plain join (a
    * bloom has no false negatives), so the query is fully
    * hash-gated against the un-filtered oracle; PlanSpec pins the
    * probe's position under the join. This is the engine-controlled,
    * deterministic spelling of AQE's runtime row filters — the shape
    * that matters when the fact side is 100 TB and the exchange is
    * the job.
    */
  val bloomJoin: QueryDef = QueryDef.sql(
    "q115_bloom_join",
    """SELECT p_type, count(*) AS n,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |   AS revenue
      | FROM lineitem JOIN part ON l_partkey = p_partkey
      | WHERE p_size = 5
      | GROUP BY p_type ORDER BY p_type""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    import graft.functions.BloomFilters._
    val dim = Tables.part(s, d).filter(col("p_size") === 5)
    val bloom = dim
      .agg(bloom_build(array(xxhash64(col("p_partkey"))), 1 << 20, 7)
        .as("bf"))
    Tables.lineitem(s, d).select("l_partkey", "l_extendedprice")
      .filter(bloom_contains_any(bloom.scalar(),
        array(xxhash64(col("l_partkey"))), 7))
      .join(dim.select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_type")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("p_type")
  }

  val defs: Seq[QueryDef] = Seq(
    projectFilter, distinctFlags, joinEquiAgg, joinFiveWay, antiJoin,
    semiJoin, selfThetaJoin, topKPerGroup, sortLimit, unionKeys,
    intersectKeys, exceptAll, bloomJoin)
}
