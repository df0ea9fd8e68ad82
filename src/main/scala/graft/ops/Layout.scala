package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout toolkit: the two techniques that decide whether a
  * 100 TB join is one shuffle, zero shuffles, or a straggler parade.
  * The reference has no notion of either (every join reshuffles or
  * round-trips an external store); these are engine-level utilities
  * used by tests and available to any pipeline built on the library.
  */
object Layout {

  /** Persist `df` bucketed (and sorted) by `keys` into the session
    * catalog. Two tables bucketed the same way join with ZERO
    * exchanges — at scale this converts every recurring fact⋈fact
    * join on the bucket key from a full shuffle into a local merge.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Hive-style partitioned parquet layout: one directory per value of
    * `cols`. Reads that filter on the partition column scan only the
    * matching directories (partition pruning — visible as
    * PartitionFilters in the plan), which at 100 TB is the difference
    * between scanning a day and scanning a decade.
    */
  def writePartitioned(df: DataFrame, dir: String,
      cols: Seq[String]): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(dir)

  /** Salted equi join for skewed keys: the large (skewed) side gets a
    * deterministic per-row salt in [0, salts); the small side is
    * replicated once per salt value; the join key becomes
    * (key, salt), spreading a hot key over `salts` reducers.
    * Semantically identical to `large.join(small, key)` for
    * inner/left joins on unique small-side keys. AQE's skew handling
    * covers sort-merge cases automatically; explicit salting is for
    * when the skew is known and extreme (power-law keys at 100 TB).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    // Salt from the row CONTENT, not monotonically_increasing_id():
    // the id is assigned per task attempt, so a retried stage would
    // re-salt rows differently; a content hash is stable across
    // retries. MapType columns are unhashable in Spark and are
    // excluded. Limitation: a hot key dominated by EXACT duplicate
    // rows co-salts onto one reducer — for that shape rely on AQE's
    // skew split, which divides by data size, not key.
    val hashable = large.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name))
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(hashable: _*), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** q79 — salted skew join, oracle-gated against the plain join it
    * must be semantically identical to: `events` (the fact side)
    * joins a per-type dimension on `event_type`, a handful of
    * distinct values — exactly the shape where, on a power-law
    * production corpus, one hot key pins a single reducer while the
    * other 999 executors idle. The salt spreads each key over
    * `salts` reducers; the small side replicates once per salt (a
    * few dozen rows — free). The `shuffle_hash` hint keeps the demo
    * honest: without it Catalyst would broadcast the tiny dim and
    * hide the skew path the query exists to exercise.
    *
    * The synthetic corpus is uniform over 5 types, which is why the
    * oracle can be an exact plain-join compare — the salt must be
    * invisible in the RESULT regardless of the distribution.
    */
  val saltedJoinQ: QueryDef = QueryDef.sql(
    "q79_salted_join",
    """WITH dim AS (SELECT event_type, count(*) AS type_n
      |  FROM events GROUP BY event_type)
      | SELECT e.event_type, count(*) AS n,
      |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  max(d.type_n) AS type_n
      | FROM events e JOIN dim d USING (event_type)
      | GROUP BY e.event_type ORDER BY e.event_type"""
      .stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val dim = ev.groupBy("event_type")
      .agg(count(lit(1)).as("type_n"))
    saltedJoin(ev, dim.hint("shuffle_hash"), "event_type", salts = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"),
        max("type_n").as("type_n"))
      .orderBy("event_type")
  }

  /** Z-order layout key over (user, product): the write-side layout
    * step for a fact table queried by EITHER dimension. Sorting or
    * range-partitioning output files by this key keeps per-file
    * min/max tight on both columns, so single-dimension predicates
    * prune files regardless of which dimension they hit (LayoutSpec
    * measures the bounding-box shrink vs natural order). The key is
    * one codegen'd expression ([[graft.functions.ZOrderKey]], 24
    * shift/mask ops, branch-free) — the layout pass adds no
    * interpreted stage to the write path. The oracle recomputes the
    * interleave bit-by-bit.
    */
  val zorderKey: QueryDef = QueryDef.sql(
    "q94_zorder_key",
    """SELECT event_id, CAST(list_sum(
      |  [(((CAST(user_id AS BIGINT) >> i) & 1) << (2*i))
      |   + ((((event_id % 200) >> i) & 1) << (2*i+1))
      |   for i in generate_series(0, 31)]) AS BIGINT) AS zkey
      | FROM events ORDER BY event_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        graft.functions.LayoutFunctions.zorder_key(
          col("user_id").cast("int"),
          (col("event_id") % 200).cast("int")).as("zkey"))
      .orderBy("event_id")
  }

  val defs: Seq[QueryDef] = Seq(saltedJoinQ, zorderKey)
}
