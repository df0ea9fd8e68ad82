package graft.ops

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
}
