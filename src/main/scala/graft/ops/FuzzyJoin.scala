package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution primitive
  * (titles, product names, author strings) a curation stack runs
  * before merging records from different sources. Exact edit
  * distance, never a cartesian: candidates come from an equi join on
  * a BLOCKING key plus a length band (|len(a)−len(b)| ≤ d is a
  * necessary condition for levenshtein ≤ d), so the quadratic is
  * per-block and the expensive distance evaluates only on pairs that
  * already passed both cheap filters. At 100 TB the blocking key is
  * the shuffle key — each block's pairs materialize on one executor,
  * and skewed blocks split with the standard salting in
  * [[Layout]]. Levenshtein itself is Spark's codegen'd built-in, not
  * a UDF.
  *
  * The reference has no string-similarity surface; extension in the
  * dedup/ER direction.
  */
object FuzzyJoin {

  /** All intra-block pairs of `df(idCol, blockCol, strCol)` with
    * levenshtein ≤ maxDist. Output: (id_a, id_b, block, dist).
    */
  def blockedPairs(df: DataFrame, idCol: String, blockCol: String,
      strCol: String, maxDist: Int): DataFrame = {
    val s = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      col(strCol).as("str"), length(col(strCol)).as("len"))
    val a = s.select(col("block"), col("id").as("id_a"),
      col("str").as("str_a"), col("len").as("len_a"))
    val b = s.select(col("block"), col("id").as("id_b"),
      col("str").as("str_b"), col("len").as("len_b"))
    a.join(b, "block")
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      // the THRESHOLDED levenshtein: banded DP over a 2·maxDist+1
      // diagonal strip with early exit (returns -1 past the bound) —
      // O(len·d) per pair instead of O(len²), the difference between
      // a fuzzy join that scales and one that doesn't when blocks
      // are wide. Pairs at or under the bound get the exact distance,
      // so the result set matches the unthresholded spelling.
      .withColumn("dist",
        levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("block"), col("dist"))
  }

  /** q124 — near-identical part names within a brand block at edit
    * distance ≤ 2 (the oracle applies the identical blocking + band,
    * so pruning parity is by construction).
    */
  val fuzzyJoinQ: QueryDef = QueryDef.sql(
    "q124_fuzzy_string_join",
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  a.p_brand AS block,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      | FROM part a JOIN part b ON a.p_brand = b.p_brand
      |  AND a.p_partkey < b.p_partkey
      |  AND abs(len(a.p_name) - len(b.p_name)) <= 2
      | WHERE levenshtein(a.p_name, b.p_name) <= 2
      | ORDER BY id_a, id_b""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    blockedPairs(Tables.part(s, d), "p_partkey", "p_brand", "p_name", 2)
      .orderBy("id_a", "id_b")
  }

  val defs: Seq[QueryDef] = Seq(fuzzyJoinQ)
}
