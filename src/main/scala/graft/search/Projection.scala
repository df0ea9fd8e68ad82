package graft.search

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sign (±1) random projection — the Johnson–Lindenstrauss dimension
  * reduction a 100 TB embedding pipeline runs before storing or
  * indexing vectors: d_in → d_out with pairwise distances preserved
  * to O(1/√d_out), at 1/4 the storage and ANN cost. Achlioptas
  * (2003) showed ±1 entries lose nothing vs Gaussian — and they make
  * the projection exact integer sign flips, which is what lets the
  * whole operator be oracle-checked bit-for-bit.
  *
  * Scale shape: the projection matrix is a CONSTANT (derived, not
  * shipped — each executor re-derives it from the seed string), so
  * the operator is a narrow per-row map with zero shuffle, zero
  * broadcast, zero driver state: exactly as scan-friendly as a
  * column projection. Each output dim is a fixed left-associated
  * chain of float adds/subtracts — codegen-able arithmetic, no
  * higher-order-function lambdas (those run interpreted per
  * element), and bit-identical on any engine that evaluates the
  * chain in written order (the oracle spells out the same chain).
  */
object Projection {

  val DimIn = 64
  val DimOut = 16

  /** Deterministic ±1 from md5 of "graft_rp_<j>_<i>" — stable across
    * sessions, executors, and engines; no RNG state to ship.
    */
  def sign(j: Int, i: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft_rp_${j}_$i".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1 else -1
  }

  /** Column for output dim `j` over `vec`: ±vec[1] ± vec[2] ± … as a
    * fixed left-assoc add chain (1-based element_at, matching SQL).
    */
  def projectDim(vec: Column, j: Int, dIn: Int = DimIn): Column =
    (1 to dIn).map { i =>
      val e = element_at(vec, i).cast("double")
      if (sign(j, i) > 0) e else -e
    }.reduceLeft(_ + _)

  /** q82 — project the 64-d corpus embeddings to 16 dims. The oracle
    * is generated from the same sign matrix, so this pins the exact
    * arithmetic, not just the shape.
    */
  val randomProjection: QueryDef = {
    val sqlDims = (0 until DimOut).map { j =>
      val chain = (1 to DimIn).map { i =>
        val t = s"CAST(embedding[$i] AS DOUBLE)"
        if (i == 1) { if (sign(j, i) > 0) t else s"-$t" }
        else { if (sign(j, i) > 0) s" + $t" else s" - $t" }
      }.mkString
      s"($chain) AS p${"%02d".format(j)}"
    }.mkString(", ")
    QueryDef.sql(
      "q82_random_projection",
      s"SELECT vec_id, $sqlDims FROM embeddings ORDER BY vec_id"
    ) { (s, d) =>
      val cols = col("vec_id") +: (0 until DimOut).map(j =>
        projectDim(col("embedding"), j).as("p" + "%02d".format(j)))
      Tables.embeddings(s, d).select(cols: _*).orderBy("vec_id")
    }
  }

  val defs: Seq[QueryDef] = Seq(randomProjection)
}
