package graft

import org.apache.spark.sql.functions._

/** Semantics of the iterative graph operator (q81). Value parity
  * with the unrolled SQL is the oracle's job; here we pin the
  * update rule against a hand-computed reference on a graph small
  * enough to verify mentally, plus structural invariants.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], iters: Int) =
    graph.PageRank
      .pageRank(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("one iteration matches the hand-computed update rule") {
    // A->B, B->A, C->A: N=3, uniform start 1/3, all out-weights 1.
    // r1(A) = 0.15/3 + 0.85*(1/3 + 1/3); r1(B) = 0.15/3 + 0.85/3;
    // r1(C) = 0.15/3 (no in-edges).
    val r = ranks(Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)), 1)
    assert(math.abs(r(1L) - (0.05 + 0.85 * 2.0 / 3.0)) < 1e-9)
    assert(math.abs(r(2L) - (0.05 + 0.85 / 3.0)) < 1e-9)
    assert(math.abs(r(3L) - 0.05) < 1e-9)
  }

  test("edge weights shift rank toward the heavier destination") {
    // A splits 3:1 between B and C; B and C cycle back to A.
    val r = ranks(Seq((1L, 2L, 3L), (1L, 3L, 1L),
      (2L, 1L, 1L), (3L, 1L, 1L)), 3)
    assert(r(2L) > r(3L), r.toString)
    // total mass conserved (every node has out-edges)
    assert(math.abs(r.values.sum - 1.0) < 1e-6, r.values.sum.toString)
  }

  test("dangling nodes keep only teleport mass and leak the rest") {
    // star into a sink: the sink has no out-edges, so its absorbed
    // rank leaves the system — total drops below 1 but stays above
    // the pure-teleport floor.
    val r = ranks(Seq((1L, 9L, 1L), (2L, 9L, 1L), (3L, 9L, 1L)), 3)
    assert(r(9L) > r(1L))
    val total = r.values.sum
    assert(total < 1.0 && total > 0.15, total.toString)
  }
}
