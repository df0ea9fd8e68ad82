package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Exactness of the prefix-filtered set-similarity join (q121): the
  * whole point of the operator is zero recall loss vs the quadratic
  * brute force, so parity is asserted pair-for-pair — including
  * threshold-boundary pairs whose Jaccard is exactly 3/5 — plus the
  * plan shape that makes it scale (no cartesian anywhere).
  */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  private def brute(docs: Seq[(Long, String)], t: Double) =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      j = jaccard(ta.split(" ").toSet, tb.split(" ").toSet)
      if j >= t
    } yield (ia, ib, j)).toSet

  private def run(docs: Seq[(Long, String)]) =
    dedup.SetSimJoin.allPairs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("pair-for-pair parity with brute force on a seeded corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 120).map(i => s"w$i")
    // clustered docs (template + per-doc noise) so similar pairs exist
    val base: Seq[(Long, String)] = (0 until 60).map { i =>
      val toks = rnd.shuffle(vocab).take(20 + rnd.nextInt(15)) ++
        rnd.shuffle(vocab).take(rnd.nextInt(6))
      (i.toLong, toks.distinct.mkString(" "))
    }
    val nearCopies = (0 until 20).map { i =>
      // near-copy of a base doc with small perturbations
      val src = base((i * 3) % 60)._2.split(" ")
      (100L + i, (src.drop(rnd.nextInt(3)) :+ s"extra$i").mkString(" "))
    }
    val docs = base ++ nearCopies
    val expected = brute(docs, 0.6)
    assert(expected.nonEmpty, "test corpus produced no similar pairs")
    assert(run(docs) == expected)
  }

  test("threshold boundary: jaccard exactly 3/5 is included") {
    val docs = Seq(
      (1L, "t1 t2 t3 x1"), // inter 3, union 5 vs doc 2 -> exactly 0.6
      (2L, "t1 t2 t3 y1"),
      (3L, "a1 a2 b1 b2"), // inter 2, union 4 vs doc 4 -> 0.5, excluded
      (4L, "a1 a2 c1 c2"))
    val got = run(docs)
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)), got.toString)
    assert(got.head._3 == 0.6d)
  }

  test("caller-supplied threshold: boundary pair at J == t survives " +
      "the pruning bounds (scaled-integer regression)") {
    import spark.implicits._
    // t = 0.07, |a| = 100, |b| = 7, all 7 of b's tokens in a:
    // J = 7/100 = 0.07 >= t. The old float length bound pruned this
    // pair (100 * 0.07 rounds to 7.000000000000001 > 7); the
    // floor-scaled integer bound must keep it.
    val aToks = (1 to 100).map(i => s"w$i").mkString(" ")
    val bToks = (1 to 7).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, aToks), (2L, bToks)).toDF("doc_id", "text")
    val pairs = dedup.SetSimJoin
      .allPairs(docs, "doc_id", "text", t = 0.07)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"J==t boundary pair pruned at t=0.07: $pairs")
  }

  test("disjoint and identical sets behave at the extremes") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val got = run(docs)
    assert(got == Set((1L, 2L, 1.0d)), got.toString)
  }

  test("plan: no cartesian product in the full pipeline") {
    val p = dedup.SetSimJoin
      .allPairs(Tables.documents(spark, sfTiny), "doc_id", "text")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
