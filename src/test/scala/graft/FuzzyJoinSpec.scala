package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** The PassJoin segment scheme's zero-recall-loss claim (q124):
  * pair-for-pair parity with the quadratic whole-block spelling, on
  * real part names and on seeded random strings engineered to sit at
  * and around the distance threshold — plus the plan shape (segment
  * equi join, no per-block cartesian).
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("bucketed and segment joins == naive block join on real part " +
      "names") {
    val part = Tables.part(spark, sfSmall)
    val want = collectPairs(ops.FuzzyJoin.blockedPairsNaive(
      part, "p_partkey", "p_brand", "p_name", 2))
    assert(want.nonEmpty, "no fuzzy pairs in the corpus to compare")
    for (fn <- Seq(ops.FuzzyJoin.blockedPairs _,
        ops.FuzzyJoin.blockedPairsSegments _,
        ops.FuzzyJoin.blockedPairsBanded _)) {
      val got = collectPairs(fn(part, "p_partkey", "p_brand", "p_name", 2))
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("segment join == naive on seeded random edits (insert/delete/" +
      "substitute at every position band)") {
    val rnd = new scala.util.Random(23)
    val alpha = "abcdefgh"
    def randStr(n: Int) =
      (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    // base strings + systematic 0/1/2/3-edit variants: edits placed
    // at the start, middle, and end so every segment boundary and
    // position-window edge is exercised
    val bases = (0 until 25).map(i => (i, randStr(12 + rnd.nextInt(9))))
    val docs = bases.flatMap { case (i, s0) =>
      def mut(s: String, n: Int): String = (1 to n).foldLeft(s) {
        (acc, _) =>
          val p = rnd.nextInt(acc.length)
          rnd.nextInt(3) match {
            case 0 => acc.updated(p, alpha(rnd.nextInt(alpha.length)))
            case 1 => acc.substring(0, p) + acc.substring(p + 1)
            case _ => acc.substring(0, p) +
              alpha(rnd.nextInt(alpha.length)) + acc.substring(p)
          }
      }
      Seq((i * 10L, s0), (i * 10L + 1, mut(s0, 1)),
        (i * 10L + 2, mut(s0, 2)), (i * 10L + 3, mut(s0, 3)),
        (i * 10L + 4, s0.take(1) + s0), // head insert
        (i * 10L + 5, s0.dropRight(2))) // tail deletes
    }.map { case (id, str) => (id, "blk", str) }
    val df = docs.toDF("id", "block", "str")
    val want = collectPairs(
      ops.FuzzyJoin.blockedPairsNaive(df, "id", "block", "str", 2))
    assert(want.nonEmpty)
    for (fn <- Seq(ops.FuzzyJoin.blockedPairs _,
        ops.FuzzyJoin.blockedPairsSegments _,
        ops.FuzzyJoin.blockedPairsBanded _)) {
      val got = collectPairs(fn(df, "id", "block", "str", 2))
      assert(got == want,
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("plan: candidates come from an equi join, no cartesian") {
    val p = ops.FuzzyJoin.blockedPairs(Tables.part(spark, sfTiny),
      "p_partkey", "p_brand", "p_name", 2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
