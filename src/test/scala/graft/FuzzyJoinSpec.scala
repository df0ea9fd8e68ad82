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

  test("first-shared-variant dedup regime == distinct regime, " +
      "pair-for-pair (d=1 and d=2, real part names + seeded edits)") {
    // The scale regime replaces the candidate distinct() with the
    // min-shared-variant-hash filter (one surviving row per pair by
    // construction); parity here is the claim that the swap is
    // purely structural. Conf-forced both ways so the test is
    // independent of the auto cutover's volume estimate.
    val part = Tables.part(spark, sfSmall)
    try {
      for (d <- Seq(1, 2)) {
        spark.conf.set("spark.graft.fuzzy.firstVariantDedup", "never")
        val want = collectPairs(ops.FuzzyJoin.blockedPairsDeletions(
          part, "p_partkey", "p_brand", "p_name", d))
        assert(want.nonEmpty)
        spark.conf.set("spark.graft.fuzzy.firstVariantDedup", "always")
        val got = collectPairs(ops.FuzzyJoin.blockedPairsDeletions(
          part, "p_partkey", "p_brand", "p_name", d))
        assert(got == want,
          s"d=$d missing=${(want -- got).take(5)} " +
            s"extra=${(got -- want).take(5)}")
      }
      // repeated-character strings: two deletion positions collide
      // into the same variant (the per-side array_distinct case)
      val tricky = Seq((1L, "blk", "aabbcc"), (2L, "blk", "abbcc"),
        (3L, "blk", "aabbc"), (4L, "blk", "xaabbccx"),
        (5L, "blk", "aaaaaa"), (6L, "blk", "aaaa"))
        .toDF("id", "block", "str")
      spark.conf.set("spark.graft.fuzzy.firstVariantDedup", "never")
      val want2 = collectPairs(ops.FuzzyJoin.blockedPairsDeletions(
        tricky, "id", "block", "str", 2))
      spark.conf.set("spark.graft.fuzzy.firstVariantDedup", "always")
      val got2 = collectPairs(ops.FuzzyJoin.blockedPairsDeletions(
        tricky, "id", "block", "str", 2))
      assert(got2 == want2 && want2.nonEmpty,
        s"missing=${(want2 -- got2)} extra=${(got2 -- want2)}")
    } finally
      spark.conf.unset("spark.graft.fuzzy.firstVariantDedup")
  }

  test("plan: candidates come from an equi join, no cartesian") {
    val p = ops.FuzzyJoin.blockedPairs(Tables.part(spark, sfTiny),
      "p_partkey", "p_brand", "p_name", 2)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
