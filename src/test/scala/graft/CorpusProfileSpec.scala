package graft

import org.apache.spark.sql.functions._

/** Semantics of the corpus-level planning operators — q147's
  * water-filling token-budget allocation and q149's per-source Zipf
  * profile — on hand-built corpora where the closed forms are
  * checkable by hand. Engine parity with DuckDB is the oracle's job;
  * here we pin the math.
  */
class CorpusProfileSpec extends SparkSpec {
  import spark.implicits._

  /** Write a documents.parquet with given (source, lang, text) rows
    * into a fresh temp dir and return the dir.
    */
  private def corpus(rows: Seq[(String, String, String)]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corpus_spec").toString
    rows.zipWithIndex
      .map { case ((src, lang, text), i) =>
        (i.toLong, text, lang, src, text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(tok: String, n: Int): String =
    Seq.fill(n)(tok).mkString(" ")

  test("token budget: interior solution splits B in proportion to " +
      "sqrt-weights and lands within floor error of B") {
    // groups (A: 100 tokens, B: 400 tokens), budget = 2*500 = 1000,
    // caps 400/1600. w = 10/20; boundary k=0 is valid
    // (lambda = 1000/30 = 33.3 < r_A = 40): a_A = floor(333.3) = 333,
    // a_B = floor(666.6) = 666.
    val d = corpus(Seq(("A", "en", words("a", 100)),
      ("B", "en", words("b", 400))))
    val r = ml.Sampling.tokenBudget.fn(spark, d)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5))))
      .toMap
    val (availA, capA, allocA, epochsA) = r("A")
    val (availB, capB, allocB, epochsB) = r("B")
    assert((availA, capA) == ((100L, 400L)) &&
      (availB, capB) == ((400L, 1600L)), r.toString)
    assert(allocA == 333L && allocB == 666L, r.toString)
    // budget met up to one floor per group
    assert(allocA + allocB > 1000L - 2 && allocA + allocB <= 1000L)
    assert(math.abs(epochsA - 3.33) < 0.01 &&
      math.abs(epochsB - 1.665) < 0.01, r.toString)
  }

  test("token budget: a small group saturates at its cap and the " +
      "surplus water flows to the unsaturated group") {
    // A: 10 tokens (cap 40), B: 1000 tokens (cap 4000), B = 2020.
    // k=0 is invalid (lambda = 58.1 > r_A = 12.65); k=1 gives
    // lambda = (2020-40)/sqrt(1000) = 62.6: A pinned at cap 40
    // (epochs exactly 4), B = floor(62.6*31.62) = 1980.
    val d = corpus(Seq(("A", "en", words("a", 10)),
      ("B", "en", words("b", 1000))))
    val r = ml.Sampling.tokenBudget.fn(spark, d)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(4), x.getDouble(5)))).toMap
    assert(r("A") == ((40L, 4.0d)), r.toString)
    val (allocB, epochsB) = r("B")
    assert(allocB >= 1978L && allocB <= 1980L, r.toString)
    assert(epochsB < 4.0, r.toString)
    // total within floor error of B = 2020
    assert(40L + allocB > 2020L - 2 && 40L + allocB <= 2020L)
  }

  test("zipf profile: an exact power-law corpus fits slope -1 and " +
      "counts types/hapax/top-share correctly") {
    // frequencies 120/rank for ranks 1..4: ln f = ln 120 - ln rank,
    // a perfect slope -1 line. One singleton type ("z") is hapax but
    // sits outside... no: it IS rank 5 in the top-K fit, freq 1;
    // keep the fit exact by NOT adding it to this source.
    val zipf = (1 to 4).map(i => words(s"t$i", 120 / i)).mkString(" ")
    val d = corpus(Seq(("A", "en", zipf),
      ("B", "en", "x x x y")))
    val out = text.Vocab.zipfProfile.fn(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val (n, d4, hapax, topShare, slope) = out("A")
    assert(n == 120L + 60 + 40 + 30 && d4 == 4L && hapax == 0L)
    assert(math.abs(topShare - 120.0 / 250.0) < 1e-12)
    assert(slope == -1.0d, out.toString)
    // source B: 4 tokens, 2 types, one hapax, top share 3/4
    val (nB, dB, hapaxB, topB, _) = out("B")
    assert(nB == 4L && dB == 2L && hapaxB == 1L && topB == 0.75d)
  }
}
