package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE learning/encoding against an independent single-threaded
  * reference implementation, plus the lossless round-trip and
  * determinism contracts q109's gate rests on.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE learner: plain Scala, no Spark — recomputes pair
    * counts from scratch each round, argmax by (count DESC, pair ASC).
    */
  private def refLearn(wordFreq: Map[String, Long],
      numMerges: Int): Seq[(String, String)] = {
    var vocab = wordFreq.map { case (w, f) =>
      (w.map(_.toString): Seq[String]) -> f
    }.toSeq
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1))
          counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((l, rr), n) => (-n, l, rr) }._1
        merges += best
        vocab = vocab.map { case (syms, f) =>
          Bpe.mergePair(syms, best._1, best._2) -> f
        }
        r += 1
      }
    }
    merges.toSeq
  }

  test("learned merges match the single-threaded reference exactly") {
    val corpus = Seq("low", "low", "low", "low", "low",
      "lower", "lower", "newest", "newest", "newest", "newest",
      "newest", "newest", "widest", "widest", "widest")
    val docs = Seq(corpus.mkString(" ")).toDF("text")
      .withColumn("doc_id", lit(1L))
    val wf = corpus.groupBy(identity).map { case (w, ws) =>
      w -> ws.size.toLong
    }
    val want = refLearn(wf, 8)
    val got = Bpe.learnMerges(Bpe.wordFreq(docs), 8)
      .map(m => (m.left, m.right))
    assert(got == want, s"got $got want $want")
    // classic Sennrich example: 'es' and 'est' form early from newest/widest
    assert(got.contains(("e", "s")) || got.contains(("es", "t")) ||
      got.exists(m => (m._1 + m._2).contains("es")), got.toString)
  }

  test("encoding round-trips every word and is deterministic") {
    val docs = Tables.documents(spark, sfTiny)
    val merges = Bpe.learnMerges(Bpe.wordFreq(docs), 16)
    assert(merges.size == 16)
    val enc = Bpe.encodeWords(Bpe.wordFreq(docs).select("word"), merges)
      .cache()
    assert(enc.filter(concat_ws("", col("tokens")) =!= col("word")).isEmpty)
    // merges compress: fewer tokens than characters overall
    val t = enc.agg(sum(size(col("tokens"))).cast("long"),
      sum(length(col("word"))).cast("long")).head()
    assert(t.getLong(0) < t.getLong(1), s"no compression: $t")
    // relearning yields the identical merge list (deterministic ties)
    val again = Bpe.learnMerges(Bpe.wordFreq(docs), 16)
    assert(again == merges)
  }

  test("encodeWord applies merges in rank order greedily") {
    val ranks = Map(("a", "b") -> 0, ("ab", "c") -> 1, ("c", "d") -> 2)
    assert(Bpe.encodeWord("abcd", ranks) == Seq("abc", "d"))
    assert(Bpe.encodeWord("cdab", ranks) == Seq("cd", "ab"))
    assert(Bpe.encodeWord("xyz", Map.empty) == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("", Map.empty).isEmpty)
  }

  test("q109 emits one row per doc with sane count relations") {
    val out = text.Bpe.bpeTokens.fn(spark, sfTiny).cache()
    val docs = Tables.documents(spark, sfTiny)
    assert(out.count() == docs.count())
    // chars >= bpe tokens >= words for every doc
    assert(out.filter(col("n_bpe_tokens") > col("n_chars") ||
      col("n_words") > col("n_bpe_tokens")).isEmpty)
    assert(out.filter(col("chars_per_token") < 1.0).isEmpty)
  }
}
