package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

/** Stage invariants for the curation pipeline — q62's oracle gates the
  * composed VALUES; these pin the algebraic properties each stage must
  * keep regardless of corpus.
  */
class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfSmall)

  test("exactDedup is idempotent and keeps one doc per distinct text") {
    val once = Curation.exactDedup(docs)
    val twice = Curation.exactDedup(once)
    assert(once.count() == twice.count())
    assert(once.count() == docs.select("text").distinct().count())
    // keeper set == the min doc_id of every text group
    val keepers = once.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs.groupBy("text").agg(min("doc_id").as("mn"))
      .select("mn").collect().map(_.getLong(0)).toSet
    assert(keepers == expected)
  }

  test("stratify keeps at most K per stratum and is deterministic") {
    val s1 = Curation.stratify(docs, k = 7)
    val over = s1.groupBy("lang", "source").count().filter(col("count") > 7)
    assert(over.isEmpty)
    val s2 = Curation.stratify(docs, k = 7)
    assert(s1.select("doc_id").exceptAll(s2.select("doc_id")).isEmpty)
  }

  test("decontaminate drops exactly the benchmark and overlapping docs") {
    val clean = Curation.decontaminate(docs, docs)
    // no benchmark doc survives
    assert(clean.filter(col("doc_id") % Curation.BenchMod === 0).isEmpty)
    // no survivor shares a trigram with the benchmark set
    val hits = graft.dedup.Dedup.benchShingleHits(docs, Curation.BenchMod)
    assert(clean.join(hits, Seq("doc_id"), "left_semi").isEmpty)
    // and everything else survives
    val expected = docs.filter(col("doc_id") % Curation.BenchMod =!= 0)
      .join(hits, Seq("doc_id"), "left_anti").count()
    assert(clean.count() == expected)
  }

  test("quality filter boundary: exactly >= MinWords words survive") {
    val kept = Curation.qualityFilter(docs, minWords = 40)
    val n = docs.filter(size(split(col("text"), " ")) >= 40).count()
    assert(kept.count() == n)
    assert(kept.filter(size(split(col("text"), " ")) < 40).isEmpty)
  }

  test("q120 audit reconciles exactly with q62's mix table") {
    val audit = Curation.audit.fn(spark, sfSmall).cache()
    // statuses partition the corpus: one row per doc, no other values
    assert(audit.count() == docs.count())
    val allowed = Set("kept", "dropped_quality", "dropped_duplicate",
      "dropped_benchmark", "dropped_contaminated", "dropped_sample")
    val byStatus = audit.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet.subsetOf(allowed), byStatus.toString)
    // the audit's kept population IS q62's sampled corpus
    val mixDocs = Curation.pipeline.fn(spark, sfSmall)
      .agg(sum("n_docs")).head().getLong(0)
    assert(byStatus("kept") == mixDocs,
      s"audit kept ${byStatus("kept")} vs q62 $mixDocs")
    // precedence: every quality-fail doc reports quality, nothing else
    val qf = docs
      .filter(size(split(col("text"), " ")) < Curation.MinWords)
      .select("doc_id")
    assert(audit.join(qf, "doc_id")
      .filter(col("status") =!= "dropped_quality").isEmpty)
  }

  test("q153 fan-out: decision gates on narrow AND large, output " +
      "identical when forced") {
    val d = Tables.documents(spark, sfSmall)
    // sf0.01's documents table is a single small file: narrow, but
    // far below the size gate — default decision must be None (the
    // r19 measurement: fan-out at bench scale costs, not pays)
    assert(Scale.fanOutTarget(d).isEmpty)
    // size gate forced down: the same narrow scan now qualifies and
    // the target is the cluster parallelism (scale-adaptive, not a
    // constant)
    spark.conf.set("spark.graft.fanout.minBytesPerSlot", "1")
    try {
      assert(Scale.fanOutTarget(Tables.documents(spark, sfSmall))
        .contains(spark.sparkContext.defaultParallelism))
      // and the fanned q153 spine produces the byte-identical result
      val fanned = Curation.pipelineV3.fn(spark, sfSmall).collect()
      spark.conf.unset("spark.graft.fanout.minBytesPerSlot")
      val plain = Curation.pipelineV3.fn(spark, sfSmall).collect()
      assert(fanned.toSeq == plain.toSeq)
    } finally spark.conf.unset("spark.graft.fanout.minBytesPerSlot")
  }

  test("repeatedNgramStats flags exactly the cross-doc template spans") {
    import spark.implicits._
    // three template instances sharing one 5-token span, one unique
    // doc, one doc too short to hold any 5-gram
    val fx = Seq(
      (1L, "breaking news today the market closed higher again"),
      (2L, "breaking news today the market opened lower yesterday"),
      (3L, "oh breaking news today the market"),
      (4L, "completely unrelated prose with no shared template at all"),
      (5L, "too short here")
    ).toDF("doc_id", "text")
    val out = text.TextAnalysis.repeatedNgramStats(fx, n = 5, minDocs = 3)
      .orderBy("doc_id").collect()
    // the short doc is absent; others have len-4 positions
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // only "breaking news today the market" recurs in >= 3 docs:
    // exactly one flagged position in each template instance
    assert(byId(1L) == ((4L, 1L, 0.25)))
    assert(byId(2L) == ((4L, 1L, 0.25)))
    assert(byId(3L) == ((2L, 1L, 0.5)))
    assert(byId(4L) == ((5L, 0L, 0.0)))
  }

  test("intraDocRepetitionStats: both Gopher rules fire on the right docs") {
    import spark.implicits._
    val fx = Seq(
      // top-2-gram AND dup-5-gram both saturate: "a b" claims every
      // token, and both distinct 5-grams repeat
      (1L, "a b a b a b a b a b"),
      // all tokens unique: nothing fires
      (2L, "one two three four five six seven eight nine ten"),
      // dup-5-gram ONLY: "c1..c5" repeats (10 of 20 positions) but
      // the top 2-gram ("c1 c2", twice) is exactly 4/20 = 0.2, not
      // above the threshold
      (3L, "c1 c2 c3 c4 c5 f1 f2 f3 f4 f5 c1 c2 c3 c4 c5 f6 f7 f8 f9 f10"),
      // short doc: top-2-gram rule fires trivially (1.0) — faithful
      // to Gopher, which composes AFTER a min-length rule
      (4L, "hi there")
    ).toDF("doc_id", "text")
    val out = text.TextAnalysis.intraDocRepetitionStats(fx)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6))).toMap
    assert(out(1L) == ((10L, 5L, 10L, 1.0, 1.0, 1)))
    assert(out(2L) == ((10L, 1L, 0L, 0.2, 0.0, 0)))
    assert(out(3L) == ((20L, 2L, 10L, 0.2, 0.5, 1)))
    assert(out(4L) == ((2L, 1L, 0L, 1.0, 0.0, 1)))
  }

  test("maskRepeatedNgramSpans drops exactly the covered tokens, keeps order") {
    import spark.implicits._
    val fx = Seq(
      (1L, "breaking news today the market closed higher again"),
      (2L, "breaking news today the market opened lower yesterday"),
      (3L, "oh breaking news today the market"),
      (4L, "completely unrelated prose with no shared template at all"),
      (5L, "too short here")
    ).toDF("doc_id", "text")
    val out = text.TextAnalysis.maskRepeatedNgramSpans(fx, n = 5, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // the shared span "breaking news today the market" vanishes; the
    // surrounding tokens survive in original order
    assert(out(1L) == (("closed higher again", 3L, 8L)))
    assert(out(2L) == (("opened lower yesterday", 3L, 8L)))
    assert(out(3L) == (("oh", 1L, 6L)))
    assert(out(4L)._1.startsWith("completely unrelated"))
    assert(out(4L)._2 == 9L && out(4L)._3 == 9L)
    // too-short doc passes through untouched
    assert(out(5L) == (("too short here", 3L, 3L)))
  }

  test("q143: value-decomposed per-language rank reproduces ntile(3) " +
      "exactly, and buckets are balanced and ordered") {
    import org.apache.spark.sql.expressions.Window
    val out = text.TextAnalysis.perplexityBuckets.fn(spark, sfSmall)
      .cache()
    // differential: recompute buckets from the output's own scores
    // with a plain window ntile — the spelling the operator avoids at
    // scale (it puts a whole language in one task) but whose
    // semantics it must match row-for-row
    val w = Window.partitionBy("lang").orderBy("ppl", "doc_id")
    val direct = out.withColumn("nt", ntile(3).over(w))
      .select(col("doc_id"),
        when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
          .otherwise("tail").as("bucket"))
    val mismatches = out.select("doc_id", "bucket")
      .join(direct.withColumnRenamed("bucket", "direct"), "doc_id")
      .filter(col("bucket") =!= col("direct"))
    assert(mismatches.isEmpty,
      mismatches.collect().take(5).mkString("; "))
    // per-language thirds differ by at most one doc
    val sizes = out.groupBy("lang", "bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("d"))
    assert(sizes.filter(col("d") > 1).isEmpty)
    // bucket score ranges are ordered: every head ppl <= every tail
    val ranges = out.groupBy("lang").agg(
      max(when(col("bucket") === "head", col("ppl"))).as("maxHead"),
      min(when(col("bucket") === "tail", col("ppl"))).as("minTail"))
    assert(ranges.filter(col("maxHead") > col("minTail")).isEmpty)
    out.unpersist()
    ()
  }
}
