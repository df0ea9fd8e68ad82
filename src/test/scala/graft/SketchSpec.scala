package graft

import graft.functions.HashFunctions.{minhash_sig, sig_matches}
import graft.functions.SketchAggregates.minhash_union
import org.apache.spark.sql.functions._

/** The MinHashUnion sketch aggregate: union semantics, merge
  * associativity under repartitioning, and estimate quality against
  * the exact corpus-level Jaccard.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64

  test("union sketch equals the sketch of the concatenated set") {
    // sketch(A) merged with sketch(B) == sketch(A ++ B), per slot
    val rows = Seq(
      (1, Seq("a", "b", "c")), (1, Seq("c", "d")),
      (1, Seq("e"))).toDF("g", "toks")
    val sig = minhash_sig(transform(col("toks"), t => xxhash64(t)), k)
    val merged = rows.select(col("g"), sig.as("s"))
      .groupBy("g").agg(minhash_union(col("s"), k).as("sk"))
      .select(col("sk")).head.getSeq[Long](0)
    val direct = Seq((1, Seq("a", "b", "c", "c", "d", "e")))
      .toDF("g", "toks")
      .select(minhash_sig(transform(col("toks"), t => xxhash64(t)), k)
        .as("sk"))
      .head.getSeq[Long](0)
    assert(merged == direct)
  }

  test("sketch is invariant to partitioning (merge associativity)") {
    val docs = Tables.documents(spark, sfSmall)
    def sketch(parts: Int) = docs.repartition(parts)
      .select(col("lang"),
        minhash_sig(transform(split(col("text"), " "), t => xxhash64(t)), k)
          .as("s"))
      .groupBy("lang").agg(minhash_union(col("s"), k).as("sk"))
      .orderBy("lang").collect().map(r => r.getSeq[Long](1)).toSeq
    assert(sketch(1) == sketch(13))
  }

  test("q63 estimated vocab jaccard tracks the exact value within 4 sigma") {
    // the raw sketch tier (the registered q63 serves the exact
    // regime at this scale)
    val est = text.TextAnalysis.minhashVocabJaccard(spark, sfSmall)
    val toks = Tables.documents(spark, sfSmall)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .distinct()
    val sizes = toks.groupBy("lang").agg(count(lit(1)).as("n"))
    val inter = toks.select(col("lang").as("lang_a"), col("t"))
      .join(toks.select(col("lang").as("lang_b"), col("t")), "t")
      .filter(col("lang_a") < col("lang_b"))
      .groupBy("lang_a", "lang_b").agg(count(lit(1)).as("ni"))
      .join(sizes.select(col("lang").as("lang_a"), col("n").as("na")),
        "lang_a")
      .join(sizes.select(col("lang").as("lang_b"), col("n").as("nb")),
        "lang_b")
      .select(col("lang_a"), col("lang_b"),
        (col("ni").cast("double") /
          (col("na") + col("nb") - col("ni"))).as("exact"))
    val joined = est.join(inter, Seq("lang_a", "lang_b")).collect()
    assert(joined.length == 10) // 5 langs -> 10 pairs
    joined.foreach { r =>
      val e = r.getAs[Double]("est_vocab_jaccard")
      val x = r.getAs[Double]("exact")
      val bound = 4.0 * math.sqrt(x * (1 - x) / k) + 1e-9
      assert(math.abs(e - x) <= bound,
        s"${r.getAs[String]("lang_a")}/${r.getAs[String]("lang_b")}: " +
          s"est=$e exact=$x bound=$bound")
    }
  }

  test("q105's minhash scale tier tracks the exact source jaccard within 4 sigma") {
    val docs = Tables.documents(spark, sfSmall)
    val t = split(col("text"), " ")
    val shingles = transform(
      sequence(lit(1), size(t) - lit(4)),
      i => concat_ws(" ", slice(t, i, lit(5))))
    val sk = docs.filter(size(t) >= 5)
      .select(col("source"),
        minhash_sig(transform(shingles, s => xxhash64(s)), k).as("s"))
      .groupBy("source").agg(minhash_union(col("s"), k).as("sk"))
    val a = sk.select(col("source").as("src_a"), col("sk").as("ska"))
    val b = sk.select(col("source").as("src_b"), col("sk").as("skb"))
    val est = a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        (sig_matches(col("ska"), col("skb")).cast("double") / k).as("est"))
    val exact = text.TextAnalysis.sourceShingleOverlap(docs, 5)
      .select(col("src_a"), col("src_b"), col("jaccard"))
    val joined = est.join(exact, Seq("src_a", "src_b")).collect()
    assert(joined.length == 190) // 20 sources -> 190 pairs
    joined.foreach { r =>
      val e = r.getAs[Double]("est")
      val x = r.getAs[Double]("jaccard")
      // 4 sigma of the k-slot binomial, plus one slot of granularity
      val bound = 4.0 * math.sqrt(x * (1 - x) / k) + 1.0 / k
      assert(math.abs(e - x) <= bound,
        s"${r.getAs[String]("src_a")}/${r.getAs[String]("src_b")}: " +
          s"est=$e exact=$x bound=$bound")
    }
  }

  test("q112 count-min: never underestimates, overestimate within eps*N") {
    import org.apache.spark.util.sketch.CountMinSketch
    val tok = Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val eps = 0.0001
    val bytes = tok
      .agg(count_min_sketch(col("w"), lit(eps), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val exact = tok.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val n = exact.map(_._2).sum
    // the CMS one-sided guarantee, checked for EVERY distinct word
    exact.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"underestimate for '$w': $est < $c")
    }
    // w.h.p. bound: overestimate <= eps * N for the vast majority
    val over = exact.count { case (w, c) => cms.estimateCount(w) - c > eps * n }
    assert(over <= math.max(1, exact.length / 100),
      s"$over of ${exact.length} words exceed the eps*N overestimate bound")
  }

  test("q114 hll rollup: merged-sketch estimate equals the direct sketch") {
    val docs = Tables.documents(spark, sfSmall)
    // sketch algebra: union of per-source sketches must estimate
    // EXACTLY what one direct per-lang sketch estimates — mergeability
    // is lossless, only the estimate itself is approximate
    val merged = docs.groupBy("lang", "source")
      .agg(hll_sketch_agg(col("doc_id")).as("sk"))
      .groupBy("lang")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("m"))
    val direct = docs.groupBy("lang")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"))).as("dct"))
    val both = merged.join(direct, "lang").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"${r.getString(0)}: merged=${r.getLong(1)} direct=${r.getLong(2)}")
    }
    // estimates track exact distincts
    // the raw merged-sketch tier (the registered q114 serves the
    // exact regime at this scale)
    val out = ops.Analytics.hllRollupErr(spark, sfSmall)
    assert(out.filter(col("rel_err") > 0.05).isEmpty)
  }

  test("minhash_union rejects signature-width mismatches loudly") {
    val rows = Seq((1, Seq("a", "b"))).toDF("g", "toks")
    val e = intercept[Exception] {
      rows.select(col("g"),
          minhash_sig(transform(col("toks"), t => xxhash64(t)), 32).as("s"))
        .groupBy("g").agg(minhash_union(col("s"), k).as("sk"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("minhash_union")), e.toString)
  }

  test("q45/q63/q66 regime routing: lowered limits flip groups to " +
      "the sketch tier and withhold the oracle") {
    val s = spark
    try {
      // q45: bound below the largest group -> mixed per-group regime
      val counts = Tables.lineitem(s, sfTiny).groupBy("l_returnflag")
        .count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val bar = counts.values.max - 1
      s.conf.set("spark.graft.exactDistinctLimit", bar.toString)
      s.conf.set("spark.graft.exactQuantileLimit", bar.toString)
      s.conf.set("spark.graft.exactVocabLimit", "1")
      assert(ops.Analytics.approxDistinct.isApproximateFor(s, sfTiny))
      assert(ops.Statistics.quantileSketch.isApproximateFor(s, sfTiny))
      assert(text.TextAnalysis.corpusSketch.isApproximateFor(s, sfTiny))
      val exactDistinct = Tables.lineitem(s, sfTiny)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("x")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val out45 = ops.Analytics.approxDistinct.fn(s, sfTiny).collect()
      assert(out45.map(_.getString(0)).toSet == counts.keySet)
      out45.foreach { r =>
        val g = r.getString(0)
        val expected = if (counts(g) <= bar) "exact" else "approx"
        assert(r.getString(2) == expected,
          s"$g: regime ${r.getString(2)}, expected $expected")
        if (expected == "exact")
          assert(r.getLong(1) == exactDistinct(g), s"$g exact tier wrong")
        else
          assert(math.abs(r.getLong(1) - exactDistinct(g)).toDouble /
            exactDistinct(g) <= 0.1, s"$g sketch tier off >10%")
      }
      // q66: same routing signal; sketch groups keep the 2.5% rank
      // error bound (QuantileSpec measures it exhaustively)
      val out66 = ops.Statistics.quantileSketch.fn(s, sfTiny).collect()
      assert(out66.map(_.getString(0)).toSet == counts.keySet)
      out66.foreach { r =>
        val expected = if (counts(r.getString(0)) <= bar) "exact"
          else "approx"
        assert(r.getString(5) == expected)
        assert(r.getDouble(1) <= r.getDouble(2) &&
          r.getDouble(2) <= r.getDouble(3) &&
          r.getDouble(3) <= r.getDouble(4),
          s"${r.getString(0)}: quantiles not monotone: $r")
      }
      // q112: whole-query flip; schema parity and the CMS one-sided
      // guarantee (est >= exact) on every MG-picked probe word
      s.conf.set("spark.graft.exactFreqLimit", "1")
      assert(ops.Analytics.countMin.isApproximateFor(s, sfTiny))
      val out112 = ops.Analytics.countMin.fn(s, sfTiny)
      assert(out112.columns.toSeq == Seq("word", "freq", "regime"))
      val rows112 = out112.collect()
      assert(rows112.nonEmpty && rows112.length <= 20)
      assert(rows112.forall(_.getString(2) == "approx"))
      val exact112 = Tables.documents(s, sfTiny)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      rows112.foreach { r =>
        assert(r.getLong(1) >= exact112(r.getString(0)),
          s"CMS underestimated '${r.getString(0)}'")
      }
      // q63: whole-query flip; schema parity with the exact regime
      // and estimates on the ppm grid
      val out63 = text.TextAnalysis.corpusSketch.fn(s, sfTiny)
      assert(out63.columns.toSeq ==
        Seq("lang_a", "lang_b", "jaccard_q6", "regime"))
      val rows63 = out63.collect()
      val nLangs = Tables.documents(s, sfTiny).select("lang")
        .distinct().count()
      assert(rows63.length == nLangs * (nLangs - 1) / 2)
      rows63.foreach { r =>
        assert(r.getString(3) == "approx")
        assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
      }
    } finally {
      s.conf.unset("spark.graft.exactDistinctLimit")
      s.conf.unset("spark.graft.exactQuantileLimit")
      s.conf.unset("spark.graft.exactVocabLimit")
      s.conf.unset("spark.graft.exactFreqLimit")
    }
    // back at the defaults the exact regime serves and the oracle
    // applies (memo keys include the limit, so no stale decision)
    assert(!ops.Analytics.approxDistinct.isApproximateFor(spark, sfTiny))
    assert(ops.Analytics.approxDistinct.fn(spark, sfTiny).collect()
      .forall(_.getString(2) == "exact"))
  }

  test("minhash_union is SQL-registered") {
    graft.functions.Registry.register(spark)
    Tables.documents(spark, sfTiny).createOrReplaceTempView("docs_sk")
    val n = spark.sql(
      s"""SELECT lang, minhash_union(
         |  minhash_sig(transform(split(text, ' '), t -> xxhash64(t)), $k),
         |  $k) AS sk
         |FROM docs_sk GROUP BY lang""".stripMargin)
      .collect()
    assert(n.nonEmpty && n.forall(_.getSeq[Long](1).length == k))
  }
}
