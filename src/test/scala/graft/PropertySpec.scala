package graft

import graft.functions.HashFunctions._
import graft.functions.VectorFunctions.cosine_sim
import graft.ops.TopK.{KeyedScored, Scored, TopKAggregator}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property tests (SURVEY §5.3). Aggregator laws run at
  * the data level (no Spark job per sample); expression properties
  * batch all generated samples into one DataFrame so a property is
  * one job, not hundreds.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val scoredGen: Gen[KeyedScored] = for {
    key <- Gen.choose(0L, 5L)
    id <- Gen.choose(0L, 1000L)
    score <- Gen.choose(-1e6, 1e6).map(s => math.rint(s * 100) / 100)
  } yield KeyedScored(key, id, score)

  test("property: top-k aggregator == sort.take(k) for any input split") {
    val agg = new TopKAggregator(5)
    def expected(xs: Seq[KeyedScored]): Seq[Scored] =
      xs.map(x => Scored(x.id, x.score))
        .sortWith((a, b) =>
          a.score > b.score || (a.score == b.score && a.id < b.id))
        .take(5)
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.choose(0, 100)) {
      (xs, splitAt) =>
        // fold through reduce in two arbitrary halves, then merge —
        // exercises the partial-aggregation path (map-side combine)
        val (l, r) = xs.splitAt(math.min(splitAt, xs.size))
        val bufL = l.foldLeft(agg.zero)(agg.reduce)
        val bufR = r.foldLeft(agg.zero)(agg.reduce)
        agg.finish(agg.merge(bufL, bufR)) == expected(xs)
    })
  }

  test("property: merge is commutative and bounded by k") {
    val agg = new TopKAggregator(3)
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.listOf(scoredGen)) {
      (as, bs) =>
        val bufA = as.foldLeft(agg.zero)(agg.reduce)
        val bufB = bs.foldLeft(agg.zero)(agg.reduce)
        agg.merge(bufA, bufB) == agg.merge(bufB, bufA) &&
          agg.merge(bufA, bufB).size <= 3
    })
  }

  test("property: imperative top-k buffer == sort.take(k) across splits") {
    import graft.functions.TopKAgg
    def expected(xs: Seq[KeyedScored], k: Int): Seq[(Long, Double)] =
      xs.map(x => (x.id, x.score))
        .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
        .take(k)
    check(Prop.forAll(Gen.listOf(scoredGen), Gen.choose(0, 100),
      Gen.choose(1, 7)) { (xs, splitAt, k) =>
      // fill two buffers from arbitrary halves, merge via the
      // serialize/deserialize round-trip the shuffle actually takes
      import org.apache.spark.sql.graft.ColumnBridge
      val agg = TopKAgg(ColumnBridge.expression(lit(0L)),
        ColumnBridge.expression(lit(0.0)), k)
      val (l, r) = xs.splitAt(math.min(splitAt, xs.size))
      val bufL = new TopKAgg.Buf(k); l.foreach(x => bufL.insert(x.id, x.score))
      val bufR = new TopKAgg.Buf(k); r.foreach(x => bufR.insert(x.id, x.score))
      val merged = agg.merge(bufL, agg.deserialize(agg.serialize(bufR)))
      (0 until merged.n).map(i => (merged.ids(i), merged.scores(i))) ==
        expected(xs, k)
    })
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(8, Gen.choose(-10.0f, 10.0f)).map(_.toArray)
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("property: cosine_sim in [-1,1], self-sim == 1, symmetric") {
    val pairs = Gen.listOfN(300, Gen.zip(vecGen, vecGen)).sample.get
    val df = pairs.toDF("a", "b").select(
      cosine_sim(col("a"), col("b")).as("ab"),
      cosine_sim(col("b"), col("a")).as("ba"),
      cosine_sim(col("a"), col("a")).as("aa"))
    val bad = df.filter(
      col("ab") < -1.0000001 || col("ab") > 1.0000001 ||
        abs(col("ab") - col("ba")) > 1e-6 ||
        abs(col("aa") - 1.0) > 1e-5)
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("property: sorted_intersect_size == array_intersect over random sets") {
    val setGen = Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct.sorted)
    val pairs = Gen.listOfN(300, Gen.zip(setGen, setGen)).sample.get
    val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }
      .toDF("x", "y")
      .select(sorted_intersect_size(col("x"), col("y")).as("m"),
        size(array_intersect(col("x"), col("y"))).as("ref"))
    val bad = df.filter(col("m") =!= col("ref"))
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("property: epoch->yyyymm conversion matches Java time for any epoch") {
    // F1 changeDate (StatisticsRecommender.scala:73-76) as built-ins,
    // vs an independent java.time computation, over arbitrary epochs
    val epochs = Gen.listOfN(300, Gen.choose(0L, 4102444800L)).sample.get
    val df = epochs.toDF("epoch").select(col("epoch"),
      date_format(to_utc_timestamp(timestamp_seconds(col("epoch")), "UTC"),
        "yyyyMM").cast("int").as("yyyymm"))
    val got = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    epochs.foreach { e =>
      val d = java.time.Instant.ofEpochSecond(e)
        .atZone(java.time.ZoneOffset.UTC)
      assert(got(e) == d.getYear * 100 + d.getMonthValue,
        s"epoch $e -> ${got(e)}")
    }
  }

  test("property: shingle_hashes == xxhash64 over the declarative " +
      "shingle spelling for any text") {
    // the fused expression must agree hash-for-hash with the
    // transform(shingles(...), xxhash64) tree it replaces (as a SET —
    // the declarative side runs array_distinct on the strings, the
    // fused side keeps duplicates, which bloom build/probe ignore);
    // includes empty strings, repeated/leading/trailing spaces, and
    // docs shorter than the shingle width
    val textGen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "", "d e"))
    } yield toks.mkString(" ")
    val texts = (Gen.listOfN(300, textGen).sample.get :+ "" :+ " " :+
      "one two").toDF("text")
    val got = texts.select(
      array_sort(array_distinct(shingle_hashes(col("text"), 3))).as("fused"),
      array_sort(transform(
        graft.dedup.Dedup.declarativeShingles(col("text"), 3),
        x => xxhash64(x))).as("declarative")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1).distinct.sorted,
        s"mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
  }

  test("property: word_shingles == the declarative shingle spelling " +
      "element-for-element for any text") {
    // the codegen'd string-shingle kernel must match the
    // array_distinct(transform(sequence…)) tree it replaces EXACTLY —
    // same elements, same first-occurrence order — so swapping it
    // into q33/q42/q60's exact tiers cannot move a hash-gated result
    val textGen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "", "d e"))
    } yield toks.mkString(" ")
    for (width <- Seq(1, 2, 3, 5)) {
      val texts = (Gen.listOfN(200, textGen).sample.get :+ "" :+ " " :+
        "one two").toDF("text")
      val got = texts.select(
        graft.dedup.Dedup.shingles(col("text"), width).as("fused"),
        graft.dedup.Dedup.declarativeShingles(col("text"), width)
          .as("declarative")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"width=$width: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
      }
    }
  }

  test("property: minhash signature agreement tracks jaccard within 4 sigma") {
    // build pairs with known overlap; est = matches/K must stay within
    // 4·sqrt(J(1-J)/K) of true J (binomial concentration)
    val k = 64
    val gen = for {
      common <- Gen.choose(20, 80)
      extraA <- Gen.choose(0, 30)
      extraB <- Gen.choose(0, 30)
    } yield (common, extraA, extraB)
    val cases = Gen.listOfN(60, gen).sample.get.zipWithIndex.map {
      case ((c, ea, eb), i) =>
        val base = 100000L * i
        val common = (0 until c).map(j => base + j)
        val a = (common ++ (0 until ea).map(j => base + 1000 + j)).toArray
        val b = (common ++ (0 until eb).map(j => base + 2000 + j)).toArray
        val j = c.toDouble / (c + ea + eb)
        (a, b, j)
    }
    val df = cases.toDF("a", "b", "j").select(col("j"),
      (sig_matches(minhash_sig(col("a"), k), minhash_sig(col("b"), k))
        .cast("double") / k).as("est"))
    val bad = df.filter(
      abs(col("est") - col("j")) >
        lit(4.0) * sqrt(col("j") * (lit(1.0) - col("j")) / k) + lit(1e-9))
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("property: driver union-find labels == brute-force reachability min") {
    // pure-local property (no Spark job): for arbitrary small graphs,
    // every node's union-find label equals the minimum id reachable
    // from it, the same invariant the distributed CC loop guarantees
    val edgeGen = for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L) if a != b
    } yield (a, b)
    val graphGen = Gen.listOfN(25, edgeGen).map(_.toArray)
    check(Prop.forAll(graphGen) { edges =>
      val labels = dedup.Dedup.unionFind(edges)
      // brute-force: transitive closure by fixpoint over adjacency
      val adj = edges.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      def reachMin(start: Long): Long = {
        var seen = Set(start)
        var frontier = Set(start)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(n =>
            adj.getOrElse(n, Set.empty)) -- seen
          seen ++= next; frontier = next
        }
        seen.min
      }
      labels.forall { case (node, label) => label == reachMin(node) }
    }, n = 60)
  }

  test("property: chain graphs far longer than maxIter converge to one " +
      "component through the distributed solve") {
    // Adversarial diameter: a path graph of length ≫ maxIter(=20). The
    // per-round pointer jump composes the label map with itself, so
    // label reach grows exponentially (~2^rounds), not linearly —
    // this property is the measured guarantee that long chains don't
    // need a large-star/small-star rewrite at these iteration caps.
    // localSolveLimit=0 forces the distributed loop (the driver
    // union-find would otherwise absorb any contracted chain).
    val old = spark.conf.getOption("spark.graft.cc.localSolveLimit")
    spark.conf.set("spark.graft.cc.localSolveLimit", "0")
    try {
      check(Prop.forAll(Gen.choose(500, 2500)) { n =>
        val edges = spark.range(n - 1)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
        val labels = dedup.Dedup.connectedComponents(edges)
        labels.count() == n &&
          labels.filter(col("label") =!= 0L).isEmpty
      }, n = 3)
    } finally old match {
      case Some(v) => spark.conf.set("spark.graft.cc.localSolveLimit", v)
      case None => spark.conf.unset("spark.graft.cc.localSolveLimit")
    }
  }

  test("property: bottom-k sample buffer == sort.take(k) for any split") {
    import graft.functions.BottomKAgg
    import org.apache.spark.unsafe.types.UTF8String
    val entryGen = for {
      key <- Gen.listOfN(4, Gen.oneOf('0', '1', 'a', 'b')).map(_.mkString)
      id <- Gen.choose(0L, 50L)
    } yield (key, id)
    check(Prop.forAll(Gen.listOf(entryGen), Gen.choose(0, 100)) {
      (xs, splitAt) =>
        val (l, r) = xs.splitAt(math.min(splitAt, xs.size))
        val a = new BottomKAgg.Buf(5)
        l.foreach { case (k0, id) => a.insert(UTF8String.fromString(k0), id) }
        val b = new BottomKAgg.Buf(5)
        r.foreach { case (k0, id) => b.insert(UTF8String.fromString(k0), id) }
        var i = 0
        while (i < b.n) { a.insert(b.keys(i), b.ids(i)); i += 1 }
        val got = (0 until a.n).map(j => (a.keys(j).toString, a.ids(j)))
        got == xs.sorted.take(5)
    })
  }

  test("property: chains beyond the iteration cap converge through the " +
      "star fallback") {
    // maxIter=1 starves the propagation loop so the cap is hit with
    // work remaining — the Kiveris et al. star alternation must then
    // finish the component regardless of diameter.
    // localSolveLimit=0 keeps the driver union-find out of the way.
    val old = spark.conf.getOption("spark.graft.cc.localSolveLimit")
    spark.conf.set("spark.graft.cc.localSolveLimit", "0")
    try {
      check(Prop.forAll(Gen.choose(1000, 4000)) { n =>
        val edges = spark.range(n - 1)
          .select(col("id").as("src"), (col("id") + 1).as("dst"))
        val labels = dedup.Dedup.connectedComponents(edges, maxIter = 1)
        labels.count() == n &&
          labels.filter(col("label") =!= 0L).isEmpty
      }, n = 2)
    } finally old match {
      case Some(v) => spark.conf.set("spark.graft.cc.localSolveLimit", v)
      case None => spark.conf.unset("spark.graft.cc.localSolveLimit")
    }
  }

  test("property: kll conserves weight; median rank holds for any split") {
    import graft.functions.KllBuffer
    check(Prop.forAll(
      Gen.listOf(Gen.choose(-1e9, 1e9)), Gen.choose(0, 500)) {
      (xs, splitAt) =>
        val (l, r) = xs.splitAt(math.min(splitAt, xs.size))
        val a = new KllBuffer(64); l.foreach(a.insert)
        val b = new KllBuffer(64); r.foreach(b.insert)
        a.mergeWith(b)
        a.n == xs.size && (xs.isEmpty || {
          // two-sided rank bracket — point-rank distance breaks on
          // discrete mass (n=1: the only value has rank 1.0). k=64 at
          // ScalaCheck sizes is far inside this bound; the tight
          // empirical gate lives in QuantileSpec
          val est = a.quantile(0.5)
          val below = xs.count(_ < est).toDouble / xs.size
          val atOrBelow = xs.count(_ <= est).toDouble / xs.size
          below <= 0.7 && atOrBelow >= 0.3
        })
    })
  }

  test("property: kll serialize/deserialize preserves every estimate") {
    import graft.functions.{KllBuffer, KllQuantiles}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val kq = KllQuantiles(Literal(0.0d), 64, Seq(0.1, 0.5, 0.9))
    check(Prop.forAll(Gen.listOf(Gen.choose(-1e6, 1e6))) { xs =>
      val buf = new KllBuffer(64); xs.foreach(buf.insert)
      val rt = kq.deserialize(kq.serialize(buf))
      rt.n == buf.n &&
        (buf.isEmpty || Seq(0.1, 0.5, 0.9).forall(p =>
          rt.quantile(p) == buf.quantile(p)))
    })
  }

  test("property: bloom has no false negatives for any keys and split") {
    import graft.functions.{BloomBuild, BloomMath}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val bb = BloomBuild(
      Literal.create(null, ArrayType(LongType)), 4096, 7)
    check(Prop.forAll(
      Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)),
      Gen.choose(0, 500)) { (ks, splitAt) =>
      val (l, r) = ks.splitAt(math.min(splitAt, ks.size))
      val w1 = bb.createAggregationBuffer()
      l.foreach(BloomMath.set(w1, _, 7))
      val w2 = bb.createAggregationBuffer()
      r.foreach(BloomMath.set(w2, _, 7))
      val bytes = bb.serialize(bb.merge(w1, w2))
      ks.forall(BloomMath.mightContain(bytes, _, 7))
    })
  }
}
