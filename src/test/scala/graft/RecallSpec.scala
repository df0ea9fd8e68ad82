package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured quality bounds for the approximate operators: every LSH /
  * IVF path carries a recall gate against its exact counterpart, so
  * "approximate" means a number, not vibes.
  */
class RecallSpec extends SparkSpec {

  private lazy val exactAnn =
    search.Ann.bruteForce.fn(spark, sfSmall).cache()

  /** recall@K = |approx ∩ exact| / |exact| over (query_id, neighbor_id). */
  private def recallVsExact(approx: DataFrame): Double = {
    val e = exactAnn.select("query_id", "neighbor_id")
    val a = approx.select("query_id", "neighbor_id")
    val hit = e.join(a, Seq("query_id", "neighbor_id"), "left_semi").count()
    hit.toDouble / e.count()
  }

  test("q36 hyperplane-LSH ANN: recall@5 >= 0.8 vs exact top-k") {
    val r = recallVsExact(search.Ann.lshTopK.fn(spark, sfSmall))
    assert(r >= 0.8, s"LSH recall@5 = $r")
  }

  test("q48 IVF ANN: recall@5 >= 0.8 vs exact top-k") {
    val r = recallVsExact(search.Ann.ivfTopK.fn(spark, sfSmall))
    assert(r >= 0.8, s"IVF recall@5 = $r")
  }

  test("q127 kNN join: recall@5 >= 0.8 vs exact on a query sample") {
    // the RAW IVF tier — the registered query serves the exact
    // regime below the pair bound at test scale (r12 graduation)
    val emb = Tables.embeddings(spark, sfSmall)
    val exact = search.Ann.exactTopK(emb, queryIds = 50).cache()
    val approx = search.Ann.knnJoinIvf(spark, sfSmall)
      .filter(col("query_id") < 50).select("query_id", "neighbor_id")
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    val r = hit.toDouble / exact.count()
    assert(r >= 0.8, s"kNN-join recall@5 = $r")
  }

  test("q127 regime routing: exact below the pair bound (matches the " +
      "brute-force kernel), IVF above it with the oracle withheld") {
    val s = spark
    // default bound: test-scale embeddings are inside the exact
    // regime — the registered result must equal the exact kernel's
    val emb = Tables.embeddings(s, sfSmall)
    assert(!search.Ann.knnJoinQ.isApproximateFor(s, sfSmall))
    val exact = search.Ann.exactTopK(emb, queryIds = 50)
      .withColumnRenamed("neighbor_id", "nb")
    val got = search.Ann.knnJoinQ.fn(s, sfSmall)
      .filter(col("query_id") < 50).select("query_id", "neighbor_id")
    // set EQUALITY, both directions — a subset check alone would
    // pass on a routed result that dropped rows or whole queries
    assert(got.join(exact, col("neighbor_id") === col("nb") &&
        exact("query_id") === got("query_id"), "left_anti").count() == 0L,
      "exact regime returned a pair outside the brute-force kernel")
    assert(exact.join(got, got("neighbor_id") === exact("nb") &&
        exact("query_id") === got("query_id"), "left_anti").count() == 0L,
      "exact regime dropped pairs the brute-force kernel returns")
    assert(got.count() == exact.count())
    // q134, same template: exact regime must equal the exact
    // delta-vs-corpus kernel
    assert(!search.Ann.knnIncrementalQ.isApproximateFor(s, sfSmall))
    val exact134 = search.Ann.exactTopKAgainst(
        emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0))
      .withColumnRenamed("neighbor_id", "nb")
    val got134 = search.Ann.knnIncrementalQ.fn(s, sfSmall)
      .select("query_id", "neighbor_id")
    assert(got134.join(exact134,
        got134("neighbor_id") === exact134("nb") &&
        exact134("query_id") === got134("query_id"), "left_anti")
      .count() == 0L, "q134 exact regime returned an out-of-kernel pair")
    assert(exact134.join(got134,
        got134("neighbor_id") === exact134("nb") &&
        exact134("query_id") === got134("query_id"), "left_anti")
      .count() == 0L, "q134 exact regime dropped kernel pairs")
    assert(got134.count() == exact134.count())
    try {
      s.conf.set("spark.graft.exactKnnPairLimit", "1")
      assert(search.Ann.knnJoinQ.isApproximateFor(s, sfSmall))
      assert(search.Ann.knnIncrementalQ.isApproximateFor(s, sfSmall))
      val ivf = search.Ann.knnJoinQ.fn(s, sfSmall)
      assert(ivf.columns.toSeq ==
        Seq("query_id", "neighbor_id", "sim", "rank"))
      assert(ivf.limit(1).count() == 1L)
      val ivf134 = search.Ann.knnIncrementalQ.fn(s, sfSmall)
      assert(ivf134.columns.toSeq ==
        Seq("query_id", "neighbor_id", "sim", "rank"))
      assert(ivf134.limit(1).count() == 1L)
    } finally s.conf.unset("spark.graft.exactKnnPairLimit")
    // back at the default the exact regime serves again (memo keys
    // include the limit, so no stale decision)
    assert(!search.Ann.knnJoinQ.isApproximateFor(s, sfSmall))
    assert(!search.Ann.knnIncrementalQ.isApproximateFor(s, sfSmall))
  }

  test("q134 incremental kNN: recall@5 >= 0.8 vs exact delta lookup") {
    // the RAW IVF tier — the registered query serves the exact
    // regime below the pair bound at test scale (r12 graduation)
    val emb = Tables.embeddings(spark, sfSmall)
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val exact = search.Ann.exactTopKAgainst(corpus, delta).cache()
    val approx = search.Ann.knnIncrementalIvf(spark, sfSmall)
      .select("query_id", "neighbor_id")
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    val r = hit.toDouble / exact.count()
    assert(r >= 0.8, s"incremental kNN recall@5 = $r")
  }

  test("IVF index save/load round-trip serves identical results") {
    val emb = Tables.embeddings(spark, sfSmall)
    val queries = emb.filter(col("vec_id") < 10)
    val built = search.Ann.buildIvfIndex(emb)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toString + "/idx"
    search.Ann.saveIvfIndex(built, dir)
    val loaded = search.Ann.loadIvfIndex(spark, dir)
    assert(loaded.kc == built.kc)
    val a = search.Ann.knnQuery(built, queries).orderBy("query_id", "rank")
    val b = search.Ann.knnQuery(loaded, queries).orderBy("query_id", "rank")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q82 sign projection: unbiased cosine estimates within JL error") {
    // (1/k)·<Px,Py> is an unbiased estimator of <x,y> for ±1 sign
    // matrices (Achlioptas 2003); with k=16 the per-pair noise is
    // O(1/√16). Gate both the bias (must be ~0) and the RMSE.
    val emb = Tables.embeddings(spark, sfTiny).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val proj = search.Projection.randomProjection.fn(spark, sfTiny)
      .collect().map(r =>
        (1 to search.Projection.DimOut).map(r.getDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val errs = for (i <- 0 until 60; j <- i + 1 until 60)
      yield cos(proj(i), proj(j)) - cos(emb(i), emb(j))
    val bias = errs.sum / errs.size
    val rmse = math.sqrt(errs.map(e => e * e).sum / errs.size)
    assert(math.abs(bias) < 0.05, s"projection bias $bias")
    assert(rmse < 0.35, s"projection rmse $rmse")
  }

  test("q84 PQ ANN: recall@5 >= 0.8 vs exact top-k") {
    val r = recallVsExact(search.Pq.pqTopK.fn(spark, sfSmall))
    assert(r >= 0.8, s"PQ recall@5 = $r")
  }

  test("q136 IVF-PQ ANN: recall@5 >= 0.8 vs exact top-k") {
    val r = recallVsExact(search.Pq.ivfPqTopK.fn(spark, sfSmall))
    assert(r >= 0.8, s"IVF-PQ recall@5 = $r")
  }

  test("q141 filtered IVF ANN: recall@5 >= 0.8 vs exact filtered scan") {
    val exact = search.Ann.filteredTopK.fn(spark, sfSmall)
      .select("query_id", "neighbor_id").cache()
    val approx = search.Ann.filteredIvfQ.fn(spark, sfSmall)
      .select("query_id", "neighbor_id")
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    val r = hit.toDouble / exact.count()
    assert(r >= 0.8, s"filtered IVF recall@5 = $r")
  }

  test("q139 incremental IVF-PQ: append parity is exact and delta " +
      "recall@5 >= 0.8") {
    // parity: the appended persisted delta rows equal a batch replay
    // through the same frozen index + codebooks (q75's incremental ==
    // full discipline, applied to the composed index's ingest path)
    assert(search.Pq.incrementalParityViolations(spark, sfSmall) == 0)
    val emb = Tables.embeddings(spark, sfSmall)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val exact = search.Ann.exactTopKAgainst(emb, delta).cache()
    val approx = search.Pq.ivfPqIncremental.fn(spark, sfSmall)
      .select("query_id", "neighbor_id")
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    val r = hit.toDouble / exact.count()
    assert(r >= 0.8, s"incremental IVF-PQ recall@5 = $r")
  }

  test("frozen-codebook encode matches the trained encoder's codes") {
    // encodeAgainst re-implements KMeansModel.predict (euclidean
    // argmin, lowest index on ties) as a codegen'd expression; on the
    // corpus the model was trained on, the two must agree code-for-code
    val emb = Tables.embeddings(spark, sfTiny)
    val (codes, books) = search.Pq.encode(emb)
    val against = search.Pq.encodeAgainst(emb, books)
    assert(codes.exceptAll(against).isEmpty &&
      against.exceptAll(codes).isEmpty)
  }

  test("q119 dim ablation: full-dim recall is exactly 1, truncation " +
      "degrades gracefully") {
    val rows = search.Ann.dimRecall.fn(spark, sfSmall).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set(8, 16, 32, 64))
    assert(rows(64) == 1.0, s"full-dim recall ${rows(64)}")
    assert(rows.values.forall(r => r >= 0.0 && r <= 1.0))
    assert(rows(8) > 0.0, "even 8-d truncation finds some neighbors")
    info(s"recall@5 by dim: ${rows.toSeq.sortBy(_._1)}")
  }

  test("q31 minhash-LSH: finds >= 95% of exact high-Jaccard pairs") {
    // Exact word-token Jaccard over the full sf0.01 corpus (500 docs —
    // all-pairs is affordable in a test), thresholded at q31's 0.9.
    import graft.functions.HashFunctions.sorted_intersect_size
    val toks = Tables.documents(spark, sfSmall).select(col("doc_id"),
      array_sort(array_distinct(transform(
        array_distinct(split(col("text"), " ")), t => xxhash64(t))))
        .as("toks"))
    val a = toks.select(col("doc_id").as("doc_a"), col("toks").as("ta"))
    val b = toks.select(col("doc_id").as("doc_b"), col("toks").as("tb"))
    val exact = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter",
        sorted_intersect_size(col("ta"), col("tb")).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("ta")) + size(col("tb")) - col("inter")))
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b")
      .cache()
    val nExact = exact.count()
    assert(nExact > 0, "test corpus has no high-Jaccard pairs to measure")
    val lsh = dedup.Dedup.verifiedPairs(spark, sfSmall)
      .select("doc_a", "doc_b")
    val found = exact.join(lsh, Seq("doc_a", "doc_b"), "left_semi").count()
    val recall = found.toDouble / nExact
    assert(recall >= 0.95, s"minhash-LSH recall = $recall ($found/$nExact)")
  }
}
