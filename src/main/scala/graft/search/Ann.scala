package graft.search

import graft.{QueryDef, Tables}
import graft.functions.HashFunctions.{first_equal_packed_band, hyperplane_sig}
import graft.functions.VectorFunctions.cosine_sim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table: exact brute-force
  * top-k as the correctness baseline, and a random-hyperplane-LSH
  * bucketed variant as the scale path (signature bands shuffle-join
  * instead of the all-pairs cross join).
  */
object Ann {

  val K = 5
  private val NumQueries = 10

  private def queryVecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  /** Exact brute-force cosine top-k per query vector. The query side
    * is tiny → broadcast; the corpus is scanned once; per-query top-k
    * comes from a rank-limited window (WindowGroupLimit keeps
    * per-partition heaps, so nothing materializes the full score
    * matrix). Oracle-checked against DuckDB list_cosine_similarity.
    */
  val bruteForce: QueryDef = QueryDef.sql(
    "q35_ann_bruteforce",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       | FROM embeddings WHERE vec_id < $NumQueries),
       | s AS (SELECT query_id, vec_id AS neighbor_id,
       |  list_cosine_similarity(CAST(qv AS DOUBLE[]),
       |  CAST(embedding AS DOUBLE[])) AS sim
       |  FROM q JOIN embeddings ON vec_id <> query_id),
       | r AS (SELECT query_id, neighbor_id, sim, row_number() OVER
       |  (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn FROM s)
       | SELECT query_id, neighbor_id, round(sim, 4) AS sim,
       |  CAST(rn AS INT) AS rank FROM r WHERE rn <= $K
       | ORDER BY query_id, rank""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val corpus = Tables.embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    broadcast(queryVecs(s, d))
      .join(corpus, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("qv"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate top-k: hyperplane signatures (codegen'd
    * [[graft.functions.HyperplaneSignature]]) split into bands; a
    * corpus vector is a candidate if it shares any band value with the
    * query. Only candidates get the exact cosine. At 100 TB the corpus
    * signature table is computed once (narrow), and the per-band join
    * is an equi shuffle — recall is tuned by nbits/bands (more,
    * narrower bands ⇒ higher recall, more candidates), never by
    * widening to all pairs.
    *
    * Band defaults are corpus-dependent: hyperplane collision prob is
    * 1 − θ/π, so how narrow a band can be depends on how far true
    * neighbors sit above the bulk. The synthetic test corpus is
    * near-random (5th-neighbor cosine ≈ 0.3), the hardest regime, and
    * needs 3-bit × 8 bands for recall@5 ≈ 0.88 (RecallSpec gates
    * ≥ 0.8). Clustered real-world embeddings (neighbors ≥ 0.8 cosine)
    * hold that recall at 6-bit × 4 bands with ~20× fewer candidates —
    * tune per corpus.
    */
  val LshBits = 24
  val LshBands = 8

  val lshTopK: QueryDef = QueryDef.rowsOnly("q36_ann_lsh") { (s, d) =>
    val bandBits = LshBits / LshBands
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, vecCol: String, idAs: String,
        sigAs: String) =
      df.select(col(idAs), col(vecCol),
          hyperplane_sig(col(vecCol), LshBits).as(sigAs))
        .select(col(idAs), col(vecCol), col(sigAs),
          posexplode(array((0 until LshBands).map(i =>
            shiftrightunsigned(col(sigAs), i * bandBits)
              .bitwiseAND(lit(mask))): _*))
            .as(Seq("band", "band_val")))
    val q = banded(
      Tables.embeddings(s, d).filter(col("vec_id") < NumQueries)
        .withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("embedding", "qv"), "qv", "query_id", "sig_q")
    val c = banded(
      Tables.embeddings(s, d)
        .withColumnRenamed("vec_id", "neighbor_id"), "embedding",
      "neighbor_id", "sig_c")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    broadcast(q).join(c, Seq("band", "band_val"))
      .filter(col("neighbor_id") =!= col("query_id"))
      // first-match-band dedup replaces the old `distinct()` that
      // carried BOTH vectors (qv + embedding) through a shuffle: a
      // (query, neighbor) pair colliding in m bands survives only in
      // its first shared band, so nothing after the broadcast join
      // shuffles payload arrays at all — the window below shuffles
      // only (query_id, neighbor_id, sim).
      .filter(first_equal_packed_band(col("sig_q"), col("sig_c"),
        LshBands, bandBits) === col("band"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("qv"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF-style ANN: a k-means coarse quantizer (trained once over the
    * corpus) assigns every vector to a centroid cell; each query
    * probes its `nprobe` nearest cells and scores only those
    * candidates. The classic inverted-file trade: index once
    * (k-means is itself distributed), then each query touches
    * ~nprobe/k of the corpus instead of all of it — the third point
    * on the exact → LSH → IVF recall/cost curve.
    */
  val ivfTopK: QueryDef = QueryDef.rowsOnly("q48_ann_ivf") { (s, d) =>
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val k = 16
    // nprobe is the same corpus-dependent dial as the LSH bands: the
    // near-random test corpus needs half the cells probed for
    // recall@5 ≥ 0.8 (RecallSpec); clustered corpora manage with 2-4.
    val nprobe = 8
    val emb = Tables.embeddings(s, d)
      .withColumn("fv", array_to_vector(col("embedding")))
    // Coarse-quantizer training: few Lloyd iterations (cell boundaries
    // only gate candidate routing, and nprobe/k oversampling absorbs
    // imperfect centroids; random init measurably cost 2pts of recall
    // on this corpus, so k-means|| init stays). At corpus scale
    // the fit also runs on a bounded SAMPLE — the standard IVF recipe:
    // centroids stabilize at O(100·k) training points, so training cost
    // stays flat while assignment remains a full single pass.
    val trainCap = 250 * k
    val n = emb.count()
    val train =
      if (n <= trainCap) emb
      else emb.sample(withReplacement = false, trainCap.toDouble / n, 42L)
    val km = new KMeans().setK(k).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell")
    val model = km.fit(train)
    val assigned = model.transform(emb)
      .select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("cell"))
    // nprobe nearest cells per query vector, via centroid cosine
    val centroids = s.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat)) }.toSeq)
      .toDF("cell", "centroid")
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(desc("centroid_sim"), asc("cell"))
    val probed = broadcast(queries).crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine_sim(col("qv"), col("centroid")).as("centroid_sim"))
      .withColumn("crn", row_number().over(probeW))
      .filter(col("crn") <= nprobe)
      .select("query_id", "qv", "cell")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    probed.join(assigned, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("qv"), col("embedding")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** q73 — SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"): cluster
    * the embedding space with a k-means coarse quantizer, then drop,
    * WITHIN each cluster, any vector whose cosine to an
    * already-kept lower-id vector reaches τ. Semantic near-dups (a
    * paraphrase, a re-encode) land in the same cell, so the O(n²)
    * comparison collapses to per-cluster work; pairs straddling a
    * cell boundary are the (small, paper-measured) recall loss.
    *
    * Scale shape: the paper's own recipe — k grows with n so the
    * EXPECTED CLUSTER SIZE stays constant (n/k ≈ 1000 here), the
    * quantizer trains on a bounded sample, and the greedy intra-
    * cluster scan runs as one `flatMapGroups` task per cluster:
    * memory per task is O(cluster·dim), constant by construction,
    * and clusters fan out across executors. No stage touches n².
    */
  val semDedup: QueryDef = QueryDef.rowsOnly("q73_semdedup") { (s, d) =>
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import s.implicits._
    val tau = s.conf.getOption("spark.graft.semdedup.tau")
      .map(_.toDouble).getOrElse(0.95)
    val emb = Tables.embeddings(s, d)
      .withColumn("fv", array_to_vector(col("embedding")))
    val n = emb.count()
    val k = math.max(4, (n / 1000L).toInt)
    val trainCap = 250 * k
    val train =
      if (n <= trainCap) emb
      else emb.sample(withReplacement = false, trainCap.toDouble / n, 42L)
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .as[(Long, Array[Float], Int)]
    assigned.groupByKey(_._3)
      .flatMapGroups { (cell, it) =>
        val members = it.toArray.sortBy(_._1)
        val kept = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
        members.iterator.map { case (id, v, _) =>
          var dupOf = -1L
          val i = kept.iterator
          while (dupOf < 0 && i.hasNext) {
            val (kid, kv) = i.next()
            if (cosineArr(v, kv) >= tau) dupOf = kid
          }
          if (dupOf < 0) kept += ((id, v))
          (id, cell, dupOf < 0, if (dupOf < 0) id else dupOf)
        }
      }
      .toDF("vec_id", "cell", "is_kept", "dup_of")
      .orderBy("vec_id")
  }

  /** Plain-Scala cosine used inside per-cluster greedy scans (the
    * columnar codegen'd twin is [[graft.functions.CosineSimilarity]]).
    */
  private[search] def cosineArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** q119 — embedding-dimension ablation: exact top-5 recall when
    * similarity uses only the first `dim` components (8/16/32/64) vs
    * the full 64-d vectors — the measurement behind "can we store
    * truncated embeddings?" (matryoshka-style tiering: a 4× dim cut
    * is a 4× cut in index bytes AND ADC arithmetic; this curve says
    * what recall it buys at each step). Each rung is the q35 scan
    * shape (broadcast queries, one corpus pass, WindowGroupLimit
    * top-k) over `slice`d vectors; only #dims scalars reach the
    * driver. Rows-only (recall of engine-ranked lists); the gate pins
    * recall == 1 at full dimension and all rungs within [0, 1].
    */
  val dimRecall: QueryDef = QueryDef.rowsOnly("q119_dim_recall") { (s, d) =>
    import s.implicits._
    val full = bruteForce.fn(s, d).select("query_id", "neighbor_id").cache()
    val nFull = full.count()
    val corpus = Tables.embeddings(s, d)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    val rungs = Seq(8, 16, 32, 64).map { dim =>
      val top = broadcast(queryVecs(s, d))
        .join(corpus, col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine_sim(slice(col("qv"), 1, dim),
            slice(col("embedding"), 1, dim)).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select("query_id", "neighbor_id")
      val hit = full.join(top, Seq("query_id", "neighbor_id"), "left_semi")
        .count()
      (dim, hit.toDouble / nFull)
    }
    full.unpersist()
    rungs.toDF("dim", "recall_at_5").orderBy("dim")
  }

  /** q76 — per-vector scalar quantization to int8 codes, the storage
    * tier every embedding index at 100 TB sits on (a 768-dim float32
    * vector is 3 KB; its uint8 codes + two floats are ~770 B — a 4×
    * cut before any ANN structure is built). Codes are
    * `floor((x−mn)/(mx−mn)·255)` per vector; reconstruction error is
    * bounded by one step, gated in VectorFunctionsSpec. Every
    * operation is an exact IEEE double op on float-exact inputs, so
    * the codes — emitted stringified, like q46's recs — hash-match
    * the DuckDB oracle bit-for-bit. Narrow, shuffle-free, pipelined
    * with the scan.
    */
  val quantize: QueryDef = QueryDef.sql(
    "q76_embedding_quantize",
    """WITH q AS (SELECT vec_id,
      |  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
      |  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
      |  embedding FROM embeddings)
      | SELECT vec_id, mn, mx, array_to_string(
      |  [CAST(CASE WHEN mx = mn THEN 0 ELSE
      |     floor((CAST(x AS DOUBLE) - mn) / (mx - mn) * 255)
      |   END AS INT) for x in embedding], ',') AS codes
      | FROM q ORDER BY vec_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val mn = array_min(col("embedding")).cast("double")
    val mx = array_max(col("embedding")).cast("double")
    Tables.embeddings(s, d)
      .select(col("vec_id"), mn.as("mn"), mx.as("mx"),
        concat_ws(",", transform(col("embedding"), x =>
          when(mx === mn, lit(0)).otherwise(
            floor((x.cast("double") - mn) / (mx - mn) * 255))
            .cast("int").cast("string"))).as("codes"))
      .orderBy("vec_id")
  }

  /** Dequantized reconstruction of [[quantize]]'s codes — the read
    * path (`x̂ = mn + code/255·(mx−mn)`), for VectorFunctionsSpec's
    * error gate and any consumer scoring against quantized storage.
    */
  def dequantize(codes: Column, mn: Column, mx: Column): Column =
    transform(codes, c =>
      (mn + c.cast("double") / 255.0 * (mx - mn)).cast("float"))

  /** Full-table kNN JOIN: every vector's top-k cosine neighbors
    * within the same table — the all-to-all version of q48's
    * fixed-query IVF (what embedding-dedup, recommendation seeding,
    * and kNN-graph construction actually run). The naive join is
    * n²·dim; the IVF discipline makes it linear-ish: cluster count
    * grows with n so the EXPECTED CELL SIZE stays constant
    * (SemDeDup's sizing, `n/cells ≈ targetCell`), every vector
    * probes its `nprobe` nearest cells, and candidate work is
    * n · nprobe · targetCell — linear in n at fixed dials. The
    * centroid table stays broadcast-size (cells ≈ n/1000), the
    * probe-routing is a broadcast nested-loop over it, and the
    * candidate join shuffles on the cell id. Recall@k vs the exact
    * scan is gate-measured on a query sample (boundary-straddling
    * pairs are the loss, same as q48/q73).
    */
  def knnJoin(emb: DataFrame, k: Int = 5, nprobe: Int = 8,
      targetCell: Int = 1000): DataFrame =
    knnJoinAgainst(emb, emb, k, nprobe, targetCell)

  /** kNN of `queries` against an IVF-indexed `corpus` — the
    * incremental-ingest path: the quantizer trains on (a sample of)
    * the CORPUS only, so a new-batch lookup is O(Δ · nprobe ·
    * cellsize) — assign, probe, re-rank — never a corpus re-index.
    * The vector companion of [[graft.dedup.Dedup]]'s incremental
    * near-dup (q75). [[knnJoin]] is the self-join special case.
    */
  def knnJoinAgainst(corpus: DataFrame, queries: DataFrame,
      k: Int = 5, nprobe: Int = 8, targetCell: Int = 1000)
      : DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val s = corpus.sparkSession
    val n = corpus.count()
    val cells = math.max(16, (n / targetCell).toInt)
    val withFv = corpus.withColumn("fv",
      array_to_vector(col("embedding")))
    val trainCap = 250 * cells
    val train =
      if (n <= trainCap) withFv
      else withFv.sample(withReplacement = false,
        trainCap.toDouble / n, 42L)
    val model = new KMeans().setK(cells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
    val assigned = model.transform(withFv)
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv"), col("cell"))
      .localCheckpoint()
    val centroids = s.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        (i, c.toArray.map(_.toFloat)) }.toSeq)
      .toDF("cell", "centroid")
    val probeW = Window.partitionBy("query_id")
      .orderBy(desc("centroid_sim"), asc("cell"))
    val probed = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine_sim(col("qv"), col("centroid")).as("centroid_sim"))
      .withColumn("crn", row_number().over(probeW))
      .filter(col("crn") <= nprobe)
      .select("query_id", "qv", "cell")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    probed.join(assigned, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("qv"), col("nv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** q127 — the kNN self-join over the embeddings table (top-5 per
    * vector). No oracle (recall-gated approximate path); the gate
    * measures recall@5 against the exact scan on a query sample.
    */
  val knnJoinQ: QueryDef = QueryDef.rowsOnly("q127_knn_join") { (s, d) =>
    knnJoin(Tables.embeddings(s, d)).orderBy("query_id", "rank")
  }

  /** q134 — incremental kNN lookup: the 1-in-10 vec_id slice plays
    * the newly-ingested batch, searched against the remaining 9/10
    * corpus through the corpus-trained IVF index. Rows-only; the
    * gate measures recall@5 against the exact delta-vs-corpus scan.
    */
  val knnIncrementalQ: QueryDef =
    QueryDef.rowsOnly("q134_knn_incremental") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      knnJoinAgainst(emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0))
        .orderBy("query_id", "rank")
    }

  /** Exact top-k for a bounded query-id sample — the gate's
    * baseline. Brute force over queries × corpus, fine for ≤100
    * query ids at verify scale.
    */
  def exactTopK(emb: DataFrame, queryIds: Long, k: Int = 5)
      : DataFrame =
    exactTopKAgainst(emb, emb.filter(col("vec_id") < queryIds), k)

  /** Exact top-k of `queries` against a separate `corpus` — the
    * delta-lookup gate baseline.
    */
  def exactTopKAgainst(corpus: DataFrame, queries: DataFrame,
      k: Int = 5): DataFrame = {
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    broadcast(q).crossJoin(
        corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("nv")))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("qv"), col("nv")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id")
  }

  val defs: Seq[QueryDef] =
    Seq(bruteForce, lshTopK, ivfTopK, semDedup, quantize, dimRecall,
      knnJoinQ, knnIncrementalQ)
}
