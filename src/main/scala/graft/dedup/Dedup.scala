package graft.dedup

import graft.{QueryDef, Tables}
import graft.functions.HashFunctions._
import graft.functions.VectorFunctions.cosine_sim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * None exist in the reference (its closest analogue is rating
  * `distinct`, `OfflineRecommender.scala:60-61`); these are the
  * engine's first-class extensions over the `documents` /
  * `embeddings` tables.
  *
  * Scale design: every variant is blocking-based — signatures are
  * computed per-row (one narrow pass), candidate pairs come from a
  * shuffle on (band, signature) keys, and only candidates are
  * verified. Nothing here is O(n²) except the explicitly-bounded
  * exact paths.
  */
object Dedup {

  private def tokens(c: Column): Column = array_distinct(split(c, " "))

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * One hash-aggregate shuffle; at 100 TB this is the cheapest
    * possible full-corpus dedup (md5 computed scan-side, partial agg
    * map-side).
    */
  val exact: QueryDef = QueryDef.sql(
    "q30_dedup_exact",
    """SELECT md5(text) AS fingerprint, min(doc_id) AS keep_doc_id,
      | count(*) AS dup_cnt FROM documents GROUP BY fingerprint
      | ORDER BY keep_doc_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("fingerprint"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("dup_cnt"))
      .orderBy("keep_doc_id")
  }

  /** MinHash + LSH near-dup pairs (Broder 1997 resemblance sketch):
    * K=32 minhashes over the distinct-token set, banded 8×4; docs
    * sharing any band bucket become candidates; candidates are
    * verified with exact Jaccard ≥ 0.9. The only shuffles are the
    * band-bucket groupings — never an all-pairs join.
    */
  val minhashLsh: QueryDef = QueryDef.rowsOnly("q31_dedup_minhash_lsh") {
    (s, d) => minhashPairs(Tables.documents(s, d), numHashes = 32,
      bands = 8, threshold = 0.9)
      .orderBy("doc_a", "doc_b")
  }

  def minhashPairs(docs: DataFrame, numHashes: Int, bands: Int,
      threshold: Double): DataFrame = {
    val rows = numHashes / bands
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    // K minhash values; band b hashes its `rows` consecutive minhashes
    val sig = toks.select(col("doc_id"),
      array((0 until numHashes).map(h =>
        array_min(transform(col("toks"), t => xxhash64(lit(h), t)))): _*)
        .as("mh"))
    val banded = sig.select(col("doc_id"),
      posexplode(array((0 until bands).map(b =>
        xxhash64((0 until rows).map(r => col("mh")(b * rows + r)): _*)): _*))
        .as(Seq("band", "band_hash")))
    // Candidate pairs carry ONLY ids through the bucket self-join and
    // the distinct — dup cliques make buckets big, and dragging the
    // token arrays through that shuffle (then distinct-ing over them)
    // is what turns this quadratic. Token sets re-attach afterwards by
    // key, once per verified candidate side.
    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    candidates
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a")),
        "doc_a")
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b")),
        "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
          size(array_union(col("toks_a"), col("toks_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit signature (codegen'd
    * [[graft.functions.SimHash64]]), blocked on 4×16-bit bands,
    * verified by Hamming distance ≤ 8. Identical token sets hash to
    * identical signatures regardless of order/multiplicity.
    */
  val simhash: QueryDef = QueryDef.rowsOnly("q32_dedup_simhash") { (s, d) =>
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), simhash64(tokens(col("text"))).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "band_val")))
    val a = banded.select(col("band"), col("band_val"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_val"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= 8)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** N-gram (word trigram) Jaccard similarity — the exact quadratic
    * path, deliberately bounded to a 1-in-10 document sample; the
    * LSH variants above are the full-corpus plan. Emits the top-50
    * most-similar pairs.
    */
  val ngramJaccard: QueryDef = QueryDef.rowsOnly("q33_ngram_jaccard") {
    (s, d) =>
      val docs = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
      val sh = docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
        .limit(50)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Word n-gram shingle set of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Embedding near-dup: top-50 highest-cosine embedding pairs via
    * the codegen'd cosine expression. Exact all-pairs is intentional
    * here (bounded corpus); the banded-LSH scale path is
    * `graft.search.Ann.lshTopK`.
    */
  val embeddingCosine: QueryDef = QueryDef.rowsOnly("q34_embedding_neardup") {
    (s, d) =>
      val e = Tables.embeddings(s, d)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          cosine_sim(col("emb_a"), col("emb_b")).as("sim"))
        .orderBy(desc("sim"), asc("vec_a"), asc("vec_b"))
        .limit(50)
        .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation: each node repeatedly adopts the smallest
    * label in its neighborhood. Converges in O(diameter) rounds —
    * near-dup graphs are clique-heavy (diameter ~1-2), so a small
    * iteration cap suffices; for adversarial long-chain graphs the
    * large-star/small-star variant (Kiveris et al. 2014) would
    * replace this loop. Each round is one shuffle on the edge key.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 6): DataFrame = {
    val e = edges.toDF("src", "dst")
    val sym = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nbr_label"))
      val updated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .cache()
      changed = updated.filter(col("label") =!= col("old_label")).count()
      labels = updated.select("id", "label")
      i += 1
    }
    labels
  }

  /** Keeper-set dedup: near-dup pairs → connected components → one
    * keeper (min doc_id) per cluster; singleton docs keep themselves.
    * This is the operator a curation pipeline actually applies: filter
    * `is_keeper` and the corpus is deduplicated.
    */
  val clusters: QueryDef = QueryDef.rowsOnly("q49_dedup_clusters") { (s, d) =>
    val docs = Tables.documents(s, d)
    val pairs = minhashPairs(docs, numHashes = 32, bands = 8,
      threshold = 0.9).select("doc_a", "doc_b")
    val comp = connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(comp.select(col("id").as("doc_id"),
        col("label").as("cluster_id")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] =
    Seq(exact, minhashLsh, simhash, ngramJaccard, embeddingCosine, clusters)
}
