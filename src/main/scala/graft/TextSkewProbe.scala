package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-adversarial probe for the exact set-similarity tier — the
  * graph probe's text sibling: a stop-token appearing in 90% of
  * documents hits the df-ordered prefix filter
  * ([[graft.dedup.SetSimJoin]]) exactly where a naive token-bucket
  * join dies (one bucket holding 0.9·n docs ⇒ ~0.4·n² candidate
  * pairs). The prefix filter's defense is the rarity order: a
  * df=0.9n token sorts LAST, so it enters a document's prefix (the
  * rarest ~40% of its tokens) only when every rarer token is
  * exhausted — for real mixed-vocabulary documents, never.
  *
  * The probe replicates the sfDir documents `SPARK_GRAFT_REPLICATE`×
  * with doc-unique salts (ScaleSweep's semantics: true pairs grow
  * ~k×, not k²×), injects `HOTTOKENS` stop-tokens into 90% of
  * documents, and measures, at 1× and k×, on the q121 1-in-4 sample:
  *
  *   - candidate-pair count ([[graft.dedup.SetSimJoin
  *     .prefixCandidates]]) vs true-pair count — candidate/true
  *     inflation is the filter's quality metric;
  *   - end-to-end [[graft.dedup.SetSimJoin.allPairs]] wall seconds.
  *
  * No blowup = candidates grow ~k× (tracking true pairs), not k²×.
  * Emits one PROBE_JSON row per scale.
  */
object TextSkewProbe {

  val HotTokens = 3

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-text-skew-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 90% of docs get the same HotTokens stop-tokens appended — the
    // adversarial df spike. The salt construction keeps cross-replica
    // Jaccard below threshold (ScaleSweep's argument), and the hot
    // tokens are shared by 0.9 of ALL docs, so they move Jaccard by
    // at most HotTokens/|union| ≈ 5% — the true pair structure stays
    // that of the base corpus.
    def hotify(docs: DataFrame): DataFrame =
      docs.withColumn("text",
        when(pmod(col("doc_id"), lit(10)) < 9,
          concat_ws(" ", col("text"),
            lit((1 to HotTokens).map(i => s"stophot$i").mkString(" "))))
          .otherwise(col("text")))

    val base = spark.read.parquet(s"$src/documents.parquet")
    def replicated(k: Int): DataFrame =
      if (k == 1) base
      else base
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .withColumn("doc_id", col("doc_id") * k + col("rep"))
        .withColumn("text", concat_ws(" ", col("text"),
          array_join(transform(
            sequence(lit(1),
              ceil(size(split(col("text"), " ")) * 0.3).cast("int")),
            i => concat(lit("r"), col("rep"), lit("d"), col("doc_id"),
              lit("t"), i)), " ")))
        .drop("rep")

    // The controlled comparison: at each scale, candidates WITH the
    // stop-tokens vs WITHOUT them on the identical corpus — the
    // inflation ratio isolates what the df spike costs the filter
    // (≈1.0 = the rarity order neutralized it). Wall and true pairs
    // are recorded for the hot variant (the adversarial case).
    for (scale <- Seq(1, k)) {
      val plain = replicated(scale).filter(col("doc_id") % 4 === 0)
        .select("doc_id", "text").cache()
      val hot = hotify(plain).cache()
      val n = plain.count()
      val candsPlain = graft.dedup.SetSimJoin
        .prefixCandidates(plain, "doc_id", "text").count()
      val candsHot = graft.dedup.SetSimJoin
        .prefixCandidates(hot, "doc_id", "text").count()
      val t0 = System.nanoTime()
      val truePairs = graft.dedup.SetSimJoin
        .allPairs(hot, "doc_id", "text").count()
      val wall = (System.nanoTime() - t0) / 1e9
      plain.unpersist(); hot.unpersist()
      println(f"""PROBE_JSON {"op":"text_skew_setsim","sf":"$src","replicate":$scale,"docs":$n,"cand_plain":$candsPlain,"cand_hot":$candsHot,"hot_inflation":${candsHot.toDouble / math.max(candsPlain, 1)}%.3f,"true_pairs_hot":$truePairs,"allpairs_hot_sec":$wall%.2f}""")
    }
    spark.stop()
  }
}
