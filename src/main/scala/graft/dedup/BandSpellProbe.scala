package graft.dedup

import graft.Tables
import graft.functions.HashFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 verdict item 6: an at-scale original-vs-alias pair for
  * the banded self-join respell FAMILY (q124 was the only member
  * with a measured pair; the rest were argued via the PlanSpec pin).
  *
  * Member measured: the minhash candidate join behind q31/q33 —
  * the family's most expensive upstream. The SHIPPED spelling joins
  * Dataset aliases of one banded plan (`banded.as("p")/as("q")`), so
  * the two bucket-key exchanges are sameResult and ReuseExchange
  * computes tokenize → minhash → band + its shuffle-write ONCE. The
  * PRIOR spelling renamed doc_id→doc_a/doc_b (and every payload
  * column) BELOW the exchange — semantically identical, but
  * sameResult breaks and the signature pipeline runs once per side.
  *
  * The distinction only exists in the SHUFFLE regime (a broadcast
  * side is built once either way), so the probe runs with both
  * broadcast thresholds at −1 (static + AQE — the PlanSpec pin's
  * conf pair) and takes a scale-dir argument: the 10× ScaleSweep
  * corpus is the at-scale point; sf0.1 forced-shuffle is the
  * controlled local point. Interleaved reps, min per spelling, and
  * pair-count parity asserted (the spellings must agree row-for-row
  * in count).
  */
object BandSpellProbe {

  /** The pre-r13 spelling: rename-below-the-exchange. */
  private def candidatePairsRenamed(toks: DataFrame, numHashes: Int,
      bands: Int, threshold: Double): DataFrame = {
    val prefLen = math.min(numHashes, 32)
    val banded = Dedup.bandedSig(toks, numHashes, bands)
    val p = banded.select(col("doc_id").as("doc_a"), col("sz").as("sz_a"),
      col("pref").as("pref_a"), col("bh").as("bh_a"),
      col("band"), col("band_hash"))
    val q = banded.select(col("doc_id").as("doc_b"), col("sz").as("sz_b"),
      col("pref").as("pref_b"), col("bh").as("bh_b"),
      col("band"), col("band_hash"))
    p.join(q, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")) >=
        greatest(col("sz_a"), col("sz_b")) * threshold)
      .filter(first_equal_band(col("bh_a"), col("bh_b"), bands)
        === col("band"))
      .filter(sig_matches(col("pref_a"), col("pref_b")).cast("double")
        / prefLen >= threshold - 0.25)
      .select(col("doc_a"), col("doc_b"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Scale.sessionBuilder("graft-band-spell-probe", cpus)
      // force the shuffle regime both statically and under AQE —
      // broadcast builds once per side either way, so only the
      // shuffle plan exposes the reuse-vs-recompute difference
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)", "count(distinct id % 7)")
      .collect()
    val (numHashes, bands, threshold) = (64, 8, 0.9)
    def toks = Dedup.tokenSets(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    val spellings: Seq[(String, () => DataFrame)] = Seq(
      "alias_reuse" ->
        (() => Dedup.candidatePairs(toks, numHashes, bands, threshold)),
      "rename_below" ->
        (() => candidatePairsRenamed(toks, numHashes, bands, threshold)))
    // parity first (also the untimed warmup for both spellings)
    val counts = spellings.map { case (n, mk) => n -> mk().count() }
    require(counts.map(_._2).distinct.size == 1,
      s"spellings disagree: $counts")
    val walls = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (n, mk) <- spellings) {
      val t0 = System.nanoTime()
      mk().count()
      walls(n) = walls(n) :+ (System.nanoTime() - t0) / 1e9
    }
    def f(x: Double): String = String.format(java.util.Locale.ROOT,
      "%.4f", java.lang.Double.valueOf(x))
    def load1(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").head
      catch { case _: Throwable => "null" }
    val body = spellings.map { case (n, _) =>
      val ts = walls(n)
      s""""$n":{"min":${f(ts.min)},"reps":[${ts.map(f).mkString(",")}]}"""
    }.mkString(",")
    println(s"""PROBE_JSON {"probe":"band_spell_pair","dir":"$sfDir",""" +
      s""""pairs":${counts.head._2},"reps":$reps,""" +
      s""""load1_end":${load1()},"forced_shuffle":true,$body}""")
    spark.stop()
  }
}
