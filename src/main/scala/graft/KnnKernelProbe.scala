package graft

import graft.functions.VectorFunctions.{cosine_sim, cosine_sim_packed, pack_floats}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Price the exact-kNN kernel's residual per-pair tax (r12 verdict
  * item 7): SWEEP_r12 measured ~0.8 µs/pair of row-pipeline work
  * AROUND the codegen'd cosine in [[search.Ann.exactKnnPairs]] —
  * the broadcast-nested-loop join materializes every pair row, and
  * each one drags two UnsafeArrayData float arrays (8-byte header +
  * null word + payload) through the projection. The candidate
  * remedy: pack each side's embedding ONCE (O(n) prep) into a flat
  * BinaryType blob and run [[graft.functions.CosineSimilarityPacked]]
  * (bit-identical arithmetic) so pair rows carry payload bytes only.
  *
  * Measures the FULL operator both ways (join + window top-k — the
  * shape q127/q134's exact regimes serve) plus a kernel-only variant
  * (aggregate over the pair stream, no window) that isolates the
  * per-pair tax from the top-k machinery.
  *
  * VERDICT (round 13, measured at 4M pairs, min-of-5, quiet host):
  * the packed kernel is NOT the win — at the same sort shape it's
  * 2.775 s vs array's 2.714 s (kernel-only 0.19 vs 0.16 µs/pair:
  * UnsafeArrayData float access is already flat, packing just adds a
  * prep projection). What the pricing DID expose: exactKnnPairs'
  * final global orderBy range-SAMPLES its child, executing the n²
  * join+window pipeline twice on every materialized run (invisible
  * to bench's count(), whose EliminateSorts drops the sort; fully
  * paid by Verify/collect). The shipped fix is a single-partition
  * shuffle + local sort of the ≤ k·|queries| output rows — 5.37 →
  * 2.71 s (1.94×) on the materialized path, array kernel kept.
  * exactKnnPairLimit stays 25M: the regime bound also prices the
  * DuckDB oracle's n² join, which gains nothing from this.
  */
object KnnKernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-knn-kernel-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val nVec = emb.count()
    val pairs = nVec * (nVec - 1)

    // the LEGACY array<float> spelling (what exactKnnPairs shipped
    // through round 12) — exactKnnPairs itself is the packed one now,
    // so the probe keeps pricing the switch it motivated
    def arrayFull(df: DataFrame, onePassSort: Boolean): DataFrame = {
      val q = df.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))
        .repartition(col("query_id"))
      val c = df.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv"))
      val w = Window.partitionBy("query_id")
        .orderBy(desc("sim"), asc("neighbor_id"))
      val topk = q.join(broadcast(c), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine_sim(col("qv"), col("nv")).as("sim"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sim"), 4).as("sim"), col("rank"))
      if (onePassSort)
        topk.repartition(1).sortWithinPartitions("query_id", "rank")
      else topk.orderBy("query_id", "rank")
    }
    // kernel-only: the same pair stream folded to one aggregate —
    // no window shuffle/sort, so wall/pairs isolates join+project+sim
    def kernelOnly(packed: Boolean): DataFrame = {
      val (qv, nv, sim) =
        if (packed) (pack_floats(col("embedding")),
          pack_floats(col("embedding")),
          (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
            => cosine_sim_packed(a, b))
        else (col("embedding"), col("embedding"),
          (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
            => cosine_sim(a, b))
      val q = emb.select(col("vec_id").as("query_id"), qv.as("qv"))
        .repartition(col("query_id"))
      val c = emb.select(col("vec_id").as("neighbor_id"), nv.as("nv"))
      q.join(broadcast(c), col("neighbor_id") =!= col("query_id"))
        .select(sim(col("qv"), col("nv")).as("sim"))
        .agg(sum("sim"))
    }

    def best(mk: () => DataFrame): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().collect()
        (System.nanoTime() - t0) / 1e9
      }.min

    // parity first: the two spellings must agree row-for-row
    val cur = search.Ann.exactKnnPairs(emb, emb)
    val legacy = arrayFull(emb, onePassSort = false)
    val diff = cur.exceptAll(legacy).count() +
      legacy.exceptAll(cur).count()
    require(diff == 0, s"packed spelling diverged on $diff rows")

    val tFullArr = best(() => arrayFull(emb, onePassSort = false))
    val tFullArr1 = best(() => arrayFull(emb, onePassSort = true))
    val tFullPak = best(() => search.Ann.exactKnnPairs(emb, emb))
    val tKernArr = best(() => kernelOnly(packed = false))
    val tKernPak = best(() => kernelOnly(packed = true))
    def us(t: Double): Double = t / pairs * 1e6
    // round-13 standing calls, re-asserted on every run: (1) the
    // one-pass final sort ships (vs the r12 range-sort spelling);
    // (2) the ARRAY kernel ships — packed must beat it at the SAME
    // sort shape by ≥1.25× before a switch is back on the table
    val speedup = tFullArr / tFullPak
    val call =
      if (tFullArr1 / tFullPak >= 1.25) "switch-to-packed-candidate"
      else "keep-array-onepass"
    println(String.format(java.util.Locale.ROOT,
      """PROBE_JSON {"op":"knn_kernel_pricing","sf":"%s","vecs":%d,"pairs":%d,"reps":%d,"full_array_rangesort_sec":%.3f,"full_array_onepass_sec":%.3f,"full_packed_onepass_sec":%.3f,"kernel_array_sec":%.3f,"kernel_packed_sec":%.3f,"kernel_array_us_per_pair":%.4f,"kernel_packed_us_per_pair":%.4f,"full_speedup_vs_r12":%.2f,"call":"%s"}""",
      sfDir, Long.box(nVec), Long.box(pairs), Int.box(reps),
      Double.box(tFullArr), Double.box(tFullArr1), Double.box(tFullPak),
      Double.box(tKernArr), Double.box(tKernPak),
      Double.box(us(tKernArr)), Double.box(us(tKernPak)),
      Double.box(speedup), call))
    spark.stop()
  }
}
