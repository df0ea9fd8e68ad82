package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the incremental IVF·PQ ingest claim (q139): appending a
  * delta batch through the FROZEN standing index must cost O(Δ) —
  * assign + frozen-codebook encode + partitioned append — while the
  * alternative is a full rebuild (coarse/fine k-means + 8 subspace
  * k-means fits + corpus assignment + full save) that is O(n). The
  * probe times both paths per dir with the standing state pre-warmed
  * (the production setup: the index exists; a batch arrives).
  *
  *   sbt "runMain graft.IvfPqIngestProbe /root/testdata/sf0.1 /tmp/graft_sfx10v2"
  */
object IvfPqIngestProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-ivf-pq-ingest-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def f(d: Double): String = String.format(java.util.Locale.ROOT,
      "%.2f", java.lang.Double.valueOf(d))
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    for (d <- dirs) {
      val emb = Tables.embeddings(spark, d)
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      val delta = emb.filter(col("vec_id") % 10 === 0)
      val (nCorpus, nDelta) = (corpus.count(), delta.count())
      // standing state, pre-warmed and untimed: the mod10 IVF index,
      // the frozen PQ codebooks, and the persisted corpus cell codes
      val index = search.Ann.cachedIndex(spark, d, "mod10", corpus)
      val (codes, books) = search.Pq.sliceIndex(spark, d, "mod10", corpus)
      val standingDir =
        Scale.managedTempDir("graft_ingest_probe").toString + "/standing"
      search.Pq.saveCellCodes(
        index.assigned.select("neighbor_id", "ccell", "fcell")
          .join(codes.withColumnRenamed("vec_id", "neighbor_id"),
            "neighbor_id"), standingDir)
      // O(Δ) path: assign + frozen-encode + append the delta only
      val ingestSec = timed {
        search.Pq.appendCellCodes(
          search.Pq.deltaCellCodes(index, delta, books), standingDir)
      }
      // O(n) alternative: rebuild everything from scratch for
      // corpus+delta — fresh two-level IVF, fresh PQ codebooks (no
      // session caches), full assignment, full save
      val rebuildDir =
        Scale.managedTempDir("graft_ingest_probe").toString + "/rebuild"
      val rebuildSec = timed {
        val idx = search.Ann.buildIvfIndex(emb)
        val (cds, _) = search.Pq.encode(emb)
        search.Pq.saveCellCodes(
          idx.assigned.select("neighbor_id", "ccell", "fcell")
            .join(cds.withColumnRenamed("vec_id", "neighbor_id"),
              "neighbor_id"), rebuildDir)
      }
      val appended = spark.read.parquet(s"$standingDir/cellcodes").count()
      println(s"INGESTPROBE $d corpus=$nCorpus delta=$nDelta " +
        s"ingest=${f(ingestSec)}s rebuild=${f(rebuildSec)}s " +
        s"ratio=${f(rebuildSec / ingestSec)} appended_rows=$appended")
      println(s"""PROBE_JSON {"probe":"q139_ingest_vs_rebuild",""" +
        s""""dir":"$d","corpus_rows":$nCorpus,"delta_rows":$nDelta,""" +
        s""""ingest_sec":${f(ingestSec)},"rebuild_sec":${f(rebuildSec)},""" +
        s""""rebuild_over_ingest":${f(rebuildSec / ingestSec)}}""")
    }
    spark.stop()
  }
}
