package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Throughput/state probe for the streaming near-dup detector — the
  * scale measurement the batch tier gets from ScaleSweep: drive the
  * sfDir documents through [[graft.streaming.NearDup
  * .nearDupCandidatesStream]] as `SPARK_GRAFT_BATCHES` MemoryStream
  * micro-batches at each corpus size, and record
  *
  *   - ingest throughput (docs/s over the drained run, warm batch
  *     rate excluding the first-batch plan/codegen cost), and
  *   - the max `numRowsTotal` across state operators — bucket-group
  *     count, the number the state store actually holds; with the
  *     event-time timeout it must track ~one horizon of documents
  *     (bands × distinct buckets), not stream lifetime.
  *
  * Emits one `PROBE_JSON` line per corpus size (sweep-artifact
  * shape). Corpus sizes default to the 1-in-10 sample and the full
  * table, giving the two-point scaling row the round artifact wants.
  */
object StreamNearDupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-stream-near-dup-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val all = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (frac <- Seq(10, 1)) {
      val docs = all.filter(_._1 % frac == 0)
      val input = MemoryStream[(Long, String, Timestamp)](spark)
      val name = s"neardup_probe_$frac"
      val q = graft.streaming.NearDup.nearDupCandidatesStream(
          input.toDF().toDF("doc_id", "text", "ts"),
          horizon = "1 hour")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val per = math.max(1, docs.length / batches)
        val groups = docs.grouped(per).toSeq
        var maxState = 0L
        var warmNanos = 0L
        var warmDocs = 0L
        groups.zipWithIndex.foreach { case (g, i) =>
          val t0 = System.nanoTime()
          // event time advances 1 s per batch — everything stays
          // inside one horizon, the worst case for state size
          input.addData(g.map { case (id, tx) =>
            (id, tx, new Timestamp(1700000000000L + i * 1000L))
          })
          q.processAllAvailable()
          val dt = System.nanoTime() - t0
          if (i > 0) { warmNanos += dt; warmDocs += g.length }
          maxState = math.max(maxState,
            Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
              .map(_.numRowsTotal).sum)
        }
        val pairs = spark.table(name).count()
        // warm stats exclude batch 0; a single-batch corpus has no
        // warm batches, and 0/0 must not emit NaN into the artifact
        val docsPerSec =
          if (warmDocs == 0) 0.0 else warmDocs / (warmNanos / 1e9)
        println(f"""PROBE_JSON {"op":"stream_neardup","sf":"$sfDir","docs":${docs.length},"batches":${groups.length},"warm_docs":$warmDocs,"docs_per_sec":$docsPerSec%.1f,"max_state_rows":$maxState,"candidate_pairs":$pairs}""")
      } finally q.stop()
    }
    spark.stop()
  }
}
