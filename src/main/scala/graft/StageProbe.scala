package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Stage-level attribution for wide warm-rep spreads (the round-8
  * verdict's q124/q81 ask): runs the named queries several times at a
  * given dir with a task-metrics listener attached and reports, per
  * rep, the top stages by executor run time with their intra-stage
  * task skew (max/median task time), shuffle read, and spill.
  *
  * The diagnostic split this buys: if a rep's extra seconds live in
  * ONE stage whose max/median task ratio is high, the spread is
  * partition skew in that stage's shuffle (fix: salting/AQE); if all
  * stages inflate roughly uniformly — same skew ratios, bigger
  * absolute times — the spread is host contention, now measured
  * rather than asserted.
  *
  *   sbt "runMain graft.StageProbe /tmp/graft_sfx30v2 q124_fuzzy_string_join q81_pagerank"
  */
object StageProbe {
  private[graft] class Collector extends SparkListener {
    // One lock covers every mutation AND clear(): the listener bus is
    // async, so a straggler onTaskEnd racing a between-reps clear()
    // must see either the old epoch or the new one atomically — a
    // getOrElseUpdate/apply pair interleaved with clear() would throw
    // inside the listener (silently dropping the sample) or leak a
    // prior rep's stages into the next rep's attribution.
    private val lock = new Object
    val taskTimes = TrieMap[Int, ArrayBuffer[Long]]()
    val shuffleRead = TrieMap[Int, Long]()
    val spill = TrieMap[Int, Long]()
    val names = TrieMap[Int, String]()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) lock.synchronized {
        taskTimes.getOrElseUpdate(e.stageId, ArrayBuffer()) +=
          m.executorRunTime
        shuffleRead.put(e.stageId, shuffleRead.getOrElse(e.stageId, 0L) +
          m.shuffleReadMetrics.totalBytesRead)
        spill.put(e.stageId, spill.getOrElse(e.stageId, 0L) +
          m.diskBytesSpilled)
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      lock.synchronized {
        names.put(e.stageInfo.stageId,
          e.stageInfo.name.takeWhile(_ != '\n').take(60))
      }
    def clear(): Unit = lock.synchronized {
      taskTimes.clear(); shuffleRead.clear(); spill.clear(); names.clear()
    }
    /** Stable snapshot for reporting (taken under the same lock). */
    def snapshot(): (Map[Int, Seq[Long]], Map[Int, Long], Map[Int, Long],
        Map[Int, String]) = lock.synchronized {
      (taskTimes.map { case (k, v) => k -> v.toSeq }.toMap,
        shuffleRead.toMap, spill.toMap, names.toMap)
    }
  }

  /** Worst intra-stage task skew (max/median task time) among the
    * MATERIAL stages of a snapshot — stages whose summed task time
    * clears both an absolute floor and a fraction of the query's
    * total, with enough tasks for a median to mean anything. Tiny
    * stages trivially show huge ratios (2 ms vs 0 ms) and would
    * flood a >10× flag with noise; the r17 serial-scan find (skew
    * 234–1051×) lived in stages holding most of the task time, which
    * is exactly what this filter keeps. Returns
    * (skew, stageName, tasks, stageTaskTimeSum_s) for the worst
    * qualifying stage, or None when nothing qualifies.
    */
  private[graft] def worstMaterialSkew(
      taskTimes: Map[Int, Seq[Long]], names: Map[Int, String],
      minTasks: Int = 4, minSumMs: Double = 300.0,
      minFrac: Double = 0.05): Option[(Double, String, Int, Double)] = {
    val total = taskTimes.values.map(_.sum).sum.toDouble
    taskTimes.toSeq.flatMap { case (sid, ts) =>
      val sum = ts.sum.toDouble
      if (ts.size < minTasks || sum < minSumMs || sum < total * minFrac)
        None
      else {
        val sorted = ts.sorted
        val med = sorted(sorted.size / 2)
        if (med <= 0) None
        else Some((sorted.last.toDouble / med,
          names.getOrElse(sid, s"stage $sid"), ts.size, sum / 1e3))
      }
    }.sortBy(-_._1).headOption
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = if (args.length > 1) args.drop(1).toSeq
      else Seq("q124_fuzzy_string_join")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt.max(2)
    val spark = Scale.sessionBuilder("graft-stage-probe", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val coll = new Collector
    spark.sparkContext.addSparkListener(coll)
    def f(d: Double): String = String.format(java.util.Locale.ROOT,
      "%.2f", java.lang.Double.valueOf(d))
    for (name <- queries) {
      val fn = SparkEntry.queries(name)
      // one unmeasured rep: standing caches/codegen are one-time
      fn(spark, dir).count()
      val repRows = (1 to reps).map { rep =>
        coll.clear()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500) // let the async listener bus drain
        val (taskTimes, shufRead, spills, nameMap) = coll.snapshot()
        val stages = taskTimes.toSeq.map { case (sid, ts) =>
          val sorted = ts.sorted
          val med = if (sorted.isEmpty) 0L else sorted(sorted.size / 2)
          val mx = if (sorted.isEmpty) 0L else sorted.last
          (sid, sorted.size, sorted.sum / 1e3, mx / 1e3,
            med / 1e3, if (med > 0) mx.toDouble / med else 0.0,
            shufRead.getOrElse(sid, 0L) / 1e6,
            spills.getOrElse(sid, 0L) / 1e6)
        }.sortBy(-_._3).take(6)
        val stageJson = stages.map { case (sid, n, sum, mx, med, ratio,
            sr, sp) =>
          s"""{"stage":$sid,"name":"${nameMap.getOrElse(sid, "?")}",""" +
            s""""tasks":$n,"task_time_sum_s":${f(sum)},""" +
            s""""task_max_s":${f(mx)},"task_med_s":${f(med)},""" +
            s""""max_over_med":${f(ratio)},"shuffle_read_mb":${f(sr)},""" +
            s""""spill_mb":${f(sp)}}"""
        }.mkString("[", ",", "]")
        println(f"STAGEPROBE $name rep=$rep wall=${f(wall)}s")
        stages.foreach { case (sid, n, sum, mx, med, ratio, sr, sp) =>
          println(f"  stage $sid%5d ${nameMap.getOrElse(sid, "?")}%-40s " +
            f"tasks=$n%4d sum=${f(sum)}%8ss max=${f(mx)}%7ss " +
            f"med=${f(med)}%7ss skew=${f(ratio)}%5s " +
            f"shufMB=${f(sr)}%8s spillMB=${f(sp)}%8s")
        }
        s"""{"rep":$rep,"wall_sec":${f(wall)},"top_stages":$stageJson}"""
      }
      println(s"""PROBE_JSON {"probe":"stage_attribution","query":"$name",""" +
        s""""dir":"$dir","reps":[${repRows.mkString(",")}]}""")
    }
    spark.stop()
  }
}
