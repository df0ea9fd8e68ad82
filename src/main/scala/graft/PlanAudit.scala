package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Systematic sweep for the orderBy-double-execution shape that the
  * round-13 kNN pricing found ANECDOTALLY in q127 (SWEEP_r13
  * knn_kernel_pricing): a global `orderBy` is planned as a RANGE sort,
  * and range partitioning SAMPLES its child RDD to pick partition
  * bounds — a separate job that re-executes the child from the last
  * shuffle boundary. If there is NO shuffle below the sort (broadcast
  * joins and scans all the way down), the sampling job re-executes the
  * ENTIRE pipeline, so every materialization pays the query twice.
  * Invisible to bench's `count()` (EliminateSorts drops the sort
  * there); fully paid by Verify/collect/write — exactly how q127's 2×
  * hid for four rounds.
  *
  * This audit walks every [[SparkEntry.queries]] plan (AQE off, so
  * the static plan shape is inspectable) and reports each GLOBAL
  * SortExec by severity:
  *
  *   - `reexecutes_all` — no ShuffleExchange anywhere below the sort:
  *     the q127 shape, the whole child runs twice on materialization.
  *   - `reexecutes_last_stage` — a shuffle exists below: sampling
  *     reuses shuffle outputs and re-runs only the post-shuffle
  *     stage. The residual cost is that stage's work (usually cheap
  *     projection/filter; can still bite when the final stage holds
  *     an expensive verify kernel).
  *
  * Single-partition sorts (`repartition(1).sortWithinPartitions`, the
  * shipped fix for small outputs) don't plan a range exchange and are
  * invisible here — by design.
  *
  * Emits one PROBE_JSON line; run at sf0.001 (plan shape is
  * SF-independent; regime-routed queries that CHANGE shape with SF
  * can be audited at other dirs by passing the dir).
  */
object PlanAudit {

  /** (query, severity) per global SortExec across every registered
    * query's static plan. Requires a session with AQE OFF (the
    * adaptive wrapper hides the sort/exchange tree behind
    * unevaluated query stages until execution); the main below
    * builds one, and PlanAuditSpec toggles the shared spec session.
    */
  def globalSortFindings(spark: SparkSession, sfDir: String)
      : Seq[(String, String)] = {
    def hasShuffleBelow(p: SparkPlan): Boolean =
      p.exists { case _: ShuffleExchangeLike => true; case _ => false }
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val sorts =
          try {
            val df = fn(spark, sfDir)
            df.queryExecution.executedPlan.collect {
              case s: SortExec if s.global => s
            }
          } catch {
            // a query whose plan cannot even build here (env-bound
            // streams etc.) is out of the audit's scope, not a finding
            case e: Throwable =>
              System.err.println(s"[audit] $name skipped: " +
                e.toString.takeWhile(_ != '\n').take(120))
              Seq.empty
          }
        sorts.map { s =>
          val sev =
            if (hasShuffleBelow(s.child)) "reexecutes_last_stage"
            else "reexecutes_all"
          (name, sev)
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static plans: AdaptiveSparkPlanExec hides the sort/exchange
      // tree behind unevaluated query stages until execution
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val findings = globalSortFindings(spark, sfDir)
    val bad = findings.filter(_._2 == "reexecutes_all")
    val mild = findings.filter(_._2 == "reexecutes_last_stage")
    def arr(xs: Seq[(String, String)]): String =
      xs.map(x => s""""${x._1}"""").distinct.mkString("[", ",", "]")
    println(s"""PROBE_JSON {"probe":"global_sort_audit","dir":"$sfDir",""" +
      s""""queries_audited":${SparkEntry.queries.size},""" +
      s""""reexecutes_all":${arr(bad)},""" +
      s""""reexecutes_last_stage":${arr(mild)}}""")
    spark.stop()
  }
}
