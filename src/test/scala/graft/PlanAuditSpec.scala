package graft

/** Locks the global-sort audit's invariant into the suite: NO query
  * may plan a global sort over a shuffle-free child — that shape's
  * range-bound sampling re-executes the entire child on every
  * materialization (2× wall, invisible to `count()` benches — how
  * q127's regression hid for four rounds; SWEEP_r13
  * `global_sort_audit`). A future operator that lands the shape
  * fails here with its name, instead of waiting for a probe session.
  */
class PlanAuditSpec extends SparkSpec {

  test("no query plans a global sort over a shuffle-free child") {
    // the audit reads STATIC plans — AQE's wrapper hides the
    // sort/exchange tree behind unevaluated stages until execution
    val key = "spark.sql.adaptive.enabled"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val severe = PlanAudit.globalSortFindings(spark, sfTiny)
        .filter(_._2 == "reexecutes_all").map(_._1).distinct
      assert(severe.isEmpty,
        s"global sort with no shuffle below it (whole child re-executes " +
          s"on materialization) in: ${severe.mkString(", ")}")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
