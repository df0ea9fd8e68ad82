package graft

import org.apache.spark.sql.SparkSession

/** Scale-routing knobs. Exact all-pairs similarity (cross join) is
  * only ever the right plan on a bounded input; every operator that
  * keeps a deliberate exact path consults `exactPairLimit` and routes
  * to its banded/LSH variant above it, so a 100×-scale input can never
  * reach an O(n²) plan by accident.
  */
object Scale {

  /** Max input rows for which an exact all-pairs (cross-join) plan is
    * allowed; above it operators switch to their LSH/banded variant.
    * Override per session with `spark.graft.exactPairLimit`.
    */
  val DefaultExactPairLimit = 100000L

  def exactPairLimit(s: SparkSession): Long =
    s.conf.getOption("spark.graft.exactPairLimit")
      .map(_.toLong).getOrElse(DefaultExactPairLimit)
}
