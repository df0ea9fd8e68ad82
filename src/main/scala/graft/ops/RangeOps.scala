package graft.ops

import graft.{QueryDef, Tables}
import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** Range (interval) join — point column against interval table. The
  * reference has nothing like it; it's a staple of behavioral /
  * curation pipelines (value banding, IP→geo, time-validity lookups).
  *
  * Written as the NAIVE inequality join: Spark alone plans this as a
  * broadcast nested-loop — O(|points|·|intervals|). With
  * [[graft.plans.RangeJoinRewrite]] active (installed via
  * `spark.sql.extensions`, enabled by the bucket-width conf set
  * below), the optimizer rewrites it into a bucketed equi-join, the
  * plan shape that survives an interval table too large to broadcast.
  * The DuckDB oracle gates that the rewrite preserves results
  * exactly.
  */
object RangeOps {

  val BandWidth = 25000.0
  val NumBands = 24

  /** Range join with the bucketed rewrite scoped to EXACTLY this join:
    * tags the analyzed Join node for [[RangeJoinRewrite]] instead of
    * flipping the session-wide conf, so no other join in the session
    * (or a later query on the shared session) is affected.
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
      cond: Column, width: Double): DataFrame = {
    val joined = points.join(intervals, cond)
    // tag ONLY the outermost Join (the one this call created) —
    // collectFirst is pre-order, so an inner join inside points/
    // intervals is never tagged with this width
    joined.queryExecution.analyzed.collectFirst {
      case j: Join => j.setTagValue(RangeJoinRewrite.WidthTag, width)
    }
    joined
  }

  val rangeJoin: QueryDef = QueryDef.sql(
    "q53_range_join",
    s"""WITH bands AS (
       |  SELECT i AS band_id, i * $BandWidth AS lo, (i + 1) * $BandWidth AS hi
       |  FROM generate_series(0, ${NumBands - 1}) t(i))
       | SELECT band_id, CAST(count(*) AS BIGINT) AS n_orders,
       |   CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
       |     AS sum_price
       | FROM orders JOIN bands
       |   ON o_totalprice >= lo AND o_totalprice < hi
       | GROUP BY band_id ORDER BY band_id""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    val bands = s.range(0, NumBands).select(col("id").as("band_id"),
      (col("id") * BandWidth).as("lo"),
      ((col("id") + 1) * BandWidth).as("hi"))
    bucketedRangeJoin(Tables.orders(s, d), bands,
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"),
        BandWidth)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(28,6)")).cast("double")
          .as("sum_price"))
      .orderBy("band_id")
  }

  val defs: Seq[QueryDef] = Seq(rangeJoin)
}
