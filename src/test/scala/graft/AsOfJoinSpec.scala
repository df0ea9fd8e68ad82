package graft

import java.sql.Timestamp

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  private val left = Seq(
    (1L, ts(100), "p1"), // before any click -> nulls
    (1L, ts(300), "p2"), // after click@200 -> c200
    (1L, ts(500), "p3"), // after clicks@200,400 -> c400
    (2L, ts(250), "p4"), // user 2: only click@100 -> c100 (no bleed from u1)
    (3L, ts(100), "p5") // user 3 has no clicks at all -> nulls
  ).toDF("user_id", "ts", "p")

  private val right = Seq(
    (1L, ts(200), "c200"), (1L, ts(400), "c400"),
    (1L, ts(500), "c500"), // same instant as p3: strictly-before excludes
    (2L, ts(100), "c100"), (2L, ts(260), "c260")
  ).toDF("c_user", "c_ts", "c")

  private def expectJoin(dfRows: Array[org.apache.spark.sql.Row]): Unit = {
    val got = dfRows.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[String]("p"), r.getAs[String]("c")))
      .toSet
    assert(got == Set(
      (1L, "p1", null), (1L, "p2", "c200"), (1L, "p3", "c400"),
      (2L, "p4", "c100"), (3L, "p5", null)))
  }

  test("as-of exec: strictly-before semantics, per-key reset, null fill") {
    val out = AsOfJoin(left, right, "user_id", "ts", "c_user", "c_ts")
    expectJoin(out.collect())
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // exec nodes print minus "Exec"
  }

  test("as-of exec: correct across adversarial input partitioning") {
    // scatter inputs over many partitions; EnsureRequirements must
    // repartition+sort both sides before the merge scan
    val out = AsOfJoin(left.repartition(7), right.repartition(5),
      "user_id", "ts", "c_user", "c_ts")
    expectJoin(out.collect())
    // AQE wraps the plan, so inspect the final plan string: both
    // sides must be exchanged to the key and the merge node present
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("AsOfJoin"), p)
  }

  test("as-of exec matches the declarative union-merge on real events") {
    val ev = Tables.events(spark, sfSmall)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    val viaExec = AsOfJoin(purchases, clicks, "user_id", "ts", "c_user", "c_ts")
      .select(col("user_id"), col("event_id"),
        col("c_ts").as("asof_click_ts"),
        col("c_value").as("asof_click_value"))
    val viaWindow = ops.Temporal.asofJoin.fn(spark, sfSmall)
      .select(col("user_id"), col("event_id"), col("asof_click_ts"),
        col("asof_click_value"))
    assert(viaExec.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaExec).isEmpty)
  }

  test("as-of join rejects colliding column names") {
    intercept[IllegalArgumentException] {
      AsOfJoin(left, left, "user_id", "ts", "user_id", "ts")
    }
  }
}
