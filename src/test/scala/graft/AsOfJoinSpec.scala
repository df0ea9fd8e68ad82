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

  test("as-of join rejects non-long/timestamp key or time columns") {
    val badLeft = Seq((1, ts(100), "p")).toDF("user_id", "ts", "p")
    intercept[IllegalArgumentException] {
      AsOfJoin(badLeft, right, "user_id", "ts", "c_user", "c_ts")
    }
  }

  test("as-of exec with tiebreaks is deterministic on duplicate timestamps") {
    // Lexicographic (ts, id) bound — the window-spelling semantics:
    // a same-timestamp right row with smaller id IS visible; with
    // larger id is not; among equal-ts matches the max id wins.
    val l = Seq(
      (1L, ts(100), 10L, "p_before"), // no click before -> null
      (1L, ts(200), 20L, "p_tie"), // clicks at ts=200 with id 15,25:
      // id 15 sorts before the purchase -> match; id 25 after -> not
      (1L, ts(300), 30L, "p_after") // clicks@200 (id 15,25): max id 25
    ).toDF("user_id", "ts", "event_id", "p")
    val r = Seq(
      (1L, ts(200), 15L, "c15"),
      (1L, ts(200), 25L, "c25")
    ).toDF("c_user", "c_ts", "c_event", "c")
    val out = AsOfJoin(l, r, "user_id", "ts", "c_user", "c_ts",
        leftTie = Some("event_id"), rightTie = Some("c_event"))
      .select("p", "c").collect()
      .map(row => (row.getString(0), row.getString(1))).toSet
    assert(out == Set(("p_before", null), ("p_tie", "c15"),
      ("p_after", "c25")), out)
  }

  test("q58 exec with tiebreaks matches the window spelling on tie-heavy data") {
    // Deliberately collide timestamps by flooring to 100-second grid,
    // then check the exec path against the declarative union-merge —
    // both must resolve ties by event_id identically.
    val ev = Tables.events(spark, sfTiny)
      .withColumn("ts", timestamp_seconds((unix_seconds(col("ts")) / 100) * 100))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_event"), col("value").as("c_value"))
    val viaExec = AsOfJoin(purchases, clicks, "user_id", "ts",
        "c_user", "c_ts",
        leftTie = Some("event_id"), rightTie = Some("c_event"))
      .select("user_id", "event_id", "c_ts", "c_value")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val viaWindow = ev
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("c_value",
        last(when(col("event_type") === "click", col("value")), true).over(w))
      .withColumn("c_ts",
        last(when(col("event_type") === "click", col("ts")), true).over(w))
      .filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "c_ts", "c_value")
    assert(viaExec.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaExec).isEmpty)
  }
}
