package graft

import graft.ops.Layout
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("bucketed tables join with zero shuffle exchanges") {
    val o = Tables.orders(spark, sfTiny)
    val c = Tables.customer(spark, sfTiny)
    Layout.writeBucketed(o, "orders_b", 4, Seq("o_custkey"))
    Layout.writeBucketed(
      c.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", 4,
      Seq("o_custkey"))
    // force the non-broadcast path: at real scale neither side fits in
    // a broadcast, which is exactly when bucketing earns its keep
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() ==
        o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("partitioned writes prune partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part")
      .toString + "/events"
    val ev = Tables.events(spark, sfTiny)
      .withColumn("ymd", date_format(col("ts"), "yyyyMMdd"))
    Layout.writePartitioned(ev, dir, Seq("ymd"))
    val pruned = spark.read.parquet(dir).filter(col("ymd") === "20240101")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ymd"), plan)
    val total = spark.read.parquet(dir).count()
    assert(pruned.count() > 0 && pruned.count() < total)
  }

  test("salted join returns identical results to a plain join") {
    val o = Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sfTiny)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = o.join(c, "o_custkey")
    val salted = Layout.saltedJoin(o, c, "o_custkey", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.select(plain.columns.map(col): _*)
      .except(plain).isEmpty)
    assert(plain.except(
      salted.select(plain.columns.map(col): _*)).isEmpty)
  }
}
