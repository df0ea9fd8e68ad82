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

  test("zorder_key matches a bit-by-bit reference, unsigned mask semantics") {
    import spark.implicits._
    def ref(x: Int, y: Int): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((x.toLong >> i) & 1L) << (2 * i)
        z |= ((y.toLong >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(11)
    val cases = Seq((0, 0), (1, 0), (0, 1), (5, 3), (-1, 0),
      (Int.MinValue, Int.MaxValue)) ++
      (1 to 50).map(_ => (rnd.nextInt(), rnd.nextInt()))
    val got = cases.toDF("x", "y")
      .select(graft.functions.LayoutFunctions.zorder_key(
        col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (x, y) => ref(x, y) })
  }

  test("zorder layout shrinks per-partition bounding boxes vs natural order") {
    import graft.functions.LayoutFunctions.zorder_key
    val ev = Tables.events(spark, sfSmall)
      .select(col("user_id").cast("int").as("u"),
        (col("event_id") % 200).cast("int").as("p"),
        col("event_id"))
    def boxArea(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy(spark_partition_id().as("part"))
        .agg((max("u") - min("u")).cast("double").as("du"),
          (max("p") - min("p")).cast("double").as("dp"))
        .select(sum(col("du") * col("dp")).as("a"))
        .head.getDouble(0)
    val natural = boxArea(ev.repartitionByRange(16, col("event_id")))
    val zordered = boxArea(
      ev.repartitionByRange(16, zorder_key(col("u"), col("p"))))
    info(f"bounding-box area: natural $natural%.0f, z-ordered $zordered%.0f")
    // natural order clusters NEITHER dimension (event_id is unrelated
    // to u and p), so every partition spans the full (u, p) domain;
    // the z-layout must cut the summed area at least in half
    assert(zordered < natural / 2,
      s"z-order $zordered not < half of natural $natural")
  }
}
