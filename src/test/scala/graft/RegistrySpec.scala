package graft

import graft.functions.Registry
import org.apache.spark.sql.functions._

class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    Registry.register(spark)
    Seq((Seq(1f, 0f), Seq(1f, 0f), Seq("a", "b"))).toDF("x", "y", "t")
      .createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT cosine_sim(x, y) AS cs, dot_product(x, y) AS dp,
        | simhash64(t) AS sh, hyperplane_sig(x, 8, 7) AS hp FROM v"""
        .stripMargin).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) >= 0 && r.getInt(3) < 256)
  }

  test("zorder_key is callable from SQL and type-checks") {
    Registry.register(spark)
    assert(spark.sql("SELECT zorder_key(5, 3) AS z").head.getLong(0) == 27L)
    val e = intercept[Exception] {
      spark.sql("SELECT zorder_key(CAST(5 AS BIGINT), 3)").collect()
    }
    assert(e.getMessage.contains("zorder_key"))
  }

  test("minhash/LSH expressions are callable from SQL") {
    Registry.register(spark)
    Seq((Seq(3L, 1L, 2L), Seq(1L, 2L, 3L)))
      .toDF("a", "b").createOrReplaceTempView("vm")
    val r = spark.sql(
      """SELECT sig_matches(minhash_sig(array_sort(a), 16),
        |                   minhash_sig(array_sort(b), 16)) AS m,
        | first_equal_band(minhash_sig(array_sort(a), 16),
        |                  minhash_sig(array_sort(b), 16), 4) AS fb,
        | sorted_intersect_size(array_sort(a), array_sort(b)) AS i
        | FROM vm""".stripMargin).head
    assert(r.getInt(0) == 16, "same set -> all minhashes agree")
    assert(r.getInt(1) == 0, "same set -> first band equal")
    assert(r.getInt(2) == 3)
  }

  test("top_k_agg is callable from SQL with a partial phase") {
    Registry.register(spark)
    Seq((1L, 10L, 5.0), (1L, 11L, 7.0), (1L, 12L, 3.0), (2L, 20L, 1.0))
      .toDF("g", "id", "s").createOrReplaceTempView("vt")
    val df = spark.sql(
      "SELECT g, top_k_agg(id, s, 2) AS topk FROM vt GROUP BY g ORDER BY g")
    assert(df.queryExecution.executedPlan.toString
      .contains("partial_top_k_agg"))
    val rows = df.collect()
    val g1 = rows(0).getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("topk")
    assert(g1.map(_.getLong(0)) == Seq(11L, 10L), g1.toString)
    assert(rows(1).getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("topk").map(_.getLong(0)) == Seq(20L))
  }

  test("hyperplane_sig rejects non-literal nbits") {
    Registry.register(spark)
    Seq((Seq(1f, 0f), 8)).toDF("x", "n").createOrReplaceTempView("v2")
    intercept[Exception] {
      spark.sql("SELECT hyperplane_sig(x, n) FROM v2").collect()
    }
  }

  test("cosine_sim type-checks its inputs") {
    Registry.register(spark)
    Seq((1, 2)).toDF("a", "b").createOrReplaceTempView("v3")
    intercept[Exception] {
      spark.sql("SELECT cosine_sim(a, b) FROM v3").collect()
    }
  }

  test("shingle_hashes is callable from SQL and matches the Column API") {
    Registry.register(spark)
    Seq("one two three four", "x").toDF("text")
      .createOrReplaceTempView("vsh")
    val sql = spark.sql("SELECT shingle_hashes(text, 3) AS h FROM vsh")
      .collect().map(_.getSeq[Long](0))
    val api = spark.table("vsh")
      .select(graft.functions.HashFunctions
        .shingle_hashes(col("text"), 3).as("h"))
      .collect().map(_.getSeq[Long](0))
    assert(sql.toSeq == api.toSeq)
    assert(sql(0).length == 2 && sql(1).length == 1)
  }

  test("bottom_k_agg is SQL-registered and matches the rank window") {
    Registry.register(spark)
    spark.range(100)
      .selectExpr("id % 3 AS g", "id", "md5(CAST(id AS STRING)) AS p")
      .createOrReplaceTempView("vbk")
    val agg = spark.sql(
      """SELECT g, entry.id AS id FROM (
        |  SELECT g, posexplode(bottom_k_agg(p, id, 4)) AS (pos, entry)
        |  FROM vbk GROUP BY g)""".stripMargin)
    val win = spark.sql(
      """SELECT g, id FROM (
        |  SELECT g, id, row_number() OVER (PARTITION BY g
        |    ORDER BY p, id) AS rk FROM vbk) WHERE rk <= 4""".stripMargin)
    assert(agg.count() == 12)
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }

  test("bloom build and probe are callable from SQL") {
    Registry.register(spark)
    spark.range(1, 101).selectExpr("array(id * 7) AS ks")
      .createOrReplaceTempView("vb")
    val hits = spark.sql(
      """WITH bf AS (SELECT bloom_build(ks, 4096, 7) AS b FROM vb)
        |SELECT count(*) AS n FROM vb, bf
        |WHERE bloom_contains_any(b, ks, 7)""".stripMargin)
      .head.getLong(0)
    assert(hits == 100L, s"inserted keys must all hit, got $hits")
  }
}
