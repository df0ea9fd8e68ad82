package graft

import graft.functions.FrequencyAggregates.heavy_hitters
import org.apache.spark.sql.functions._

import scala.util.Random

/** The MisraGries heavy-hitters aggregate: the superset guarantee
  * (every item with frequency > N/(k+1) survives) and the estimate
  * error bound, exercised through Spark's partial/merge path on a
  * skewed synthetic stream; plus the q88 two-pass exact recount
  * against a brute-force frequency count.
  */
class FrequencySpec extends SparkSpec {
  import spark.implicits._

  test("MG summary keeps every item above N/(k+1), estimates within bound") {
    val k = 32
    // zipf-ish stream over a 2000-item vocabulary: vastly more
    // distinct items than counters, so eviction and the merge
    // subtraction rule both fire
    val rnd = new Random(7)
    val items = (1 to 60000).map { _ =>
      val r = rnd.nextDouble()
      val id =
        if (r < 0.45) rnd.nextInt(5)            // 5 heavy items
        else if (r < 0.65) 5 + rnd.nextInt(45)  // mid tier
        else 50 + rnd.nextInt(1950)             // long tail
      s"item_$id"
    }
    val n = items.size.toLong
    val exact: Map[String, Long] =
      items.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }

    val est = items.toDF("t").repartition(13)
      .agg(heavy_hitters(col("t"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(est.size <= k)
    val bound = n / (k + 1)
    exact.foreach { case (item, c) =>
      if (c > bound) {
        assert(est.contains(item), s"$item (count $c > $bound) evicted")
      }
    }
    est.foreach { case (item, e) =>
      val c = exact(item)
      assert(e <= c, s"$item overestimated: $e > $c")
      assert(e >= c - bound, s"$item undercounted past the bound")
    }
  }

  test("MG summary is partitioning-invariant enough for the q88 recount") {
    // the SUMMARY itself may differ across merge orders; what must be
    // invariant is the two-pass result. Run q88's recount at 1 and 17
    // partitions and compare final rows.
    def recount(parts: Int): Seq[(String, Long)] = {
      val tok = Tables.documents(spark, sfTiny)
        .repartition(parts)
        .select(explode(split(col("text"), " ")).as("t"))
      val sketch = tok
        .agg(heavy_hitters(col("t"), 64).as("hh"), count(lit(1)).as("n"))
      val cand = sketch.select(col("n"), explode(col("hh")).as("e"))
        .select(col("n"), col("e.item").as("t"))
      tok.join(broadcast(cand), "t")
        .groupBy("t", "n").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(30L) > col("n"))
        .select(col("t"), col("cnt"))
        .orderBy(desc("cnt"), asc("t"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    val a = recount(1)
    assert(a.nonEmpty)
    assert(a == recount(17))
  }

  test("q88 equals the brute-force frequency threshold") {
    val got = text.TextAnalysis.heavyHitters.fn(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val tok = Tables.documents(spark, sfTiny)
      .select(explode(split(col("text"), " ")).as("t"))
    val n = tok.count()
    val want = tok.groupBy("t").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(30L) > lit(n))
      .orderBy(desc("cnt"), asc("t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("heavy_hitters is callable from SQL") {
    functions.Registry.register(spark)
    Tables.documents(spark, sfTiny).createOrReplaceTempView("docs_hh")
    val rows = spark.sql(
      """SELECT e.item, e.est FROM (
        |  SELECT explode(heavy_hitters(t, 8)) AS e FROM (
        |    SELECT explode(split(text, ' ')) AS t FROM docs_hh))
        |ORDER BY e.est DESC, e.item LIMIT 3""".stripMargin)
      .collect()
    assert(rows.length == 3 && rows.forall(_.getLong(1) > 0))
  }
}
