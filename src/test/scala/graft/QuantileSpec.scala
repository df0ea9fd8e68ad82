package graft

import graft.functions.QuantileSketch.kll_quantiles
import org.apache.spark.sql.functions._

/** The KLL quantile sketch aggregate: exactness below capacity, rank
  * error under compaction and under repartitioning (merge path), weight
  * conservation, SQL registration, and the q66 query against the exact
  * sort.
  */
class QuantileSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.25, 0.5, 0.75, 0.95)

  /** fraction of `values` at or below `est` — the estimate's true rank */
  private def rankOf(values: Array[Double], est: Double): Double =
    values.count(_ <= est).toDouble / values.length

  test("below capacity the sketch is exact (inclusive-rank quantile)") {
    // n = 100 < k = 256: no compaction ever fires, so the sketch holds
    // every value and must return the exact rank-ceil(p*n) statistic
    val n = 100
    val vals = (1 to n).map(i => (i * 37 % n).toDouble + 1)
    val got = vals.toDF("x")
      .agg(kll_quantiles(col("x"), 256, probs).as("q"))
      .head.getSeq[Double](0)
    val sorted = vals.sorted
    val want = probs.map(p =>
      sorted(math.max(1, math.ceil(p * n).toInt) - 1))
    assert(got == want, s"got $got want $want")
  }

  test("rank error stays bounded under compaction and repartitioning") {
    // 200k skewed values (exponential-ish via pow) — far past capacity,
    // so both the update compaction path and, at 16 partitions, the
    // serialize/merge path are exercised. KLL k=256 keeps rank error
    // well under 2.5% at this n; partition count must not change that.
    val vals = (1 to 200000)
      .map(i => math.pow(1.0 + (i * 2654435761L % 1000003) / 1000003.0, 8))
      .toArray
    for (parts <- Seq(1, 16)) {
      val ests = vals.toSeq.toDF("x").repartition(parts)
        .agg(kll_quantiles(col("x"), 256, probs).as("q"))
        .head.getSeq[Double](0)
      probs.zip(ests).foreach { case (p, est) =>
        val r = rankOf(vals, est)
        assert(math.abs(r - p) <= 0.025,
          s"parts=$parts p=$p est=$est trueRank=$r")
      }
    }
  }

  test("empty groups yield null, null inputs are skipped") {
    val df = Seq((1, Some(5.0)), (1, None), (2, None))
      .toDF("g", "x")
      .groupBy("g").agg(kll_quantiles(col("x"), 64, Seq(0.5)).as("q"))
    val rows = df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1))
      .toMap
    assert(rows(1) == Seq(5.0))
    assert(rows(2) == null) // all-null group = empty sketch
  }

  test("kll_quantiles is SQL-registered") {
    graft.functions.Registry.register(spark)
    spark.range(1, 201).selectExpr("CAST(id AS DOUBLE) AS x")
      .createOrReplaceTempView("kll_t")
    val got = spark
      .sql("SELECT kll_quantiles(x, 256, 0.5, 0.9) AS q FROM kll_t")
      .head.getSeq[Double](0)
    assert(got == Seq(100.0, 180.0), got.toString) // n<k: exact
  }

  test("q66 estimates track the exact grouped quantiles") {
    // the raw KLL tier (the registered q66 serves the exact regime
    // at this scale)
    val est = ops.Statistics.kllQuantileRows(spark, sfSmall).collect()
    assert(est.nonEmpty)
    val groups = Tables.lineitem(spark, sfSmall)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect()
      .groupBy(_.getString(0)).map { case (g, rs) =>
        g -> rs.map(_.getDouble(1))
      }
    est.foreach { r =>
      val vals = groups(r.getString(0))
      probs.zipWithIndex.foreach { case (p, i) =>
        val rank = rankOf(vals, r.getDouble(i + 1))
        assert(math.abs(rank - p) <= 0.025,
          s"${r.getString(0)} p=$p trueRank=$rank")
      }
    }
  }

  test("sketch-derived p75 threshold is a drop-in for q95's exact gate") {
    // the q95 scaladoc contract: swapping the exact-window threshold
    // CTE for kll_quantiles keeps the kept-set within the sketch's
    // rank error (2.5% of each language's docs)
    // all-docs quality (q40's formula), NOT the gated q95 output —
    // a low sketch threshold must be able to keep docs the exact
    // gate dropped
    val stop = text.TextAnalysis.stopwords
    val t = split(col("text"), " ")
    val allQ = Tables.documents(spark, sfSmall)
      .select(col("lang"),
        (lit(0.5) * (size(filter(t, x => x.isin(stop: _*))).cast("double")
          / size(t)) +
          lit(0.5) * least(size(t).cast("double") / 100.0, lit(1.0)))
          .as("quality"))
      .cache()
    val sketchThr = allQ.groupBy("lang")
      .agg(kll_quantiles(col("quality"), 256, Seq(0.75)).as("thr"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    val full = allQ.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactKept = text.TextAnalysis.qualityGate.fn(spark, sfSmall)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sketchThr.foreach { case (lang, thr) =>
      val keptBySketch = allQ.filter(col("lang") === lang)
        .filter(col("quality") >= thr).count()
      // both gates keep ~25%; their disagreement is bounded by the
      // sketch rank error (2.5% of the language's corpus) plus ties
      val diff = math.abs(keptBySketch - exactKept(lang)).toDouble
      assert(diff <= math.max(0.025 * full(lang), 2.0),
        s"$lang: sketch gate kept $keptBySketch vs exact ${exactKept(lang)}")
    }
    allQ.unpersist()
  }
}
