package graft

import java.nio.file.Files

import graft.sources.RatingLog
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class RatingLogSourceSpec extends SparkSpec {

  private def writeLogs(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("ratinglog").toFile
    val f = new java.io.File(dir, "part-0.log")
    val w = new java.io.PrintWriter(f)
    lines.foreach(w.println)
    w.close()
    dir.getAbsolutePath
  }

  test("ratinglog DSv2 source parses rating lines and skips the rest") {
    val dir = writeLogs(Seq(
      "2024-01-01 INFO app PRODUCT_RATING_PREFIX:7|42|4.5|1395676800",
      "2024-01-01 INFO unrelated line",
      "PRODUCT_RATING_PREFIX:8|43|2.0|1395676900",
      "PRODUCT_RATING_PREFIX:malformed|x",
      "PRODUCT_RATING_PREFIX:9|44|oops|1395676900"))
    val df = spark.read.format("ratinglog").load(dir)
    assert(df.schema == RatingLog.schema)
    val rows = df.orderBy("userId").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 7 && rows(0).getInt(1) == 42 &&
      rows(0).getDouble(2) == 4.5)
    assert(rows(0).getTimestamp(3).getTime == 1395676800L * 1000)
    assert(rows(1).getInt(0) == 8)
  }

  test("ratinglog column pruning reaches the scan") {
    val dir = writeLogs(Seq("PRODUCT_RATING_PREFIX:1|2|3.0|1395676800"))
    val df = spark.read.format("ratinglog").load(dir).select("score")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.output.map(_.name)
    }
    assert(scans == Seq(Seq("score")), scans.toString)
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(3.0))
  }

  test("ratinglog filter pushdown reaches the scan and filters rows") {
    val dir = writeLogs(Seq(
      "PRODUCT_RATING_PREFIX:1|10|4.5|1395676800",
      "PRODUCT_RATING_PREFIX:2|11|2.0|1395676900",
      "PRODUCT_RATING_PREFIX:3|12|5.0|1395677000"))
    val df = spark.read.format("ratinglog").load(dir)
      .filter(col("score") > 3.0 && col("userId") <= 2)
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getInt(0) == 1)
    // both predicates supported -> pushed; no residual Filter node needed
    // beyond Spark's own re-check; scan description carries them
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters: [GreaterThan(score,3.0)"), desc)
  }

  test("ratinglog parallelism is the file count") {
    val dir = Files.createTempDirectory("ratinglogs").toFile
    (0 until 3).foreach { i =>
      val w = new java.io.PrintWriter(new java.io.File(dir, s"part-$i.log"))
      w.println(s"PRODUCT_RATING_PREFIX:$i|$i|1.0|1395676800")
      w.close()
    }
    val df = spark.read.format("ratinglog").load(dir.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 3)
  }

  test("ratinglog agrees with the streaming extractRatings operator") {
    val lines = Seq(
      "x PRODUCT_RATING_PREFIX:7|42|4.5|1395676800",
      "noise", "PRODUCT_RATING_PREFIX:8|43|2.0|1395676900")
    val dir = writeLogs(lines)
    import spark.implicits._
    val viaSource = spark.read.format("ratinglog").load(dir)
      .orderBy("userId").collect().toSeq
    val viaOperator = streaming.Rescoring.extractRatings(lines.toDF("value"))
      .orderBy("userId").collect().toSeq
    assert(viaSource.map(_.toString) == viaOperator.map(_.toString))
  }
}
