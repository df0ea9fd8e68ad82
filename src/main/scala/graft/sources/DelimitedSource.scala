package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S2 — delimited text ingestion matching the reference's loaders
  * (`DataLoader.scala:38-50`), rebuilt on the schema'd CSV reader so
  * parsing is codegen'd and malformed rows are policy, not crashes.
  *
  *   - `products`: `^`-separated, 7 fields, keeping 0,1,4,5,6
  *     (`DataLoader.scala:40-43`); `|`-joined categories/tags become
  *     real `array<string>` columns.
  *   - `ratings`: comma-separated `userId,productId,score,timestamp`
  *     (`DataLoader.scala:47-50`); epoch-seconds Int becomes a real
  *     TimestampType column alongside the raw int.
  */
object DelimitedSource {

  val productsSchema: StructType = StructType(Seq(
    StructField("productId", IntegerType),
    StructField("name", StringType),
    StructField("categoryIds", StringType),   // skipped downstream
    StructField("amazonId", StringType),      // skipped downstream
    StructField("imageUrl", StringType),
    StructField("categories", StringType),
    StructField("tags", StringType)))

  val ratingsSchema: StructType = StructType(Seq(
    StructField("userId", IntegerType),
    StructField("productId", IntegerType),
    StructField("score", DoubleType),
    StructField("timestamp", IntegerType)))

  def products(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(productsSchema)
      .option("sep", "^").option("mode", "PERMISSIVE")
      .csv(path)
      .select(
        col("productId"),
        trim(col("name")).as("name"),
        trim(col("imageUrl")).as("imageUrl"),
        split(col("categories"), "\\|").as("categories"),
        split(col("tags"), "\\|").as("tags"))

  def ratings(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ratingsSchema)
      .option("sep", ",").option("mode", "PERMISSIVE")
      .csv(path)
      .withColumn("ts", timestamp_seconds(col("timestamp")))
}
