package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs — one per suite (lazy), UTC,
  * small shuffle parallelism.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    Scale.sessionBuilder(getClass.getSimpleName, "4")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${java.util.UUID.randomUUID()}")
      .getOrCreate()

  val sfTiny = "/root/testdata/sf0.001"
  val sfSmall = "/root/testdata/sf0.01"
}
