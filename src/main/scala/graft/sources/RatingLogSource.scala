package graft.sources

import java.io.BufferedReader
import java.nio.charset.StandardCharsets
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for the reference's rating-log wire format —
  * the lines its Kafka Streams topology filters and forwards
  * (`LogProcess.java:17-25`; payload shape `UID|MID|SCORE|TIMESTAMP`,
  * `StreamingRecommender.scala:110-113`):
  *
  *   `...anything... PRODUCT_RATING_PREFIX:4867|8195|4.0|1395676800`
  *
  * `spark.read.format("ratinglog").load(path)` yields a typed
  * `(userId int, productId int, score double, ts timestamp)` table;
  * non-rating lines are skipped scan-side.
  *
  * V2 integration done properly for scale:
  *   - one `InputPartition` per file → parallelism is the file count
  *     (log shippers cut files small; a splitting reader would add
  *     line-boundary seek logic for no practical gain);
  *   - `SupportsPushDownRequiredColumns`: the scan materializes only
  *     requested fields — `select(score)` never allocates the rest
  *     (the prune reaches `readSchema`, visible in the plan);
  *   - parse + filter happen inside the partition reader, so
  *     malformed and non-rating lines cost one regex-free scan and
  *     are never shipped.
  */
object RatingLog {
  val Prefix = "PRODUCT_RATING_PREFIX:"

  val schema: StructType = StructType(Seq(
    StructField("userId", IntegerType, nullable = false),
    StructField("productId", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  /** `(userId, productId, score, epochMicros)` or None for
    * non-rating / malformed lines.
    */
  def parse(line: String): Option[(Int, Int, Double, Long)] = {
    val at = line.indexOf(Prefix)
    if (at < 0) None
    else {
      val f = line.substring(at + Prefix.length).trim.split("\\|")
      if (f.length != 4) None
      else try Some((f(0).trim.toInt, f(1).trim.toInt, f(2).trim.toDouble,
        f(3).trim.toLong * 1000000L))
      catch { case _: NumberFormatException => None }
    }
  }
}

class RatingLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "ratinglog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RatingLog.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RatingLogTable(properties.get("path"))
}

class RatingLogTable(path: String) extends Table with SupportsRead {
  require(path != null, "ratinglog requires a path: .load(path)")
  override def name(): String = s"ratinglog($path)"
  override def schema(): StructType = RatingLog.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RatingLogScanBuilder(path)
}

class RatingLogScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = RatingLog.schema
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept simple comparisons on the four columns; they evaluate in
    * the partition reader BEFORE an InternalRow is built, so filtered
    * rows cost a parse and nothing more. Everything else stays with
    * Spark (returned as residual).
    */
  override def pushFilters(filters: Array[sources.Filter])
      : Array[sources.Filter] = {
    val (supported, residual) =
      filters.partition(RatingLogFilters.supported)
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan = new RatingLogScan(path, required, pushed)
}

/** Driver/executor-shared evaluation of pushed-down filters against a
  * parsed `(userId, productId, score, tsMicros)` record.
  */
object RatingLogFilters extends Serializable {
  private val cols = Set("userId", "productId", "score", "ts")

  def supported(f: sources.Filter): Boolean = f match {
    case sources.EqualTo(a, _) => cols(a)
    case sources.GreaterThan(a, _) => cols(a)
    case sources.GreaterThanOrEqual(a, _) => cols(a)
    case sources.LessThan(a, _) => cols(a)
    case sources.LessThanOrEqual(a, _) => cols(a)
    case sources.In(a, _) => cols(a)
    case _ => false
  }

  private def valueOf(rec: (Int, Int, Double, Long), col: String): Double =
    col match {
      case "userId" => rec._1.toDouble
      case "productId" => rec._2.toDouble
      case "score" => rec._3
      case "ts" => rec._4.toDouble
    }

  private def asDouble(v: Any): Double = v match {
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case d: Double => d
    case f: Float => f.toDouble
    case t: java.sql.Timestamp =>
      (t.getTime / 1000 * 1000000L + t.getNanos / 1000).toDouble
    case i: java.time.Instant =>
      (i.getEpochSecond * 1000000L + i.getNano / 1000).toDouble
    case other => other.toString.toDouble
  }

  def eval(f: sources.Filter, rec: (Int, Int, Double, Long)): Boolean =
    f match {
      case sources.EqualTo(a, v) => valueOf(rec, a) == asDouble(v)
      case sources.GreaterThan(a, v) => valueOf(rec, a) > asDouble(v)
      case sources.GreaterThanOrEqual(a, v) => valueOf(rec, a) >= asDouble(v)
      case sources.LessThan(a, v) => valueOf(rec, a) < asDouble(v)
      case sources.LessThanOrEqual(a, v) => valueOf(rec, a) <= asDouble(v)
      case sources.In(a, vs) => vs.exists(v => valueOf(rec, a) == asDouble(v))
      case _ => true
    }
}

class RatingLogScan(path: String, required: StructType,
    pushed: Array[sources.Filter]) extends Scan with Batch {
  // The SESSION's Hadoop conf, captured at scan build on the driver
  // and shipped to executors: a bare `new Configuration()` would drop
  // configured filesystem settings/credentials (s3a keys, custom
  // hdfs), breaking any non-local path.
  private val hadoopConf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ratinglog $path, PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf.value)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
      else Array(st)
    }
    files.map(f => RatingLogPartition(f.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RatingLogReaderFactory(required.fieldNames, pushed, hadoopConf)
}

case class RatingLogPartition(file: String) extends InputPartition

class RatingLogReaderFactory(fields: Array[String],
    pushed: Array[sources.Filter], hadoopConf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new RatingLogReader(p.asInstanceOf[RatingLogPartition].file, fields,
      pushed, hadoopConf)
}

class RatingLogReader(file: String, fields: Array[String],
    pushed: Array[sources.Filter], hadoopConf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val in: BufferedReader = {
    val p = new Path(file)
    val fs = p.getFileSystem(hadoopConf.value)
    new BufferedReader(
      new java.io.InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      RatingLog.parse(line)
          .filter(rec => pushed.forall(RatingLogFilters.eval(_, rec))) match {
        case Some((u, m, s, tsMicros)) =>
          current = new GenericInternalRow(fields.map[Any] {
            case "userId" => u
            case "productId" => m
            case "score" => s
            case "ts" => tsMicros
          })
          return true
        case None => line = in.readLine()
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
