package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded per-group top-K as a `TypedImperativeAggregate` — the
  * partial-aggregation spelling of the reference's `groupByKey` +
  * in-memory `sortWith(...).take(20)` (`OfflineRecommender.scala:
  * 77-84`). Each map-side partial keeps at most K `(id, score)`
  * entries, so the shuffle carries ≤K rows per (partition, group)
  * instead of every row of every group — on a hot group at 100 TB
  * that difference is the job.
  *
  * Unlike the typed-`Aggregator` spelling ([[graft.ops.TopK
  * .TopKAggregator]]), the buffer is primitive arrays with NO row
  * encoder in the loop: the encoder ser/de per input row made the
  * typed spelling ~4× slower than a window at moderate scale, while
  * this one operates directly on `InternalRow` values like any
  * built-in aggregate.
  *
  * Ranking: score DESC, id ASC (ties). Output: `array<struct<id,
  * score>>` in rank order, explode-ready.
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), "k must be in 1..2^20")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"top_k_agg expects (bigint, double), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val idV = left.eval(input)
    val scoreV = right.eval(input)
    if (idV != null && scoreV != null) {
      buf.insert(idV.asInstanceOf[Long], scoreV.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKAgg.Buf, other: TopKAgg.Buf): TopKAgg.Buf = {
    var i = 0
    while (i < other.n) {
      buf.insert(other.ids(i), other.scores(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(
        Array[Any](buf.ids(i), buf.scores(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buf(k)
    buf.n = n
    var i = 0
    while (i < n) {
      buf.ids(i) = bb.getLong; buf.scores(i) = bb.getDouble
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKAgg = copy(left = l, right = r)

  override def prettyName: String = "top_k_agg"
}

object TopKAgg {
  /** Mutable bounded top-K buffer: parallel primitive arrays kept
    * sorted best→worst (score DESC, id ASC), insertion-sort insert.
    * K is small (a recs list, not a percentile sketch), so shifting
    * beats a heap's constant factors and keeps eval allocation-free.
    */
  final class Buf(val k: Int) {
    var n: Int = 0
    val ids: Array[Long] = new Array[Long](k)
    val scores: Array[Double] = new Array[Double](k)

    private def beats(score: Double, id: Long, i: Int): Boolean =
      score > scores(i) || (score == scores(i) && id < ids(i))

    def insert(id: Long, score: Double): Unit = {
      // NaN never participates: `beats` is comparison-based, so a NaN
      // score entering a non-full buffer would stick at the tail as an
      // unbeatable slot (every comparison against it is false) and
      // silently reject genuine neighbors once full. Reachable via NaN
      // embedding values upstream of any sim function that doesn't map
      // them away — reject at the door instead of ordering them.
      if (score != score) return
      if (n == k && !beats(score, id, n - 1)) return
      // find insertion point (first slot this entry beats)
      var pos = if (n == k) n - 1 else n
      while (pos > 0 && beats(score, id, pos - 1)) pos -= 1
      // shift worse entries down (dropping the last when full)
      var i = math.min(n, k - 1)
      while (i > pos) {
        ids(i) = ids(i - 1); scores(i) = scores(i - 1)
        i -= 1
      }
      ids(pos) = id; scores(pos) = score
      if (n < k) n += 1
    }
  }

  /** Column API: per-group `array<struct<id, score>>` of the top `k`
    * rows by score DESC (id ASC on ties).
    */
  def top_k_agg(id: Column, score: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(id), ColumnBridge.expression(score), k)
        .toAggregateExpression())
}
