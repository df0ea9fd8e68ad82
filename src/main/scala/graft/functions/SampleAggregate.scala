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
import org.apache.spark.unsafe.types.UTF8String

/** Uniform per-group k-sampling as a bounded `TypedImperativeAggregate`:
  * keep the k rows with the SMALLEST sort key (priority), ties broken
  * by id. With a hash priority (e.g. `md5(id)`) this is bottom-k
  * priority sampling — a uniform sample without replacement that is
  * deterministic, order-independent, and exactly mergeable (merge =
  * union, keep k smallest), unlike a classic randomized reservoir
  * whose merge needs weighted redraws and whose output depends on
  * partitioning.
  *
  * Scale shape: the window spelling (`row_number() OVER (PARTITION BY
  * g ORDER BY md5(id))`, q54) shuffles EVERY row of every group to
  * its reducer before ranking; this aggregate ships ≤k entries per
  * (partition, group) — the same partial-aggregation win as
  * [[TopKAgg]] vs the q11 window. Determinism also makes it fully
  * oracle-able: the q108 query hash-matches a DuckDB rank window.
  *
  * Output: `array<struct<key, id>>` ascending by (key, id) —
  * posexplode-ready, position = sample rank.
  */
case class BottomKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKAgg.Buf]
  with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), "k must be in 1..2^20")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"bottom_k_agg expects (string, bigint), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BottomKAgg.Buf =
    new BottomKAgg.Buf(k)

  override def update(buf: BottomKAgg.Buf, input: InternalRow)
      : BottomKAgg.Buf = {
    val keyV = left.eval(input)
    val idV = right.eval(input)
    if (keyV != null && idV != null) {
      // eval may hand back a buffer-backed UTF8String — clone before
      // it escapes the row
      buf.insert(keyV.asInstanceOf[UTF8String].clone(),
        idV.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BottomKAgg.Buf, other: BottomKAgg.Buf)
      : BottomKAgg.Buf = {
    var i = 0
    while (i < other.n) {
      buf.insert(other.keys(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: BottomKAgg.Buf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(
        Array[Any](buf.keys(i), buf.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: BottomKAgg.Buf): Array[Byte] = {
    var size = 4
    var i = 0
    while (i < buf.n) { size += 4 + buf.keys(i).numBytes + 8; i += 1 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.n)
    i = 0
    while (i < buf.n) {
      val kb = buf.keys(i).getBytes
      bb.putInt(kb.length); bb.put(kb); bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BottomKAgg.Buf(k)
    buf.n = n
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.keys(i) = UTF8String.fromBytes(kb)
      buf.ids(i) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BottomKAgg = copy(left = l, right = r)

  override def prettyName: String = "bottom_k_agg"
}

object BottomKAgg {
  /** Mutable bounded bottom-K buffer: parallel arrays kept sorted
    * ascending by (key, id), insertion-sort insert. UTF8String binary
    * order equals lexicographic order for the ASCII hex keys this
    * serves, which is also DuckDB's VARCHAR order — the property the
    * q108 oracle parity rests on.
    */
  final class Buf(val k: Int) {
    var n: Int = 0
    val keys: Array[UTF8String] = new Array[UTF8String](k)
    val ids: Array[Long] = new Array[Long](k)

    private def beats(key: UTF8String, id: Long, i: Int): Boolean = {
      val c = key.compareTo(keys(i))
      c < 0 || (c == 0 && id < ids(i))
    }

    def insert(key: UTF8String, id: Long): Unit = {
      if (n == k && !beats(key, id, n - 1)) return
      var pos = if (n == k) n - 1 else n
      while (pos > 0 && beats(key, id, pos - 1)) pos -= 1
      var i = math.min(n, k - 1)
      while (i > pos) {
        keys(i) = keys(i - 1); ids(i) = ids(i - 1)
        i -= 1
      }
      keys(pos) = key; ids(pos) = id
      if (n < k) n += 1
    }
  }

  /** Column API: per-group `array<struct<key, id>>` of the k rows
    * with the smallest (key, id).
    */
  def bottom_k_agg(key: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKAgg(ColumnBridge.expression(key), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
