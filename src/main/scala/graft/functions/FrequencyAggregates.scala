package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a `TypedImperativeAggregate`:
  * at most `k` counters of state per group, map-side partials, and the
  * mergeable-summaries guarantee (Agarwal et al., PODS'12) that after
  * any tree of merges every item with true frequency > N/(k+1) is
  * present and each estimate undercounts by at most N/(k+1).
  *
  * Why it matters at 100 TB: exact term frequency over a corpus whose
  * key space is itself huge (token n-grams, URLs, entity mentions)
  * shuffles a vocabulary-sized hash aggregate; this pass carries k
  * counters per partition instead, and the exact answer for the heavy
  * tail is recovered with a second pass restricted to the ≤ k
  * surviving candidates (see q88 — the two-pass exact heavy-hitters
  * pattern, oracle-checkable because the MG superset guarantee makes
  * the recount exact).
  *
  * Reference ground: the reference's popularity statistics
  * (StatisticsRecommender.scala:54-55) are exact group-counts over a
  * small key space; this is the bounded-state spelling the same
  * statistic needs once the key space stops fitting a shuffle.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= 65536, "k must be in 1..65536")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"heavy_hitters expects string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None =>
          if (buf.size < k) {
            // eval may hand back a buffer-backed UTF8String — copy
            // before it escapes the row
            buf.update(s.clone(), 1L)
          } else {
            // classic MG decrement-all step. O(k) per miss while the
            // buffer stays full (counters above 1 survive decrement,
            // not evicted): amortization bounds total decrements of
            // any single counter, NOT per-row cost, so a mostly-
            // distinct stream worst-cases at O(n·k). Fine at the
            // k≤1024 the queries use; a lazy global-offset + min-heap
            // is the known rewrite if k=65536-scale ever matters.
            val dead = mutable.ArrayBuffer.empty[UTF8String]
            buf.mapValuesInPlace { (_, c) => c - 1 }
            buf.foreach { case (key, c) => if (c <= 0) dead += key }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // keep the top k by subtracting the (k+1)-th largest count from
      // every counter — the merge rule that preserves the N/(k+1)
      // error bound across arbitrary merge trees
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace { (_, c) => c - m }
      buf.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        new GenericInternalRow(Array[Any](item, est)): InternalRow
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(
      buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong
      buf.update(UTF8String.fromBytes(b), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): MisraGries =
    copy(child = c)
}

object FrequencyAggregates {
  /** Column API: `heavy_hitters(term, k)` per group — array of
    * (item, est) sorted by estimate descending, at most k entries.
    */
  def heavy_hitters(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())
}
