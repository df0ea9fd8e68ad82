package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Minhash sketch UNION as a custom `TypedImperativeAggregate` — the
  * sketch-aggregate tier of the extension ladder (the same shape HLL
  * and quantile sketches use). Input rows carry per-row minhash
  * signatures ([[MinHashSignature]], `array<bigint>` of length k);
  * the aggregate folds them with an element-wise MIN, which is exactly
  * the sketch of the UNION of the underlying sets (each slot is the
  * min of one hash family over the union).
  *
  * Why it matters at 100 TB: a corpus-level similarity profile
  * (vocabulary overlap between sources/languages/shards) reduces to
  * ONE narrow pass producing k·8 bytes per group, with partial
  * (map-side) aggregation for free — two sketches then estimate the
  * Jaccard of entire corpora via [[SignatureMatches]] without any
  * pairwise document work.
  */
case class MinHashUnion(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numHashes > 0 && numHashes <= 1024,
    "numHashes must be in 1..1024")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"minhash_union expects array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      // a signature of the wrong width would silently leave slots at
      // Long.MaxValue and inflate every cross-sketch agreement — fail
      // loudly instead
      require(arr.numElements() == numHashes,
        s"minhash_union(k=$numHashes) got a signature of length " +
          s"${arr.numElements()} — the minhash_sig k must match")
      var i = 0
      while (i < numHashes) {
        if (!arr.isNullAt(i)) {
          val x = arr.getLong(i)
          if (x < buf(i)) buf(i) = x
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): MinHashUnion =
    copy(child = c)
}

object SketchAggregates {
  /** Column API: `minhash_union(minhash_sig(toks, k), k)` per group. */
  def minhash_union(c: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashUnion(ColumnBridge.expression(c), k).toAggregateExpression())
}
