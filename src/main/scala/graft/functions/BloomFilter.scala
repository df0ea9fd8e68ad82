package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Shared bit math for the bloom build aggregate and the probe
  * expression — one definition so both sides always agree. Double
  * hashing in the Kirsch–Mitzenmacher style: bit_i = h1 + i·h2 mod m,
  * with h1 the key itself (already an xxhash64) and h2 an odd
  * remix, giving k independent-enough probes from one 64-bit hash.
  */
object BloomMath {
  // murmur3's 64-bit finalizer: raw keys can be structured (sequential
  // ids, arithmetic progressions), and feeding them unmixed into the
  // probe schedule makes the k probes CORRELATED across keys —
  // measured 1000x the theoretical FP rate on progression keys. One
  // avalanche mix first, then h1/h2 from its independent halves.
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  @inline private def bit(h1: Long, h2: Long, i: Int, numBits: Int): Int = {
    val g = (h1 + i.toLong * h2) % numBits
    (if (g < 0) g + numBits else g).toInt
  }

  def set(words: Array[Long], key: Long, k: Int): Unit = {
    val numBits = words.length * 64
    val h = fmix64(key)
    val h1 = h
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < k) {
      val b = bit(h1, h2, i, numBits)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  def mightContain(bytes: Array[Byte], key: Long, k: Int): Boolean = {
    val numBits = bytes.length * 8
    val h = fmix64(key)
    val h1 = h
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < k) {
      val b = bit(h1, h2, i, numBits)
      if ((bytes(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** true iff ANY element of `keys` might be in the filter — static so
    * the probe expression's codegen is a single call.
    */
  def containsAny(bytes: Array[Byte], keys: ArrayData, k: Int): Boolean = {
    val n = keys.numElements()
    var i = 0
    while (i < n) {
      if (!keys.isNullAt(i) && mightContain(bytes, keys.getLong(i), k))
        return true
      i += 1
    }
    false
  }
}

/** `bloom_build(keys, numBits, k)` — fold `array<bigint>` key rows
  * into one bloom filter (`binary`, numBits/8 bytes). The compact
  * carrier for anti-membership at scale: a held-out set of any shape
  * reduces to a fixed-size bit array that BROADCASTS, so probing 100
  * TB needs no join or shuffle at all — the same trade Spark's own
  * runtime-filter blooms make. False positives only (rate set by
  * numBits vs distinct keys), never false negatives — the safe
  * direction for decontamination, where an extra dropped doc is
  * cheap and a leaked benchmark line is not.
  */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashFns: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 30),
    "bloom_build: numBits must be a multiple of 64 in 64..2^30")
  require(numHashFns >= 1 && numHashFns <= 16,
    "bloom_build: numHashFns must be in 1..16")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_build expects array<bigint> keys, got ${other.sql}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) BloomMath.set(buf, arr.getLong(i), numHashFns)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    // little-endian within each word, so the byte-addressed probe in
    // BloomMath.mightContain sees bit b at byte b/8 bit b%8
    val out = new Array[Byte](buf.length * 8)
    var w = 0
    while (w < buf.length) {
      var b = 0
      while (b < 8) {
        out(w * 8 + b) = ((buf(w) >>> (b * 8)) & 0xff).toByte
        b += 1
      }
      w += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    var w = 0
    while (w < out.length) {
      var acc = 0L
      var b = 7
      while (b >= 0) {
        acc = (acc << 8) | (bytes(w * 8 + b) & 0xffL)
        b -= 1
      }
      out(w) = acc
      w += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BloomBuild =
    copy(child = c)
}

/** `bloom_contains_any(bloom, keys, k)` — true iff any key of the
  * `array<bigint>` might be in the filter. Codegen'd to one static
  * call so the probe stays inside whole-stage codegen; per-doc work
  * is |keys|·k bit tests, no allocation.
  */
case class BloomContainsAny(left: Expression, right: Expression,
    numHashFns: Int) extends BinaryExpression {

  override def prettyName: String = "bloom_contains_any"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains_any expects (binary, array<bigint>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(bloom: Any, keys: Any): Any =
    BloomMath.containsAny(bloom.asInstanceOf[Array[Byte]],
      keys.asInstanceOf[ArrayData], numHashFns)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, keys) => {
      s"${ev.value} = graft.functions.BloomMath.containsAny(" +
        s"$bloom, $keys, $numHashFns);"
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomContainsAny =
    copy(left = l, right = r)
}

object BloomFilters {
  /** Column API: fold array<long> key rows into one broadcastable
    * bloom. Size for the expected distinct-key count n at false-
    * positive rate p with m ≈ -n·ln p / ln²2 bits, k ≈ (m/n)·ln 2.
    */
  def bloom_build(keys: Column, numBits: Int, k: Int): Column =
    ColumnBridge.column(
      BloomBuild(ColumnBridge.expression(keys), numBits, k)
        .toAggregateExpression())

  def bloom_contains_any(bloom: Column, keys: Column, k: Int): Column =
    ColumnBridge.column(BloomContainsAny(
      ColumnBridge.expression(bloom), ColumnBridge.expression(keys), k))
}
