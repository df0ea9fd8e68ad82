package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable streaming quantile sketch state: levelled compaction in
  * the KLL style (Karnin/Lang/Liberty, FOCS 2016 — public paper), with
  * the uniform per-level capacity simplification of Manku/Rajagopalan/
  * Lindsay. Level `i` holds items each standing for `2^i` original
  * values; a full level is sorted and every other element promoted one
  * level up (random offset, so the kept half is an unbiased sample of
  * the discarded pairs' ranks).
  *
  * State is O(k · log(n/k)) doubles regardless of input size, updates
  * are O(1) amortized, and merge is level-wise concatenation — exactly
  * the shape a map-side-partial aggregate needs at 100 TB: every
  * executor folds its partition into a few KB, and only sketches cross
  * the shuffle. The exact-quantile spelling (q55) sorts whole groups on
  * single reducers; this is the scale tier of the same query.
  */
final class KllBuffer(val k: Int) {

  /** total input weight folded into this sketch */
  var n: Long = 0L

  /** levels(i) holds items of weight 2^i, in arbitrary order */
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(new ArrayBuffer[Double](k))

  // xorshift64 — a private coin per buffer. KLL's unbiasedness
  // argument assumes compaction coins are independent ACROSS buffers:
  // a constant seed would give every partition/group-side buffer the
  // identical offset sequence, correlating first compactions into a
  // small systematic rank bias. So the seed mixes in the first
  // inserted value (fmix64-style finalizer) — per-buffer entropy that
  // stays deterministic for a given partition's data, so replays and
  // resumes reproduce bit-identical sketches.
  private var rng: Long = 0x9e3779b97f4a7c15L
  private var seeded: Boolean = false
  private def nextBit(): Boolean = {
    rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17
    (rng & 1L) == 1L
  }

  /** Re-derive the coin seed after deserialization (the wire format
    * carries only data, not rng state) — same per-buffer-entropy
    * guarantee, still deterministic for a given sketch content.
    */
  private[functions] def reseed(bits: Long): Unit = mixSeed(bits)

  private def mixSeed(bits: Long): Unit = {
    var h = rng ^ bits
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    rng = h | 1L // never zero: xorshift's absorbing state
    seeded = true
  }

  def insert(x: Double): Unit = {
    if (!seeded) mixSeed(java.lang.Double.doubleToLongBits(x))
    levels(0) += x
    n += 1
    if (levels(0).length >= k) compact(0)
  }

  /** Sort level `i`, promote alternate elements to level `i+1`.
    * An odd straggler (merge can leave odd counts) stays at level `i`
    * with its weight intact — standard KLL practice, so total weight
    * is conserved exactly. Cascades while the next level overflows.
    */
  private def compact(i: Int): Unit = {
    val lvl = levels(i)
    var straggler = 0.0d
    var hasStraggler = false
    if (lvl.length % 2 == 1) {
      straggler = lvl.remove(lvl.length - 1)
      hasStraggler = true
    }
    val sorted = lvl.toArray
    java.util.Arrays.sort(sorted)
    lvl.clear()
    if (hasStraggler) lvl += straggler
    if (i + 1 >= levels.length) levels += new ArrayBuffer[Double](k)
    val up = levels(i + 1)
    var j = if (nextBit()) 1 else 0
    while (j < sorted.length) {
      up += sorted(j)
      j += 2
    }
    if (up.length >= k) compact(i + 1)
  }

  def mergeWith(o: KllBuffer): Unit = {
    n += o.n
    while (levels.length < o.levels.length)
      levels += new ArrayBuffer[Double](k)
    var i = 0
    while (i < o.levels.length) {
      levels(i) ++= o.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.length) {
      if (levels(i).length >= k) compact(i)
      i += 1
    }
  }

  /** Smallest retained value whose cumulative weight reaches rank
    * `ceil(p·n)` (inclusive rank, the `approx_percentile` convention —
    * an actually-observed value, not an interpolation).
    */
  def quantile(p: Double): Double = {
    var m = 0
    var i = 0
    while (i < levels.length) { m += levels(i).length; i += 1 }
    val vs = new Array[Double](m)
    val ws = new Array[Long](m)
    var at = 0
    i = 0
    while (i < levels.length) {
      val w = 1L << i
      val lvl = levels(i)
      var j = 0
      while (j < lvl.length) {
        vs(at) = lvl(j); ws(at) = w; at += 1; j += 1
      }
      i += 1
    }
    // indirect sort by value
    val idx = (0 until m).sortBy(i => vs(i))
    val target = math.max(1L, math.ceil(p * n).toLong)
    var cum = 0L
    var r = 0
    while (r < m) {
      cum += ws(idx(r))
      if (cum >= target) return vs(idx(r))
      r += 1
    }
    vs(idx(m - 1))
  }

  def isEmpty: Boolean = n == 0L
}

/** `kll_quantiles(x, k, probs...)` — grouped approximate quantiles via
  * the [[KllBuffer]] sketch. Returns `array<double>`, one estimate per
  * requested probability; null for empty groups. Rank error shrinks
  * as O(log(n/k)/k) — QuantileSpec measures it against the exact sort.
  */
case class KllQuantiles(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65536 && k % 2 == 0,
    "kll_quantiles: k must be even and in 8..65536")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "kll_quantiles: probabilities must be in [0, 1]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_quantiles expects double, got ${other.sql} — cast first")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: KllBuffer): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(probs.map(buf.quantile).toArray)

  override def serialize(buf: KllBuffer): Array[Byte] = {
    var bytes = 4 + 8 + 4
    buf.levels.foreach(l => bytes += 4 + 8 * l.length)
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.k)
    bb.putLong(buf.n)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { l =>
      bb.putInt(l.length)
      var i = 0
      while (i < l.length) { bb.putDouble(l(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val bufK = bb.getInt()
    val out = new KllBuffer(bufK)
    out.n = bb.getLong()
    val nLevels = bb.getInt()
    var i = 0
    while (i < nLevels) {
      if (i >= out.levels.length)
        out.levels += new ArrayBuffer[Double](bufK)
      val len = bb.getInt()
      val lvl = out.levels(i)
      var j = 0
      while (j < len) { lvl += bb.getDouble(); j += 1 }
      i += 1
    }
    if (out.n > 0) {
      val first = out.levels.find(_.nonEmpty)
        .map(l => java.lang.Double.doubleToLongBits(l.head)).getOrElse(0L)
      out.reseed(out.n ^ first)
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
}

object QuantileSketch {
  /** Column API: `kll_quantiles(x, k, Seq(0.5, 0.9, ...))` per group. */
  def kll_quantiles(c: Column, k: Int, probs: Seq[Double]): Column =
    ColumnBridge.column(
      KllQuantiles(ColumnBridge.expression(c.cast("double")), k, probs)
        .toAggregateExpression())
}
