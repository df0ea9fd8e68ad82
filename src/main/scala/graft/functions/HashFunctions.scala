package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar 2002, "Similarity
  * estimation techniques from rounding algorithms"): every token is
  * xxhashed; bit j of the signature is set iff the sum over tokens of
  * ±1 (by token-hash bit j) is non-negative. Token sets with small
  * symmetric difference land at small Hamming distance, so near-dup
  * blocking becomes a groupBy on signature bands — no n² pass.
  *
  * One fused codegen'd pass per row (64 counters, one hash per
  * token); the higher-order-function equivalent would evaluate
  * 64×|tokens| interpreted lambdas per document.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt"); val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $cnt = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      $cnt[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($cnt[$j] >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** Random-hyperplane LSH signature (Charikar 2002 / SimHash for
  * cosine): bit j = sign(v · r_j) with r_j a Rademacher (±1) vector
  * derived from a seeded xxhash of (j, k) — fully deterministic, no
  * stored hyperplane matrix, so the signature computes streaming-side
  * and cluster-side identically. Vectors whose cosine is high collide
  * in signature buckets with high probability; bucketing on bands of
  * the signature replaces the O(n²) similarity join.
  */
case class HyperplaneSignature(child: Expression, nbits: Int, seed: Long)
    extends UnaryExpression {
  require(nbits > 0 && nbits <= 32, "nbits must be in 1..32")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<float>, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    var sig = 0
    var j = 0
    while (j < nbits) {
      var acc = 0.0
      var k = 0
      while (k < d) {
        val r = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(j.toLong * 65536L + k, seed)
        val sign = if ((r & 1L) == 1L) 1.0 else -1.0
        acc += arr.getFloat(k) * sign
        k += 1
      }
      if (acc >= 0) sig |= (1 << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j"); val k = ctx.freshName("k")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val r = ctx.freshName("r"); val sig = ctx.freshName("sig")
      s"""
         |int $d = $a.numElements();
         |int $sig = 0;
         |for (int $j = 0; $j < $nbits; $j++) {
         |  double $acc = 0.0;
         |  for (int $k = 0; $k < $d; $k++) {
         |    long $r = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashLong(((long) $j) * 65536L + $k, ${seed}L);
         |    $acc += (double) $a.getFloat($k) * ((($r & 1L) == 1L) ? 1.0 : -1.0);
         |  }
         |  if ($acc >= 0) $sig |= (1 << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig"
}

object HashFunctions {
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  def hyperplane_sig(c: Column, nbits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      HyperplaneSignature(ColumnBridge.expression(c), nbits, seed))

  /** Hamming distance between two 64-bit signatures as a Column. */
  def hamming64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.bit_count
    bit_count(a.bitwiseXOR(b))
  }
}
