package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** K-minhash signature (Broder 1997) over an already-hashed token set
  * (`array<long>`): minhash i is the minimum over tokens of
  * `XXH64.hashLong(token, i+1)`. One fused pass per row — the
  * higher-order-function formulation (K separate `transform` +
  * `array_min` calls) evaluates K×|tokens| interpreted lambdas per
  * document and allocates K intermediate arrays, which measured ~3×
  * the total query time at K=64.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 1024, "k must be in 1..1024")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(t, j + 1L)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val t = ctx.freshName("t")
      val h = ctx.freshName("h"); val mins = ctx.freshName("mins")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $t = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashLong($t, $j + 1L);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** Number of positions where two equal-length long arrays agree —
  * `matches / K` is the Broder estimate of Jaccard similarity from two
  * minhash signatures. Tight codegen'd loop; the `when`-chain
  * equivalent is K nested branches (codegen-hostile at K=64) and the
  * `zip_with`+`filter` equivalent allocates two arrays per pair.
  */
case class SignatureMatches(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_matches expects (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0; var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)

  override def prettyName: String = "sig_matches"
}

/** Index of the first band (of `bands` equal slices) where two
  * signatures agree on every position, or -1. Lets an LSH bucket
  * self-join emit each candidate pair exactly once — keep the joined
  * row iff its bucket's band == first_equal_band — replacing a
  * `distinct` over the m²-per-bucket pair blowup with a pipelined
  * filter in the join stage.
  */
case class FirstEqualBand(left: Expression, right: Expression, bands: Int)
    extends BinaryExpression {
  require(bands > 0, "bands must be positive")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"first_equal_band expects (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val rows = n / bands
    var bd = 0
    while (bd < bands) {
      var eq = true
      var i = bd * rows
      val end = i + rows
      while (eq && i < end) {
        if (x.getLong(i) != y.getLong(i)) eq = false
        i += 1
      }
      if (eq) return bd
      bd += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val rows = ctx.freshName("rows"); val bd = ctx.freshName("bd")
      val eq = ctx.freshName("eq"); val end = ctx.freshName("end")
      val res = ctx.freshName("res")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $rows = $n / $bands;
         |int $res = -1;
         |for (int $bd = 0; $bd < $bands && $res < 0; $bd++) {
         |  boolean $eq = true;
         |  int $end = ($bd + 1) * $rows;
         |  for (int $i = $bd * $rows; $eq && $i < $end; $i++) {
         |    if ($a.getLong($i) != $b.getLong($i)) $eq = false;
         |  }
         |  if ($eq) $res = $bd;
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)

  override def prettyName: String = "first_equal_band"
}

/** Intersection cardinality of two SORTED distinct long arrays by
  * linear merge — no per-row hash-set allocation, unlike
  * `size(array_intersect(...))`. With set sizes also at hand, union
  * cardinality (and so Jaccard) follows as |A|+|B|-|A∩B|, saving the
  * second set operation entirely. Callers must pre-sort
  * (`array_sort`) once per row, amortized across all pairs the row
  * appears in.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size expects (array<bigint>, array<bigint>), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)

  override def prettyName: String = "sorted_intersect_size"
}

/** xxhash64 of every word `n`-gram of a text column, fused into one
  * codegen'd pass per row: tokenize on single spaces (empty tokens
  * kept — regex-`" "`-split-with-limit=-1 parity), slide the n-token
  * window (a document shorter than `n` tokens contributes its whole
  * token list as one shingle, matching `Dedup.shingles`' `greatest(…,
  * 1)` floor), hash each joined window's UTF-8 bytes with seed-42
  * XXH64. The declarative spelling —
  * `transform(array_distinct(transform(sequence…, array_join(slice…))),
  * xxhash64)` — runs three levels of interpreted lambdas per document
  * and dominated the decontamination probe scan; this is its hot-path
  * replacement for BLOOM/membership probing, where duplicate hashes
  * are harmless (build and probe must simply agree, which they do by
  * construction: a shared word n-gram yields equal bytes, hence an
  * equal hash, on both sides). The exact-count tier keeps the
  * string-shingle spelling (counts need `array_distinct` semantics).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0 && n <= 16, "shingle width must be in 1..16")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

/** The word `n`-gram shingle SET of a text column as strings, fused
  * into one codegen'd pass: tokenize on single spaces (empty tokens
  * kept — regex-`" "`-split-with-limit=-1 parity), slide the n-token
  * window (a document shorter than `n` tokens contributes its whole
  * token list as one shingle), join each window with a space, and
  * de-duplicate preserving first occurrence (`array_distinct`
  * parity). The declarative spelling —
  * `array_distinct(transform(sequence…, array_join(slice…)))` —
  * runs three levels of interpreted lambdas per document; this is
  * its drop-in replacement for the exact-count tiers that need the
  * shingle STRINGS (q33/q42/q60's explode+join), the sibling of
  * [[ShingleHashes]] which serves the hash-only probe paths.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0 && n <= 16, "shingle width must be in 1..16")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got ${t.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    WordShingles.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size
    val cnt = math.max(m - n + 1, 1)
    // first-occurrence order (array_distinct parity)
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var w = 0
    while (w < cnt) {
      sb.setLength(0)
      var j = w
      val end = math.min(w + n, m)
      while (j < end) {
        if (j > w) sb.append(' ')
        sb.append(toks.get(j))
        j += 1
      }
      seen.add(sb.toString)
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object ShingleHashes {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val toks = new java.util.ArrayList[String]
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size
    val cnt = math.max(m - n + 1, 1)
    val out = new Array[Long](cnt)
    val sb = new java.lang.StringBuilder
    var w = 0
    while (w < cnt) {
      sb.setLength(0)
      var j = w
      val end = math.min(w + n, m)
      while (j < end) {
        if (j > w) sb.append(' ')
        sb.append(toks.get(j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      out(w) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object HashFunctions {
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  def hyperplane_sig(c: Column, nbits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(
      HyperplaneSignature(ColumnBridge.expression(c), nbits, seed))

  def minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), k))

  def shingle_hashes(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))

  def word_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))

  def sig_matches(a: Column, b: Column): Column =
    ColumnBridge.column(
      SignatureMatches(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def first_equal_band(a: Column, b: Column, bands: Int): Column =
    ColumnBridge.column(FirstEqualBand(
      ColumnBridge.expression(a), ColumnBridge.expression(b), bands))

  def sorted_intersect_size(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Hamming distance between two 64-bit signatures as a Column. */
  def hamming64(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.bit_count
    bit_count(a.bitwiseXOR(b))
  }

  /** Index of the first band (of `bands` slices of `bandBits` bits
    * each, LSB-first) where two PACKED integer signatures agree, or
    * -1. The single-long analogue of [[first_equal_band]]: an LSH
    * bucket self-join keeps the joined row iff its bucket's band ==
    * this index, emitting each candidate pair exactly once WITHOUT a
    * `distinct` over the per-bucket pair blowup. A short `when` chain
    * over the XOR (bands ≤ 8 here) stays inside whole-stage codegen.
    */
  def first_equal_packed_band(a: Column, b: Column, bands: Int,
      bandBits: Int): Column = {
    import org.apache.spark.sql.functions.{lit, shiftrightunsigned, when}
    val x = a.bitwiseXOR(b)
    val mask = (1L << bandBits) - 1
    (0 until bands).foldRight(lit(-1): Column) { (i, rest) =>
      when(shiftrightunsigned(x, i * bandBits).bitwiseAND(lit(mask)) === 0,
        lit(i)).otherwise(rest)
    }
  }
}
