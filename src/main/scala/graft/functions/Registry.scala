package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.ColumnBridge

/** SQL-surface registration for the engine's custom expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API. Registration is per-session and idempotent.
  */
object Registry {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }

  private def litDouble(e: Expression, what: String): Double = e match {
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  private def arity(name: String, got: Int, want: String): Nothing =
    throw new IllegalArgumentException(
      s"$name expects $want argument(s), got $got")

  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "cosine_sim", {
      case Seq(a, b) => CosineSimilarity(a, b)
      case e => arity("cosine_sim", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "dot_product", {
      case Seq(a, b) => DotProduct(a, b)
      case e => arity("dot_product", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "simhash64", {
      case Seq(a) => SimHash64(a)
      case e => arity("simhash64", e.size, "1")
    })
    ColumnBridge.registerFunction(spark, "hyperplane_sig", {
      case Seq(v) => HyperplaneSignature(v, 16, 42L)
      case Seq(v, n) => HyperplaneSignature(v, litInt(n, "nbits"), 42L)
      case Seq(v, n, s) =>
        HyperplaneSignature(v, litInt(n, "nbits"), litLong(s, "seed"))
      case e => arity("hyperplane_sig", e.size, "1 to 3")
    })
    ColumnBridge.registerFunction(spark, "minhash_sig", {
      case Seq(a, k) => MinHashSignature(a, litInt(k, "k"))
      case e => arity("minhash_sig", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "shingle_hashes", {
      case Seq(t, n) => ShingleHashes(t, litInt(n, "n"))
      case e => arity("shingle_hashes", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "word_shingles", {
      case Seq(t, n) => WordShingles(t, litInt(n, "n"))
      case e => arity("word_shingles", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "sig_matches", {
      case Seq(a, b) => SignatureMatches(a, b)
      case e => arity("sig_matches", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "first_equal_band", {
      case Seq(a, b, n) => FirstEqualBand(a, b, litInt(n, "bands"))
      case e => arity("first_equal_band", e.size, "3")
    })
    ColumnBridge.registerFunction(spark, "sorted_intersect_size", {
      case Seq(a, b) => SortedIntersectSize(a, b)
      case e => arity("sorted_intersect_size", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "bottom_k_agg", {
      case Seq(key, id, k) =>
        BottomKAgg(key, id, litInt(k, "k")).toAggregateExpression()
      case e => arity("bottom_k_agg", e.size, "3")
    })
    ColumnBridge.registerFunction(spark, "minhash_union", {
      case Seq(a, k) =>
        MinHashUnion(a, litInt(k, "k")).toAggregateExpression()
      case e => arity("minhash_union", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "bloom_build", {
      case Seq(keys, bits, k) =>
        BloomBuild(keys, litInt(bits, "numBits"), litInt(k, "k"))
          .toAggregateExpression()
      case e => arity("bloom_build", e.size, "3")
    })
    ColumnBridge.registerFunction(spark, "bloom_contains_any", {
      case Seq(bloom, keys, k) =>
        BloomContainsAny(bloom, keys, litInt(k, "k"))
      case e => arity("bloom_contains_any", e.size, "3")
    })
    ColumnBridge.registerFunction(spark, "kll_quantiles", {
      case e if e.size >= 3 =>
        KllQuantiles(e.head, litInt(e(1), "k"),
          e.drop(2).map(litDouble(_, "prob"))).toAggregateExpression()
      case e => arity("kll_quantiles", e.size, "3 or more")
    })
    ColumnBridge.registerFunction(spark, "top_k_agg", {
      case Seq(id, score, k) =>
        TopKAgg(id, score, litInt(k, "k")).toAggregateExpression()
      case e => arity("top_k_agg", e.size, "3")
    })
    ColumnBridge.registerFunction(spark, "heavy_hitters", {
      case Seq(item, k) =>
        MisraGries(item, litInt(k, "k")).toAggregateExpression()
      case e => arity("heavy_hitters", e.size, "2")
    })
    ColumnBridge.registerFunction(spark, "zorder_key", {
      case Seq(x, y) => ZOrderKey(x, y)
      case e => arity("zorder_key", e.size, "2")
    })
  }
}
