package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine_sim matches hand-computed values") {
    val df = Seq(
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),   // orthogonal -> 0
      (Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)),   // identical -> 1
      (Seq(1f, 0f), Seq(-1f, 0f)),          // opposite -> -1
      (Seq(0f, 0f), Seq(1f, 2f))            // zero norm -> 0
    ).toDF("a", "b")
    val got = df.select(cosine_sim($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    assert(got(3) == 0.0)
  }

  test("cosine_sim property: in [-1,1] and equals reference impl on random vecs") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(100)((
      Seq.fill(16)(rnd.nextFloat() * 10 - 5),
      Seq.fill(16)(rnd.nextFloat() * 10 - 5)))
    val got = cases.toDF("a", "b")
      .select(cosine_sim($"a", $"b")).as[Double].collect()
    got.zip(cases).foreach { case (g, (a, b)) =>
      assert(g >= -1.0 - 1e-9 && g <= 1.0 + 1e-9)
      assert(math.abs(g - cosRef(a, b)) < 1e-9)
    }
  }

  test("cosine_sim is null-safe") {
    val got = Seq((Option.empty[Seq[Float]], Option(Seq(1f, 2f))))
      .toDF("a", "b").select(cosine_sim($"a", $"b")).collect()
    assert(got.head.isNullAt(0))
  }

  test("cosine_sim_packed over pack_floats is BIT-identical to " +
      "cosine_sim, including zero-norm and length-mismatch semantics") {
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(100)((
      Seq.fill(64)(rnd.nextFloat() * 10 - 5),
      Seq.fill(64)(rnd.nextFloat() * 10 - 5))) ++ Seq(
      (Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)),  // zero norm -> 0.0
      (Seq(1f, 2f, 3f, 4f), Seq(1f, 2f)))  // common prefix only
    val got = cases.toDF("a", "b")
      .select(cosine_sim($"a", $"b").as("plain"),
        cosine_sim_packed(pack_floats($"a"), pack_floats($"b"))
          .as("packed"))
      .as[(Double, Double)].collect()
    got.foreach { case (p, k) =>
      // same arithmetic order, so exact equality — not epsilon
      assert(java.lang.Double.doubleToRawLongBits(p) ==
        java.lang.Double.doubleToRawLongBits(k), s"$p != $k")
    }
    // pack_floats payload shape: 4 bytes per element, no header
    val lens = Seq(Seq(1f, 2f, 3f)).toDF("a")
      .select(length(pack_floats($"a"))).as[Int].collect()
    assert(lens.head == 12)
  }

  test("dot_product equals cosine on pre-normalized embedding vectors") {
    val df = Tables.embeddings(spark, sfTiny).limit(20)
    val norm = df.select(col("vec_id"),
      transform(col("embedding"),
        x => (x / sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, v) => acc + v * v))).cast("float")).as("nv"),
      col("embedding"))
    val a = norm.select(col("vec_id").as("ida"), col("nv").as("va"),
      col("embedding").as("ea"))
    val b = norm.select(col("vec_id").as("idb"), col("nv").as("vb"),
      col("embedding").as("eb"))
    val bad = a.crossJoin(b)
      .select(
        dot_product(col("va"), col("vb")).as("dot"),
        cosine_sim(col("ea"), col("eb")).as("cos"))
      .filter(abs(col("dot") - col("cos")) > 1e-5)
    assert(bad.isEmpty)
  }

  test("int8 quantize/dequantize reconstructs within one step") {
    val emb = Tables.embeddings(spark, sfTiny)
    val q = graft.search.Ann.quantize.fn(spark, sfTiny)
      .select(col("vec_id"), col("mn"), col("mx"),
        transform(split(col("codes"), ","), c => c.cast("int")).as("cs"))
    val joined = emb.join(q, "vec_id")
      .select(col("vec_id"), col("embedding"), col("mn"), col("mx"),
        graft.search.Ann.dequantize(col("cs"), col("mn"), col("mx"))
          .as("rec"))
      // worst reconstruction error per vector, against the step bound
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("rec"),
          (a, b) => abs(a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, x) => greatest(acc, x)).as("err"),
        ((col("mx") - col("mn")) / 255.0 + lit(1e-6)).as("bound"))
    val bad = joined.filter(col("err") > col("bound"))
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
    assert(joined.count() > 0)
  }
}
