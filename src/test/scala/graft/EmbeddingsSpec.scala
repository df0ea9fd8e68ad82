package graft

class EmbeddingsSpec extends SparkSpec {

  test("centroidsBy averages each dimension within the group exactly") {
    import spark.implicits._
    val fx = Seq(
      (0, Array(1.0f, 2.0f)),
      (0, Array(3.0f, 6.0f)),
      (1, Array(-1.0f, 0.5f))
    ).toDF("label", "embedding")
    val out = search.Embeddings.centroidsBy(fx, "label")
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1).toLong) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(out((0, 1L)) == ((2.0, 2L)))
    assert(out((0, 2L)) == ((4.0, 2L)))
    assert(out((1, 1L)) == ((-1.0, 1L)))
    assert(out((1, 2L)) == ((0.5, 1L)))
  }
}
