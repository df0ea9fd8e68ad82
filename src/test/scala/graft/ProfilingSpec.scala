package graft

import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {

  test("melt+profile counts nulls, distincts, and string min/max per column") {
    import spark.implicits._
    val fx = Seq(
      (Some(1L), Some("a")),
      (Some(2L), None),
      (Some(2L), Some("c")),
      (None, Some("a"))
    ).toDF("k", "s")
    val out = ops.Profiling.profile(ops.Profiling.melt(fx, Seq("k", "s")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    // k: 4 rows, 3 filled, distinct {1,2}, min "1", max "2"
    assert(out("k") == ((4L, 3L, 2L, "1", "2")))
    // s: 4 rows, 3 filled, distinct {a,c}
    assert(out("s") == ((4L, 3L, 2L, "a", "c")))
  }

  test("profile min/max are lexicographic by design") {
    import spark.implicits._
    val fx = Seq(Tuple1(9L), Tuple1(10L), Tuple1(100L)).toDF("n")
    val out = ops.Profiling.profile(ops.Profiling.melt(fx, Seq("n"))).head()
    assert(out.getString(4) == "10" && out.getString(5) == "9")
  }
}
