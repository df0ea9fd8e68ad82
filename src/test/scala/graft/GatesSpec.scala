package graft

/** The SPECGATES.json contract: every no_oracle query carries exactly
  * one machine-readable gate, the JSON renders cleanly, and the cheap
  * structural gates measure zero violations on real data. The full
  * gate sweep (ALS fits, recall passes) runs inside Verify — this
  * spec keeps the export aligned with the registry without re-paying
  * those fits in the unit suite.
  */
class GatesSpec extends SparkSpec {

  private val noOracle =
    SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name).toSet

  test("gate registry covers exactly the no_oracle queries") {
    // names are pinned inside Gates.all's closures; materialize them
    // without running measurements by reflecting on the spec list via
    // a dry failure run against a nonexistent dir (every gate records
    // NaN/fail rather than throwing)
    val gates = Gates.all(spark, "/nonexistent")
    assert(gates.map(_.query).toSet == noOracle,
      s"missing=${noOracle -- gates.map(_.query).toSet} " +
        s"extra=${gates.map(_.query).toSet -- noOracle}")
    assert(gates.map(_.query).distinct.size == gates.size,
      "one gate entry per query")
    // dry run: every gate degrades to NaN/fail, none throws
    assert(gates.forall(g => !g.pass && g.value.isNaN))
  }

  test("json rendering is valid and NaN-free") {
    val rs = Seq(
      GateResult("q00_x", "recall", 0.9734, 0.8, ">=", pass = true),
      GateResult("q01_y", "violations", 0.0, 0.0, "<=", pass = true),
      GateResult("q02_z", "err", Double.NaN, 4.0, "<=", pass = false))
    val js = Gates.toJson(rs)
    assert(js.contains("\"q00_x\"") && js.contains("0.973400"))
    assert(js.contains("\"value\": 0,"))
    assert(js.contains("\"value\": null,") && !js.contains("NaN"))
    assert(js.trim.startsWith("{") && js.trim.endsWith("}"))
  }

  test("structural gates measure zero violations at sf0.001") {
    val cheap = Set("q32_dedup_simhash", "q42_fingerprint",
      "q45_approx_distinct", "q68_decontaminate_bloom")
    val got = Gates.all(spark, sfTiny, only = cheap)
    assert(got.size == cheap.size)
    got.foreach(g => assert(g.pass, s"${g.query}: value=${g.value}"))
  }
}
