package graft

import graft.sources.JsonlSource
import org.apache.spark.sql.functions._

/** Ingest policy for the JSONL corpus source: clean rows land in the
  * engine's documents shape, everything else lands in quarantine with
  * a reason, and no line is dropped silently.
  */
class JsonlSourceSpec extends SparkSpec {

  private lazy val fixture: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
      // optional fields absent → nulls, still clean
      """{"doc_id": 2, "text": "solo"}""",
      // stated n_chars is a lie → derived value must win
      """{"doc_id": 3, "text": "abc", "lang": "de", "source": "b", "n_chars": 999}""",
      // not JSON at all
      """this is not json {""",
      // schema drift on REQUIRED fields → quarantine, not nulls
      """{"text": "no id here"}""",
      """{"doc_id": 4, "lang": "fr"}""",
      // wrong type for doc_id → unparseable under the declared schema
      """{"doc_id": "abc", "text": "typed wrong"}""")
    val p = dir.resolve("docs.jsonl")
    java.nio.file.Files.write(p,
      lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("clean lines parse into the documents shape with derived n_chars") {
    val docs = JsonlSource.documents(spark, fixture)
      .orderBy("doc_id").collect()
    assert(docs.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = docs.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "hello world")
    assert(byId(1L).getString(2) == "en")
    // optional fields absent → null, present downstream for defaulting
    assert(byId(2L).isNullAt(2) && byId(2L).isNullAt(3))
    // n_chars derived from text, never trusted from the record
    assert(byId(3L).getLong(4) == 3L)
    assert(byId(1L).getLong(4) == 11L)
  }

  test("malformed and drifted lines quarantine with a reason; " +
      "nothing is silently dropped") {
    val q = JsonlSource.quarantine(spark, fixture).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(q.size == 4)
    assert(q("this is not json {") == "malformed")
    assert(q("""{"text": "no id here"}""") == "missing_doc_id")
    assert(q("""{"doc_id": 4, "lang": "fr"}""") == "missing_text")
    // a wrong-typed required field violates the declared schema —
    // the corrupt-record channel catches it as malformed
    assert(q("""{"doc_id": "abc", "text": "typed wrong"}""")
      == "malformed")
    // conservation: clean + quarantined == input lines
    val total = spark.read.text(fixture).count()
    assert(JsonlSource.documents(spark, fixture).count() + q.size == total)
  }

  test("clean output drives the engine's operators directly") {
    // the shape contract: a q37-style aggregate runs over the source
    val stats = JsonlSource.documents(spark, fixture)
      .agg(sum("n_chars").as("chars"), count(lit(1)).as("docs"))
      .head()
    assert(stats.getLong(1) == 3L && stats.getLong(0) == 18L)
  }
}
