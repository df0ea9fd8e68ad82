package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.TopKAgg.top_k_agg
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-K, partial-aggregation spellings of the
  * reference's `groupByKey` + in-memory `sortWith(_._2 > _._2)
  * .take(20)` (`OfflineRecommender.scala:77-84`, A4/A5/O2). A window
  * `row_number <= K` is the declarative spelling (q11); the
  * aggregates here keep at most K elements per map-side partial, so
  * the shuffle carries ≤K rows per (partition, group) instead of
  * every row of every group — at 100 TB with hot groups that
  * difference is the job. Two spellings: the production
  * [[graft.functions.TopKAgg]] (`TypedImperativeAggregate`, no row
  * encoders — q27 runs this) and the typed-`Aggregator` below (the
  * Dataset-API spelling, kept as the §2.11 typed-UDAF surface).
  */
object TopK {

  /** (id, score) pair ranked by score desc, id asc. */
  case class Scored(id: Long, score: Double)

  /** Input row: group key + scored element. */
  case class KeyedScored(key: Long, id: Long, score: Double)

  class TopKAggregator(k: Int)
      extends Aggregator[KeyedScored, Seq[Scored], Seq[Scored]] {

    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Seq[Scored] = Seq.empty

    override def reduce(buf: Seq[Scored], in: KeyedScored): Seq[Scored] =
      insert(buf, Scored(in.id, in.score))

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)

    private def insert(buf: Seq[Scored], in: Scored): Seq[Scored] =
      if (buf.size >= k && better(buf.last, in)) buf
      else (buf :+ in).sortWith(better).take(k)

    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }

  /** Same semantics (and the same oracle) as q11's window top-k,
    * executed through the partial-aggregation path instead: the
    * `TypedImperativeAggregate` keeps ≤K entries per (partition,
    * group) map-side, so a hot group shuffles K rows instead of all
    * of them. Round 2 ran this through the typed `Aggregator` (kept
    * below as the documented Dataset-API spelling) — its per-row
    * encoder ser/de made it ~4× slower than the window; the
    * imperative aggregate runs on `InternalRow` directly like a
    * built-in.
    */
  val topKAggQuery: QueryDef = QueryDef.sql(
    "q27_topk_aggregator",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
      | FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number()
      | OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      | AS rn FROM orders) t WHERE rn <= 3
      | ORDER BY o_custkey, rn""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(top_k_agg(col("o_orderkey"), col("o_totalprice"), 3).as("topk"))
      .select(col("o_custkey"),
        posexplode(col("topk")).as(Seq("idx", "rec")))
      .select(col("o_custkey"), col("rec.id").as("o_orderkey"),
        col("rec.score").as("o_totalprice"),
        (col("idx") + 1).cast("int").as("rn"))
      .orderBy("o_custkey", "rn")
  }

  val defs: Seq[QueryDef] = Seq(topKAggQuery)
}
