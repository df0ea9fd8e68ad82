package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-K as a typed `Aggregator`: the optimized
  * rewrite of the reference's `groupByKey` + in-memory
  * `sortWith(_._2 > _._2).take(20)` (`OfflineRecommender.scala:77-84`,
  * A4/A5/O2). A window `row_number <= K` is the declarative spelling
  * (q11); this aggregator is the partial-aggregation spelling — each
  * map-side partial keeps at most K elements, so the shuffle carries
  * ≤K rows per (partition, group) instead of every row of every
  * group. At 100 TB with hot groups that difference is the job.
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
    * executed through the typed-aggregator partial-agg path instead.
    */
  val topKAggQuery: QueryDef = QueryDef.sql(
    "q27_topk_aggregator",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
      | FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number()
      | OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      | AS rn FROM orders) t WHERE rn <= 3
      | ORDER BY o_custkey, rn""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    import s.implicits._
    val topk = new TopKAggregator(3).toColumn.name("topk")
    Tables.orders(s, d)
      .select(col("o_custkey").as("key"), col("o_orderkey").as("id"),
        col("o_totalprice").as("score"))
      .as[KeyedScored]
      .groupByKey(_.key)
      .agg(topk)
      .flatMap { case (cust, recs) =>
        recs.iterator.zipWithIndex.map { case (r, i) =>
          (cust, r.id, r.score, i + 1)
        }
      }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val defs: Seq[QueryDef] = Seq(topKAggQuery)
}
