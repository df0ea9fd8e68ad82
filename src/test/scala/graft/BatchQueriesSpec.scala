package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant tests for the batch relational surface. Exact
  * value parity is the DuckDB oracle's job (driver gate + tools/
  * check.py); here we assert structural invariants at sf0.001.
  */
class BatchQueriesSpec extends SparkSpec {

  test("all registered queries run and schemas are non-empty") {
    SparkEntry.allDefs.foreach { q =>
      val df = q.fn(spark, sfTiny)
      assert(df.columns.nonEmpty, s"${q.name} has no columns")
    }
  }

  test("every query with an oracle has matching name discipline") {
    // column aliases must be stable snake_case identifiers — the driver
    // sorts columns by name before hashing
    SparkEntry.allDefs.filter(_.oracle.isDefined).foreach { q =>
      q.fn(spark, sfTiny).columns.foreach { c =>
        assert(c.matches("[a-z][a-z0-9_]*"), s"${q.name}: bad column '$c'")
      }
    }
  }

  test("snapshotDiff classifies inserts/deletes/updates, null-safe") {
    import spark.implicits._
    val a = Seq((1L, Some("x"), 10), (2L, None: Option[String], 20),
      (3L, Some("z"), 30), (4L, Some("w"), 40))
      .toDF("k", "s", "n")
    val b = Seq((1L, Some("x"), 10),          // unchanged -> absent
      (2L, Some("now-set"), 20),              // null -> value = update
      (3L, None: Option[String], 30),         // value -> null = update
      (5L, Some("new"), 50))                  // insert; 4 deleted
      .toDF("k", "s", "n")
    val got = ops.Cdc.snapshotDiff(a, b, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "insert"), got.toString)
  }

  test("q93: SCD2 chains are contiguous with exactly one current row per key") {
    val h = ops.Cdc.scd2History.fn(spark, sfTiny)
    val byKey = h.collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
    byKey.foreach { case (k, rows) =>
      assert(rows.count(_.getInt(5) == 1) == 1, s"$k current-row count")
      val sorted = rows.sortBy(_.getTimestamp(3).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) == b.getTimestamp(3),
            s"$k: gap between versions")
        case _ => ()
      }
      assert(sorted.last.isNullAt(4), s"$k: current row must be open-ended")
    }
    assert(byKey.nonEmpty)
  }

  test("q01 counts sum to total events") {
    val total = Tables.events(spark, sfTiny).count()
    val summed = ops.Statistics.rateMoreProducts.fn(spark, sfTiny)
      .agg(sum("cnt")).head.getLong(0)
    assert(summed == total)
  }

  test("q11 top-k emits at most 3 rows per customer, rank-ordered") {
    val df = ops.Relational.topKPerGroup.fn(spark, sfTiny)
    val over = df.groupBy("o_custkey").count().filter(col("count") > 3)
    assert(over.isEmpty)
    assert(df.filter(col("rn") > 3).isEmpty)
  }

  test("q08 anti join excludes exactly the pending-order holders") {
    val anti = ops.Relational.antiJoin.fn(spark, sfTiny)
    val withP = Tables.orders(spark, sfTiny)
      .filter(col("o_orderstatus") === "P")
      .select(col("o_custkey")).distinct().count()
    val total = Tables.customer(spark, sfTiny).count()
    assert(anti.count() == total - withP)
  }

  test("q16 rmse is a single positive scalar") {
    val v = ops.Scalars.rmse.fn(spark, sfTiny).head.getDouble(0)
    assert(v > 0 && v < 100)
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q67 packing matches a sequential reference; shards are dense") {
    val budget = 1024L
    val got = text.TextAnalysis.packShards.fn(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential reference: walk docs in the same bucket-major order,
    // accumulate tokens, shard = floor(start / budget)
    var cum = 0L
    val want = got.map { case (id, ntok, _) => (id, ntok) }
      .sortBy { case (id, _) => (id % 32, id) }
      .map { case (id, ntok) =>
        val shard = cum / budget
        cum += ntok
        (id, shard)
      }.toMap
    got.foreach { case (id, _, shard) =>
      assert(shard == want(id), s"doc $id: got $shard want ${want(id)}")
    }
    // the corpus' docs are all shorter than the budget, so no shard
    // index is skipped by a straddling doc and ids are dense 0..max
    assert(got.forall(_._2 < budget))
    val maxShard = got.map(_._3).max
    assert(got.map(_._3).distinct.sorted.toSeq == (0L to maxShard))
  }

  test("q69 mixing hits exact per-lang quotas at the max feasible total") {
    val mix = Map("en" -> 4, "de" -> 2, "fr" -> 2, "es" -> 1, "zh" -> 1)
    val n = Tables.documents(spark, sfTiny).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = mix.map { case (l, w) => math.floor(n(l) * 10.0 / w).toLong }.min
    val caps = mix.map { case (l, w) =>
      l -> math.floor(w * t / 10.0).toLong
    }.filter(_._2 > 0)
    val got = text.TextAnalysis.mixProportions.fn(spark, sfTiny)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == caps, s"got $got want $caps")
  }

  test("q107 temperature sampling: sqrt-share caps, rare sources " +
      "upweighted, deterministic") {
    val n = Tables.documents(spark, sfSmall).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent cap oracle: integer arithmetic over the 1e9 sqrt grid
    val q = n.map { case (s, c) => s -> math.floor(math.sqrt(c.toDouble) * 1e9).toLong }
    val qsum = q.values.sum
    val ntgt = n.values.sum / 2
    val want = q.map { case (s, v) => s -> math.min(ntgt * v / qsum, n(s)) }
      .filter(_._2 > 0)
    val out = ml.Sampling.temperatureSample.fn(spark, sfSmall).cache()
    val got = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"got $got want $want")
    // α = 1/2 upweights rare sources: sampling RATE cap/n must be
    // (weakly) decreasing in source size, up to the 1/n floor
    // granularity of an integer cap
    val bySize = n.toSeq.sortBy(_._2).map { case (s, c) =>
      (c, got.getOrElse(s, 0L).toDouble / c)
    }
    bySize.sliding(2).foreach { case Seq((cr, rare), (_, common)) =>
      assert(rare >= common - 1.0 / cr,
        s"rates not monotone: $bySize")
    case _ => ()
    }
    // deterministic md5 order: a second run selects identical rows
    val again = ml.Sampling.temperatureSample.fn(spark, sfSmall)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("q110 cluster split: every sampled doc assigned, no cluster " +
      "straddles, exact pairs co-split") {
    val out = ml.Sampling.clusterSplit.fn(spark, sfTiny).cache()
    // the query runs on q121's 1-in-4 sample (exact setsim clusters)
    val docs = Tables.documents(spark, sfTiny)
      .filter(col("doc_id") % 4 === 0)
    assert(out.count() == docs.count())
    assert(out.filter(!col("split").isin("train", "val", "test")).isEmpty)
    val straddle = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1)
    assert(straddle.isEmpty)
    // leakage property stated directly: every exact Jaccard>=0.6 pair
    // lands in ONE split (the clusters are CC over exactly these
    // pairs, so this must hold by construction)
    val pairs = dedup.SetSimJoin.allPairs(docs, "doc_id", "text")
    val s1 = out.select(col("doc_id").as("doc_a"), col("split").as("sa"))
    val s2 = out.select(col("doc_id").as("doc_b"), col("split").as("sb"))
    assert(pairs.join(s1, "doc_a").join(s2, "doc_b")
      .filter(col("sa") =!= col("sb")).isEmpty)
  }

  test("q111 word entropy: bounded by log2(distinct), exact on a " +
      "hand-computed doc") {
    val out = text.TextAnalysis.wordEntropy.fn(spark, sfTiny).cache()
    val docs = Tables.documents(spark, sfTiny)
    assert(out.count() == docs.count())
    assert(out.filter(col("word_entropy") < -1e-9).isEmpty)
    assert(out.filter(col("word_entropy") >
      log2(col("n_distinct").cast("double")) + 1e-4).isEmpty)
    // independent recomputation for the three smallest doc_ids
    val sample = docs.orderBy("doc_id").limit(3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val got = out.orderBy("doc_id").limit(3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    sample.foreach { case (id, text0) =>
      val counts = text0.split(" ", -1).groupBy(identity)
        .map(_._2.length.toDouble)
      val n = counts.sum
      val h = counts.map(c => -(c / n) * math.log(c / n) / math.log(2)).sum
      assert(math.abs(got(id) - h) < 5e-4, s"doc $id: got ${got(id)} want $h")
    }
  }
}
