package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scale.sessionBuilder("graft-verify", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Conf-dial passthrough (shared parser, graft.Scale): lets a
    // dialed configuration run the FULL correctness surface — e.g.
    // widePhashBands=true re-verified by the replay oracle, which
    // reads the active layout from the fingerprint side outputs.
    Scale.applyEnvConfs(spark, m => System.err.println(s"[verify] $m"))
    new java.io.File(outDir).mkdirs()
    // Dev-loop subset: SPARK_GRAFT_ONLY=q79,q83 dumps only matching
    // queries. Unset (the driver's invocation) = all. Matching is
    // anchored at the qNN token (same contract as Bench): "q9"
    // selects q9_* only, never q90-q99.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def wanted(name: String): Boolean =
      only.forall(_.exists(t => name == t || name.startsWith(t + "_")))
    SparkEntry.queries.filter(q => wanted(q._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // q109 replay side output (r14 verdict item 3): BPE is iterative
    // and can never get a DuckDB oracle, but greedy BPE is a pure
    // function of the corpus — drop the learned merge table next to
    // the parquet (non-parquet files in a Spark output dir are
    // routine — _SUCCESS lives there) so tools/check.py can replay
    // learning + tokenization in independent Python and compare
    // every cell. The merges come from the query run's cache — no
    // extra learning jobs.
    if (wanted("q109_bpe_tokens") &&
        new java.io.File(s"$outDir/q109_bpe_tokens").isDirectory)
      try {
        val ms = graft.text.Bpe.mergesFor(spark, sfDir)
        val body = ms.map(m => s"""{"rank":${m.rank},"left":${q(m.left)}""" +
          s""","right":${q(m.right)}}""").mkString(",")
        Files.writeString(
          Paths.get(s"$outDir/q109_bpe_tokens/_merges.json"),
          s"""{"requested":${graft.text.Bpe.effMerges(spark)},""" +
            s""""merges":[$body]}""")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] q109 merges dump failed: " +
          e.getMessage)
      }
    // q73 replay side output (r16 verdict item 2): the k-means
    // coarse quantizer is q73's only stage a from-scratch Python
    // can't re-derive (seeded distributed training), but assignment
    // and the greedy intra-cluster cosine drop are pure functions of
    // the centroids — dump the trained centers (full round-trip
    // precision via Double.toString) from the SAME cached model the
    // query assigned with (Ann.semDedupModel — no extra fit jobs),
    // and tools/check.py replays everything downstream cell-for-cell.
    if (wanted("q73_semdedup") &&
        new java.io.File(s"$outDir/q73_semdedup").isDirectory)
      try {
        val tau = spark.conf.getOption("spark.graft.semdedup.tau")
          .map(_.toDouble).getOrElse(0.95)
        val cs = graft.search.Ann.semDedupCentroids(spark, sfDir)
        val body = cs.map(_.mkString("[", ",", "]")).mkString(",")
        Files.writeString(
          Paths.get(s"$outDir/q73_semdedup/_centroids.json"),
          s"""{"k":${cs.length},"tau":$tau,"centroids":[$body]}""")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] q73 centroids dump failed: " +
          e.getMessage)
      }
    // q48/q141 replay side output (r17, the q73 centroid move carried
    // to the IVF tier): the two-level quantizer's training is the
    // only non-Python-derivable stage; given its centroids — the
    // broadcast kc-row coarse table and the per-coarse-cell fine
    // arrays, read from the SAME session-cached (and parquet-persisted)
    // index the queries serve from — corpus assignment, query
    // routing, candidate scoring, and the top-k window are pure
    // functions the replay re-derives from scratch. One dump per
    // result dir so SPARK_GRAFT_ONLY subsets stay self-contained.
    {
      import org.apache.spark.sql.functions.col
      def dirOk(n: String): Boolean =
        wanted(n) && new java.io.File(s"$outDir/$n").isDirectory
      def arr2(a: scala.collection.Seq[
          scala.collection.Seq[Float]]): String =
        a.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      def ivfJson(idx: graft.search.Ann.IvfIndex): String = {
        val coarse = idx.coarseDf.collect()(0)
          .getAs[scala.collection.Seq[scala.collection.Seq[Float]]](0)
        val fine = idx.saltedFine.filter(col("salt") === 0)
          .select("ccell", "fcents").collect()
          .map(r => (r.getInt(0),
            r.getAs[scala.collection.Seq[scala.collection.Seq[Float]]](1)))
          .sortBy(_._1)
        s"""{"kc":${idx.kc},"k":${graft.search.Ann.K},""" +
          s""""coarse":${arr2(coarse)},""" +
          s""""fine":[${fine.map(f =>
            s"""[${f._1},${arr2(f._2)}]""").mkString(",")}]}"""
      }
      def pqJson(books: Array[Array[Array[Double]]]): String =
        s"""{"m":${graft.search.Pq.M},""" +
          s""""sub_dim":${graft.search.Pq.SubDim},""" +
          s""""k":${graft.search.Pq.K},"books":[""" +
          books.map(b => b.map(_.mkString("[", ",", "]"))
            .mkString("[", ",", "]")).mkString(",") + "]}"
      def put(n: String, file: String, body: String): Unit =
        Files.writeString(Paths.get(s"$outDir/$n/$file"), body)
      // full-corpus IVF index → q48/q141 (routing+assignment replay)
      // and q136 (the IVF half of IVFADC)
      val ivfDirs = Seq("q48_ann_ivf", "q141_ann_filtered_ivf",
        "q136_ann_ivfpq").filter(dirOk)
      if (ivfDirs.nonEmpty)
        try {
          val idx = graft.search.Ann.cachedIndex(spark, sfDir, "full",
            Tables.embeddings(spark, sfDir))
          val body = ivfJson(idx)
          ivfDirs.foreach(n => put(n, "_ivf_index.json", body))
        } catch { case e: Throwable =>
          System.err.println(s"[verify] ivf index dump failed: " +
            e.getMessage)
        }
      // full-corpus PQ codebooks → q84 (flat ADC) and q136 (the PQ
      // half) — same cached index the queries encode/score with
      val pqDirs = Seq("q84_ann_pq", "q136_ann_ivfpq").filter(dirOk)
      if (pqDirs.nonEmpty)
        try {
          val (_, books) = graft.search.Pq.indexFor(spark, sfDir)
          val body = pqJson(books)
          pqDirs.foreach(n => put(n, "_pq_books.json", body))
        } catch { case e: Throwable =>
          System.err.println(s"[verify] pq books dump failed: " +
            e.getMessage)
        }
      // q139's standing mod10 index + frozen codebooks (the delta
      // encodes against these — the replay re-derives both the
      // standing and the appended side from them)
      if (dirOk("q139_ivfpq_incremental"))
        try {
          val corpus = Tables.embeddings(spark, sfDir)
            .filter(col("vec_id") % 10 =!= 0)
          val idx = graft.search.Ann.cachedIndex(
            spark, sfDir, "mod10", corpus)
          val (_, books) = graft.search.Pq.sliceIndex(
            spark, sfDir, "mod10", corpus)
          put("q139_ivfpq_incremental", "_ivf_index.json", ivfJson(idx))
          put("q139_ivfpq_incremental", "_pq_books.json", pqJson(books))
        } catch { case e: Throwable =>
          System.err.println(s"[verify] q139 index dump failed: " +
            e.getMessage)
        }
      // ALS replay side outputs (r17): the ALS fit is the
      // non-replayable stage (distributed float reductions), and
      // q21's output IS the factor table (a replay would compare the
      // dump to itself — it stays gate-only), but SERVING from the
      // factors is pure: q20's score grid + top-K, q22's factor
      // cosine matrix, q23/q24's held-out RMSE evaluation all
      // re-derive from the dumped factors (and, for the RMSE pair,
      // the dumped held-out triples — the seed-42 randomSplit is
      // partitioning-dependent, so membership is index state the
      // dump carries, like the media fingerprints).
      def facJson(df: org.apache.spark.sql.DataFrame): String =
        df.collect().map(r =>
          s"[${r.getInt(0)},[${r.getSeq[Float](1).mkString(",")}]]")
          .mkString("[", ",", "]")
      if (dirOk("q20_als_user_recs") || dirOk("q22_item_sim_cosine"))
        try {
          val m = graft.ml.Recommend.model(spark, sfDir)
          val body = s"""{"top_k":${graft.ml.Recommend.TopK},""" +
            s""""sim_threshold":${graft.ml.Recommend.SimThreshold},""" +
            s""""user":${facJson(m.userFactors.orderBy("id"))},""" +
            s""""item":${facJson(m.itemFactors.orderBy("id"))}}"""
          Seq("q20_als_user_recs", "q22_item_sim_cosine").filter(dirOk)
            .foreach(put(_, "_als_factors.json", body))
        } catch { case e: Throwable =>
          System.err.println(s"[verify] als factors dump failed: " +
            e.getMessage)
        }
      if (dirOk("q23_als_rmse") || dirOk("q24_als_grid_search"))
        try {
          val (_, test) = graft.ml.Recommend.evalSplit(spark, sfDir)
          val testJson = test.select("userId", "productId", "score")
            .collect().map(r =>
              s"[${r.getInt(0)},${r.getInt(1)},${r.getDouble(2)}]")
            .mkString("[", ",", "]")
          def comboJson(rank: Int, reg: Double): String = {
            val m = graft.ml.Recommend.fitOnSplit(spark, sfDir, rank, reg)
            s"""{"rank":$rank,"reg":$reg,""" +
              s""""user":${facJson(m.userFactors.orderBy("id"))},""" +
              s""""item":${facJson(m.itemFactors.orderBy("id"))}}"""
          }
          if (dirOk("q23_als_rmse"))
            put("q23_als_rmse", "_als_eval.json",
              s"""{"test":$testJson,"combos":[${comboJson(
                graft.ml.Recommend.effRank(spark),
                graft.ml.Recommend.effReg(spark))}]}""")
          if (dirOk("q24_als_grid_search"))
            put("q24_als_grid_search", "_als_eval.json",
              s"""{"test":$testJson,"combos":[${graft.ml.Recommend
                .gridCombos(spark)
                .map(c => comboJson(c._1, c._2)).mkString(",")}]}""")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] als eval dump failed: " +
            e.getMessage)
        }
    }
    // q77 replay side output (r17, same move): the L-BFGS fit is the
    // only non-Python-derivable stage; coefficients + intercept (full
    // round-trip precision) from the SAME cached model the query
    // scored with, plus the feature spec's data inputs (stopword
    // list, label threshold) so the replay re-derives features,
    // labels, margins, probabilities, and predictions from the
    // documents table alone.
    if (wanted("q77_quality_classifier") &&
        new java.io.File(s"$outDir/q77_quality_classifier").isDirectory)
      try {
        val m = graft.ml.QualityModel.trainedModel(spark, sfDir)
        val coefs = m.coefficients.toArray
        val sw = graft.text.TextAnalysis.stopwords.map(q).mkString(",")
        Files.writeString(
          Paths.get(s"$outDir/q77_quality_classifier/_lr_model.json"),
          s"""{"coefficients":[${coefs.mkString(",")}],""" +
            s""""intercept":${m.intercept},""" +
            s""""label_threshold":${graft.ml.QualityModel.LabelThreshold},""" +
            s""""stopwords":[$sw]}""")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] q77 model dump failed: " +
          e.getMessage)
      }
    // Media replay side outputs (r15 verdict item 1): decode needs
    // JVM codecs (and the corpus generators), so the decode half of
    // the media family stays spec/gate-verified — but everything
    // after the raster/PCM (banding, Hamming verify, slot
    // aggregation, clustering) is a pure function of the 64-bit
    // fingerprints. Dump each modality's fingerprint table next to
    // its parquet so tools/check.py can replay the post-decode
    // pipeline in independent Python for q152/q154/q156 and their
    // compositions (q155, q157–q159). The frames come from the query
    // run's per-session hash caches — no extra decode jobs — and
    // each dump carries its banding constants so the replay reads
    // the contract instead of assuming it.
    def dumpFingerprints(name: String, file: String, header: => String)(
        rows: => Iterator[String]): Unit =
      if (wanted(name) && new java.io.File(s"$outDir/$name").isDirectory)
        try Files.writeString(Paths.get(s"$outDir/$name/$file"),
          s"{$header,\"rows\":[" + rows.mkString(",") + "]}")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name fingerprint dump " +
            s"failed: ${e.getMessage}")
        }
    {
      import graft.mm.{MediaDedup, VideoDedup}
      // header carries the RESOLVED layout per modality (the
      // count-aware auto-cutover can differ between image and audio
      // corpora), so the replay re-derives exactly the candidate
      // space the engine mined under either outcome. Header and
      // rows are both lazy: the hash frames come from the query
      // run's per-session caches, and neither is touched unless the
      // query actually ran.
      def phashHeaderFor(
          hashes: org.apache.spark.sql.DataFrame): String = {
        val (b, bits) = MediaDedup.phashBandLayout(spark, hashes.count())
        s""""bands":$b,"band_bits":$bits,""" +
          s""""max_hamming":${MediaDedup.MaxHamming}"""
      }
      dumpFingerprints("q152_media_perceptual_dedup", "_phashes.json",
        phashHeaderFor(MediaDedup.imageHashes(spark, sfDir)))(
        MediaDedup.imageHashes(spark, sfDir).collect().iterator
          .map(r => s"[${r.getLong(0)},${r.getLong(1)}]"))
      dumpFingerprints("q154_audio_perceptual_dedup", "_phashes.json",
        phashHeaderFor(MediaDedup.audioHashes(spark, sfDir)))(
        MediaDedup.audioHashes(spark, sfDir).collect().iterator
          .map(r => s"[${r.getLong(0)},${r.getLong(1)}]"))
      val (vBands, vBits) = VideoDedup.frameBandLayout(spark)
      dumpFingerprints("q156_video_frame_dedup", "_fhashes.json",
        s""""bands":$vBands,"band_bits":$vBits,""" +
          s""""max_hamming":${MediaDedup.MaxHamming},""" +
          s""""min_match_frac":${VideoDedup.MinMatchFrac}""")(
        VideoDedup.videoHashes(spark, sfDir).collect().iterator
          .map(r => s"[${r.getLong(0)},${r.getInt(1)},${r.getLong(2)}]"))
    }
    // Cutover-aware oracle dump: a query that ran its approximate
    // branch (LSH regime above spark.graft.exactPairLimit) must get a
    // rows-only check, not a doomed exact-hash compare. The queries
    // above already warmed the Scale.exactOk memo, so this re-check
    // runs no extra jobs.
    // Guarded per query: a failing approxWhen (e.g. an unreadable
    // table whose count the memo never warmed) must degrade to "keep
    // the oracle" for that ONE query — an escaped exception here
    // would skip writing oracle_sql.json entirely and zero the whole
    // round's correctness, the exact total-loss mode the per-query
    // try/catch above exists to prevent.
    val approx = SparkEntry.allDefs
      .filter(qd => qd.oracle.isDefined && {
        try qd.isApproximateFor(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(
            s"[verify] ${qd.name} approx check failed: ${e.getMessage}")
          false
        }
      })
      .map(_.name).toSet
    approx.foreach(n => System.err.println(
      s"[verify] $n ran its approximate branch at $sfDir; oracle withheld"))
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => wanted(k) }
      .filterNot { case (k, _) => approx.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable spec gates for the no_oracle queries (judge
    // round-4 item 5): the same bounds the spec suite asserts, emitted
    // as SPECGATES.json so the driver can track them like CORRECTNESS.
    // Skipped under a dev-loop subset (gates span many queries) or
    // SPARK_GRAFT_GATES=0. ALS fits reuse the query dump's cached
    // models, so this adds measurement, not refitting.
    if (only.isEmpty && sys.env.getOrElse("SPARK_GRAFT_GATES", "1") != "0") {
      val gates = Gates.all(spark, sfDir)
      Gates.writeJson(gates, s"$outDir/specgates.json", sfDir)
      try Gates.writeJson(gates, "SPECGATES.json", sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[gates] cwd write failed: ${e.getMessage}")
      }
      val failed = gates.filterNot(_.pass)
      if (failed.nonEmpty)
        System.err.println(s"[gates] FAILING: ${failed.map(_.query).mkString(", ")}")
    }
    spark.stop()
  }
}
