package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution primitive
  * (titles, product names, author strings) a curation stack runs
  * before merging records from different sources. Exact edit
  * distance with NO recall loss, and never a per-block cartesian.
  *
  * Four candidate schemes were built and MEASURED at the 10× scale
  * sweep (2.2M true pairs), because the right one is a property of
  * the data, not the algorithm:
  *
  *  1. [[blockedPairsNaive]] — whole-block join + length band:
  *     283 s. Block COUNT is fixed (25 brands), so block SIZE grows
  *     with the table and per-block work is quadratic.
  *  2. [[blockedPairsSegments]] — PassJoin segment signatures (Li,
  *     Deng & Feng, VLDB 2011): by pigeonhole a pair within distance
  *     d shares one of d+1 segments VERBATIM at a ±d-shifted
  *     position, so candidates are an equi join on segment content.
  *     Wins when strings are long and diverse — but these names are
  *     7–12 chars from a 92-word vocabulary: 600k probe segments
  *     collapse into 3,725 distinct keys (~72M collision candidates)
  *     and it measured 406 s — fanout paid, nothing pruned.
  *  3. [[blockedPairsBanded]] — length-bucketed band join: 304 s.
  *     The length spread is 6 values, so buckets barely split.
  *  4. [[blockedPairsDeletions]] (FastSS/SymSpell) — deletion
  *     neighborhoods: **27.5 s at 10×, 101.7 s at 30× — linear in
  *     the data**, the shipped short-string path. A variant key only
  *     matches strings sharing all-but-d characters, so candidates
  *     track true matches — and tail differences (the sweep's
  *     replica salts) share NO variant, exactly the collisions that
  *     drowned the other schemes. (First measurement was 85–117 s:
  *     Catalyst was silently BROADCASTING the exploded variant
  *     table — Generate inherits its child's size estimate — and at
  *     30× that 1 GB+ driver collect aborted outright; the
  *     shuffle_hash hint on the self-join is load-bearing.)
  *
  * [[blockedPairs]] dispatches: deletion neighborhoods for short
  * strings (avg ≤ 32 chars, d ≤ 2), the banded join otherwise. The
  * general lesson the sweep bought: candidate-scheme selectivity is
  * a property of the DATA's entropy and length — measure before
  * believing a signature scheme prunes. At 100 TB the other lever
  * is the caller's blocking key (block cardinality must grow with
  * the table; a fixed 25-way key is quadratic under every scheme).
  *
  * Verification everywhere is Spark's THRESHOLDED levenshtein —
  * banded O(len·d) DP with early exit (returns −1 past the bound),
  * not the full O(len²) table.
  *
  * The reference has no string-similarity surface; extension in the
  * dedup/ER direction.
  */
object FuzzyJoin {

  /** PassJoin-style segment-signature variant — the library path
    * for HIGH-ENTROPY strings, where segment content is selective
    * and candidates track true matches. Measured on THIS corpus's
    * 92-word vocabulary it LOSES to the bucketed block join (406 s
    * vs 283 s naive at the 10× sweep: 600k probe segments collapse
    * into 3,725 distinct keys, so collision candidates ≈ 72M and
    * the signature pays its fanout without pruning) — which is why
    * q124 ships on [[blockedPairs]] and this stays the documented,
    * parity-tested alternative. Output: (id_a, id_b, block, dist).
    */
  def blockedPairsSegments(df: DataFrame, idCol: String,
      blockCol: String, strCol: String, maxDist: Int): DataFrame = {
    val d = maxDist
    val k = d + 1
    val s = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      col(strCol).as("str"), length(col(strCol)).as("len"))

    // even segmentation of a length-`lp` string: the first (lp mod k)
    // segments get one extra char; pure integer arithmetic so both
    // roles derive identical boundaries
    def segLen(lp: Column, i: Column): Column =
      ((lp - pmod(lp, lit(k))) / k).cast("int") +
        when(i < pmod(lp, lit(k)), 1).otherwise(0)
    def segStart(lp: Column, i: Column): Column =
      (i * ((lp - pmod(lp, lit(k))) / k).cast("int") +
        least(i, pmod(lp, lit(k)))).cast("int")

    val segIdx = explode(sequence(lit(0), lit(k - 1)))

    // probe role: each string's own k segments, keyed by its length.
    // The content key ships as a 64-bit hash, not the substring: a
    // hash collision only adds a candidate the exact verify then
    // kills, so correctness is untouched and the shuffle rows shrink
    // to fixed-width columns.
    val probe = s
      .withColumn("i", segIdx)
      .select(col("block"), col("i"), col("len").as("lp"),
        xxhash64(col("str").substr(segStart(col("len"), col("i")) + 1,
          segLen(col("len"), col("i")))).as("seg"),
        col("id").as("pid"))

    // index role: for every probe length this string could pair with
    // (len−d … len), the substrings matching that segmentation over
    // the ±d position window. Fanout ≤ (d+1)·(d+1)·(2d+1) per row.
    val index = s
      .withColumn("lp",
        explode(sequence(greatest(col("len") - d, lit(1)), col("len"))))
      .withColumn("i", segIdx)
      .withColumn("sl", segLen(col("lp"), col("i")))
      .withColumn("st", segStart(col("lp"), col("i")))
      .withColumn("p", explode(
        when(least(col("len") - col("sl"), col("st") + d) >=
          greatest(col("st") - d, lit(0)),
          sequence(greatest(col("st") - d, lit(0)),
            least(col("len") - col("sl"), col("st") + d)))
          .otherwise(array().cast("array<int>"))))
      .select(col("block"), col("i"), col("lp"),
        xxhash64(col("str").substr(col("p") + 1, col("sl"))).as("seg"),
        col("id").as("iid"))

    // candidates ride as two longs (block re-derived at attach
    // time); shuffle_hash for the same Generate-underestimate reason
    // as the deletion path — never broadcast an exploded side
    val cand = probe.join(index.hint("shuffle_hash"),
        Seq("block", "i", "lp", "seg"))
      .filter(col("pid") =!= col("iid"))
      .select(least(col("pid"), col("iid")).as("id_a"),
        greatest(col("pid"), col("iid")).as("id_b"))
      .distinct()

    cand
      .join(s.select(col("id").as("id_a"), col("str").as("str_a"),
        col("block")), "id_a")
      .join(s.select(col("id").as("id_b"), col("str").as("str_b")),
        "id_b")
      .withColumn("dist",
        levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("block"), col("dist"))
  }

  /** All intra-block pairs of `df(idCol, blockCol, strCol)` with
    * levenshtein ≤ maxDist — the production entry point. Dispatches
    * between the two exact candidate schemes on measured string
    * length (see object doc for the sweep numbers behind the
    * split). Output: (id_a, id_b, block, dist).
    */
  def blockedPairs(df: DataFrame, idCol: String, blockCol: String,
      strCol: String, maxDist: Int): DataFrame = {
    // dispatch on measured string length (one driver-side scalar — a
    // control decision, same pattern as Scale.exactOk): deletion
    // neighborhoods fan out C(L,d) variants per string, unbeatable
    // for short strings and explosive for long ones
    if (maxDist <= 2) {
      val avgLen = df.agg(avg(length(col(strCol)))).head().getDouble(0)
      if (avgLen <= DeletionLenCutoff)
        return blockedPairsDeletions(df, idCol, blockCol, strCol,
          maxDist)
    }
    blockedPairsBanded(df, idCol, blockCol, strCol, maxDist)
  }

  /** Above this average length the deletion-variant fanout
    * (1 + L + C(L,2) keys per string at d=2) outgrows its
    * selectivity win and the banded join takes over.
    */
  val DeletionLenCutoff = 32.0

  /** Deletion-neighborhood candidates (FastSS — Bocek et al. 2007;
    * popularized as SymSpell): if lev(x,y) ≤ d, an optimal alignment
    * gives subsets of ≤ d positions whose deletion reduces BOTH
    * strings to their common aligned subsequence — so x and y share
    * an identical deletion variant, and candidates are an equi join
    * on (block, variant-hash). The decisive property on short
    * low-entropy strings (where segments and length bands are
    * useless — measured above): a variant key only matches strings
    * that genuinely share all-but-d characters, so candidate volume
    * tracks true matches (sweep numbers in the object doc).
    * Supports d ≤ 2.
    */
  private[graft] def blockedPairsDeletions(df: DataFrame, idCol: String,
      blockCol: String, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"deletion path supports d in 1..2, got $maxDist")
    // Input-split decoupling (round-9 StageProbe finding): scan
    // splits are sized by BYTES, but the ~80× variant explode below
    // makes this stage CPU-bound — a few-MB parquet yields ≤3 map
    // tasks and one ~58 s straggler that IS the 30× critical path
    // (task skew 12× inside the map stage; the reduce side was
    // clean). Spreading the narrow base across the full parallelism
    // costs a few-MB shuffle and buys explode/hash-build parallelism
    // independent of input bytes.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      col(strCol).as("str"), length(col(strCol)).as("len"))
    val s = if (base.rdd.getNumPartitions < par) base.repartition(par)
      else base
    // delete position p (0-based), 1-based substr arithmetic
    def del1(str: Column, len: Column, p: Column): Column =
      concat(str.substr(lit(1), p), str.substr(p + 2, len))
    def del2(str: Column, len: Column, p: Column, q: Column): Column =
      concat(str.substr(lit(1), p), str.substr(p + 2, q - p - 1),
        str.substr(q + 2, len))
    def seqOrEmpty(lo: Column, hi: Column): Column =
      when(hi >= lo, sequence(lo, hi)).otherwise(array().cast("array<int>"))
    // Volume-scaled join partitioning (r18, 100×-campaign find #3):
    // a ShuffledHashJoin build side cannot spill, so with the
    // session's fixed shuffle.partitions the per-partition build map
    // grows linearly with the corpus until it cannot acquire memory
    // — at 100× (2M parts, ~480M variant rows, 32 partitions) the
    // build needed ~15M rows/partition and the job died with
    // "not enough memory to build hash map" (30×'s ~4.5M fit). The
    // variant volume is known in closed form (1+L at d=1,
    // 1+L+C(L,2) at d=2), so one cheap single-column agg sizes the
    // exchange to ≤ ~2M build rows per partition — the density the
    // measured-safe 30× point ran well under — and the same plan
    // that serves the bench unchanged (est below the floor keeps
    // the session's partition count) survives any corpus the memory
    // can hold. Real-cluster note: this is exactly what AQE's
    // target-size coalescing does for SMJ, but SHJ build sides are
    // sized by ROWS, not post-shuffle bytes, so the explicit count
    // is the honest knob.
    val fanout =
      if (maxDist == 1) lit(1) + col("len")
      else lit(1) + col("len") +
        col("len") * (col("len") - lit(1)) / lit(2)
    val estVariants = base.agg(sum(fanout).cast("long"))
      .head().getLong(0)
    val sessParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val joinParts = math.max(sessParts, math.min(4096,
      (estVariants / 2000000L).toInt + 1))
    // SHUFFLE_HASH hint, load-bearing: Catalyst's size estimate for
    // a Generate (explode) is its CHILD's size, so the ~80×-fanout
    // variant table inherits the parquet scan's few-MB estimate and
    // the planner broadcasts one side of this self-join — at the 30×
    // sweep that "broadcast" is a >1 GB driver collect that aborts
    // the job (spark.driver.maxResultSize). The hint pins the
    // correct co-partitioned hash join on (block, vh).
    //
    // Both sides are Dataset ALIASES of the same `variants` plan, so
    // the two shuffle exchanges are sameResult and ReuseExchange
    // computes the explode + xxhash64 + shuffle-write ONCE — the
    // prior spelling renamed id→id_b BELOW the exchange, which broke
    // sameResult and ran the ~80× explode twice, once per join side
    // (two ~equal 96-task CPU-bound map stages, ~75% of the query's
    // task time — StageProbe r13). Two rejected alternatives from
    // the same probe session: localCheckpoint between explode and
    // join (trades recompute for a serial materialize+rescan, no
    // wall win at 1×), and collect_set + intra-group pair-gen (one
    // pass at 1×, but ObjectHashAggregate's sort-based fallback
    // fires at 128 distinct keys, and sorting the 48M-row variant
    // stream measured 240 s at the 10× sweep vs ~35 s for the join
    // on the SAME loaded host session — the quiet-host join figure
    // was 27.5 s, not comparable across sessions; SWEEP_r13).
    // First-shared-variant dedup (r18 sweep's documented next lever,
    // engaged above ~1e8 variants): at 100× the pre-distinct
    // candidate stream carried every (pair × shared-variant)
    // duplicate into the dedup hash agg — a deterministic 13.2 GB
    // graceful spill that was the whole top-decade excess. The LSH
    // first-band trick (q36) generalizes: a pair survives ONLY on
    // its minimal shared variant hash, so uniqueness holds by
    // construction and the distinct() exchange disappears. Three
    // structural changes in this regime, none semantic:
    //  1. per-side duplicate variants (repeated characters make two
    //     deletion positions collide) die in-row via array_distinct
    //     over a per-string variant-hash ARRAY — no exchange;
    //  2. each side carries its short string through the join
    //     (~+30 B/row — the dispatch guard already bounds this path
    //     to avg ≤ 32 chars), so the min-shared-hash filter can
    //     recompute both variant arrays per candidate row
    //     (codegen'd transform/xxhash64 — CPU traded for the spill)
    //     AND the verify runs inline, deleting both attach joins;
    //  3. output rows are unique by construction: min(Va ∩ Vb) is
    //     emitted by both sides exactly once, so exactly one
    //     candidate row per pair passes — recall is unaffected even
    //     under hash collisions (a colliding candidate is killed by
    //     the exact levenshtein, and a true pair's surviving row is
    //     a true join match by membership of the min in both sets).
    // Below the cutover the r13-audited plan (ReuseExchange over the
    // union-generated variants + distinct) serves unchanged — at
    // bench scale the duplicate stream is small and the recompute
    // would be pure overhead. `spark.graft.fuzzy.firstVariantDedup`
    // ∈ {auto, always, never} overrides for testing; FuzzyJoinSpec
    // pins cross-regime parity.
    def variantHashArray(str: Column, len: Column): Column = {
      val v0 = array(xxhash64(str))
      val v1 = transform(seqOrEmpty(lit(0), len - 1),
        p => xxhash64(del1(str, len, p)))
      val all =
        if (maxDist == 1) concat(v0, v1)
        else concat(v0, v1,
          flatten(transform(seqOrEmpty(lit(0), len - 2), p =>
            transform(seqOrEmpty(p + 1, len - 1),
              q => xxhash64(del2(str, len, p, q))))))
      array_distinct(all)
    }
    val firstVariantDedup = df.sparkSession.conf
      .getOption("spark.graft.fuzzy.firstVariantDedup")
      .getOrElse("auto") match {
      case "always" => true
      case "never" => false
      case _ => estVariants > 100000000L
    }
    if (firstVariantDedup) {
      val varr = s
        .withColumn("vh",
          explode(variantHashArray(col("str"), col("len"))))
        .select(col("block"), col("vh"), col("id"), col("str"),
          col("len"))
      val parted = varr.repartition(joinParts, col("block"), col("vh"))
      parted.as("a")
        .join(parted.as("b").hint("shuffle_hash"),
          col("a.block") === col("b.block") &&
            col("a.vh") === col("b.vh"))
        .filter(col("a.id") < col("b.id"))
        // exact verify first (banded O(len·d), cheaper per row than
        // the ~2·|variants| rehash below), min-shared-hash second
        .withColumn("dist",
          levenshtein(col("a.str"), col("b.str"), maxDist))
        .filter(col("dist") >= 0)
        .filter(col("a.vh") === array_min(array_intersect(
          variantHashArray(col("a.str"), col("a.len")),
          variantHashArray(col("b.str"), col("b.len")))))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.block").as("block"), col("dist"))
    } else {
      // One Generate over the per-row variant-hash ARRAY (r20), not
      // the former 3-way union of explode branches: the union spelled
      // the same variant set as three map stages (3× the scan of the
      // repartitioned base, 3× the per-task overhead, three
      // shuffle-write sides feeding the join exchange), where a
      // single explode(array_distinct(...)) emits it in one pass.
      // Output-identical: per-side duplicate variant hashes (repeated
      // characters make two deletion positions collide) only ever
      // produced duplicate CANDIDATE rows, which the candidate
      // `distinct()` below erased — array_distinct erases them one
      // operator earlier, shrinking the join input as a bonus.
      // FuzzyJoinSpec pins parity against the naive quadratic join.
      val variants = s
        .select(col("block"), col("id"),
          explode(variantHashArray(col("str"), col("len"))).as("vh"))
      val parted = variants.repartition(joinParts, col("block"), col("vh"))
      val cand = parted.as("a")
        .join(parted.as("b").hint("shuffle_hash"),
          col("a.block") === col("b.block") && col("a.vh") === col("b.vh"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      cand
        .join(s.select(col("id").as("id_a"), col("str").as("str_a"),
          col("block")), "id_a")
        .join(s.select(col("id").as("id_b"), col("str").as("str_b")),
          "id_b")
        .withColumn("dist",
          levenshtein(col("str_a"), col("str_b"), maxDist))
        .filter(col("dist") >= 0)
        .select(col("id_a"), col("id_b"), col("block"), col("dist"))
    }
  }

  /** Banded block join sub-bucketed by length — the long-string
    * path. Output: (id_a, id_b, block, dist).
    */
  private[graft] def blockedPairsBanded(df: DataFrame, idCol: String,
      blockCol: String, strCol: String, maxDist: Int): DataFrame = {
    val bw = 2 * maxDist + 1
    val s = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      col(strCol).as("str"), length(col(strCol)).as("len"))
    val probe = s
      .withColumn("bkt", explode(array_distinct(array(
        floor((col("len") - maxDist).cast("double") / bw).cast("int"),
        floor((col("len") + maxDist).cast("double") / bw).cast("int")))))
      .select(col("block"), col("bkt"), col("id").as("id_a"),
        col("str").as("str_a"), col("len").as("len_a"))
    val index = s
      .withColumn("bkt",
        floor(col("len").cast("double") / bw).cast("int"))
      .select(col("block"), col("bkt"), col("id").as("id_b"),
        col("str").as("str_b"), col("len").as("len_b"))
    probe.join(index, Seq("block", "bkt"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist",
        levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("block"), col("dist"))
  }

  /** The first-cut quadratic spelling (whole-block join + length
    * band), kept as the independent parity oracle for the two
    * candidate schemes\' zero-recall-loss claims (FuzzyJoinSpec).
    */
  private[graft] def blockedPairsNaive(df: DataFrame, idCol: String,
      blockCol: String, strCol: String, maxDist: Int): DataFrame = {
    val s = df.select(col(idCol).as("id"), col(blockCol).as("block"),
      col(strCol).as("str"), length(col(strCol)).as("len"))
    val a = s.select(col("block"), col("id").as("id_a"),
      col("str").as("str_a"), col("len").as("len_a"))
    val b = s.select(col("block"), col("id").as("id_b"),
      col("str").as("str_b"), col("len").as("len_b"))
    a.join(b, "block")
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist",
        levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("block"), col("dist"))
  }

  /** q124 — near-identical part names within a brand block at edit
    * distance ≤ 2 (the oracle applies the identical blocking, so
    * candidate-scheme parity is exactly the zero-recall-loss claim).
    */
  val fuzzyJoinQ: QueryDef = QueryDef.sql(
    "q124_fuzzy_string_join",
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  a.p_brand AS block,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
      | FROM part a JOIN part b ON a.p_brand = b.p_brand
      |  AND a.p_partkey < b.p_partkey
      |  AND abs(len(a.p_name) - len(b.p_name)) <= 2
      | WHERE levenshtein(a.p_name, b.p_name) <= 2
      | ORDER BY id_a, id_b""".stripMargin.replaceAll("\n", "")
  ) { (s, d) =>
    blockedPairs(Tables.part(s, d), "p_partkey", "p_brand", "p_name", 2)
      .orderBy("id_a", "id_b")
  }

  val defs: Seq[QueryDef] = Seq(fuzzyJoinQ)
}
