package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.QuerySpec

/** Deduplication operators for large-scale training-data pipelines —
  * the LLM-ops extension beyond the reference's own surface (SURVEY §7,
  * llmops module). Every operator is designed 100 TB-first:
  *
  *  - exact dedup = hash-groupBy (one shuffle on the normalized key);
  *  - MinHash+LSH = shingle → signature → band-bucket join: candidate
  *    generation cost is O(docs × bands), never O(docs²) — the shuffle key
  *    is the band hash, and only bucket-colliding pairs are verified;
  *  - SimHash = per-row 64-bit signature + byte-pigeonhole bucket join
  *    (hamming ≤ 7 is guaranteed to collide on ≥ 1 of 8 bytes);
  *  - n-gram Jaccard = exact verification over MinHash-band candidate
  *    blocks (never all-pairs within a raw partition key);
  *  - embedding near-dup = exact cosine over hyperplane-LSH candidate
  *    blocks, with the semantic key (label) demoted to a secondary key.
  *
  * Every candidate-expansion stage goes through [[boundedPairs]], which
  * triangle-salts oversized blocks so per-task memory and pair compute
  * stay capped no matter how degenerate the key distribution is.
  *
  * All hash functions are seeded deterministic (xxhash64), so results are
  * identical on 1 or 10,000 partitions.
  */
object Dedup {

  /** Candidate-pair expansion from blocking keys with a HARD per-task
    * bound, the skew armor for every verify stage here: a degenerate
    * block (identical boilerplate, one dominant label) must not become
    * one task holding k ids and computing k² pairs.
    *
    * Input: columns (`bkey`: any blocking key, `id`: bigint). Output:
    * distinct (id_a < id_b) pairs of ids sharing a bkey — EXACTLY the
    * pairs of the naive per-block expansion, independent of `cap`.
    *
    * Blocks over `cap` are triangle-salted: each id gets a deterministic
    * salt g ∈ [0, s) with s = ceil(size/cap) and is replicated into the
    * s sub-blocks (min(g,b), max(g,b)); a pair with salts (gᵢ, gⱼ) meets
    * in exactly the sub-block (min, max), so recall is 100% while every
    * collected array stays ≤ ~2·cap regardless of block size. Total pair
    * work is unchanged (the candidate set itself is quadratic in a
    * degenerate block — that is inherent) but it is now spread across s²
    * bounded tasks instead of one unbounded one. Block sizes come from a
    * map-side-combined groupBy + join (not a window, which would buffer
    * the whole degenerate block in one partition; the join is AQE
    * skew-splittable). */
  def boundedPairs(keyed: DataFrame, cap: Int): DataFrame = {
    val sizes = keyed.groupBy("bkey").agg(count(lit(1)).as("cnt"))
    val salted = keyed.join(sizes, Seq("bkey"))
      .withColumn("s", ceil(col("cnt").cast("double") / cap).cast("int"))
      .withColumn("g", pmod(xxhash64(col("id")), col("s")).cast("int"))
    salted
      .select(col("bkey"), col("id"), col("g"), explode(expr("sequence(0, s - 1)")).as("b"))
      .select(col("bkey"), least(col("g"), col("b")).as("bi"),
        greatest(col("g"), col("b")).as("bj"), col("id"), col("g"))
      .groupBy(col("bkey"), col("bi"), col("bj"))
      .agg(
        sort_array(collect_list(when(col("g") === col("bi"), col("id")))).as("ls"),
        sort_array(collect_list(when(col("g") === col("bj"), col("id")))).as("rs"))
      .select(explode(expr(
        "flatten(transform(ls, x -> transform(rs, y -> named_struct('a', least(x, y), 'b', greatest(x, y)))))")).as("p"))
      .filter(col("p.a") < col("p.b"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
  }

  /** Exact deduplication on normalized text (lowercase + whitespace
    * collapse): the survivors-per-language report. One hash shuffle. */
  val q80Exact: QuerySpec = QuerySpec.sql2(
    "q80_dedup_exact",
    """SELECT lang,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT regexp_replace(lower(text), ' +', ' ')) AS n_unique,
      |  COUNT(*) - COUNT(DISTINCT regexp_replace(lower(text), ' +', ' ')) AS n_dups
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin,
    """SELECT lang,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT regexp_replace(lower(text), ' +', ' ', 'g')) AS n_unique,
      |  COUNT(*) - COUNT(DISTINCT regexp_replace(lower(text), ' +', ' ', 'g')) AS n_dups
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin)

  /** Spark-side word-3-gram shingle set (distinct, hashed to i64) — a
    * single-pass custom expression (graft.functions.Shingles64). */
  private val shingleSql = "shingles64(text)"

  /** MinHash + LSH near-duplicate pairs at Jaccard ≥ 0.8.
    *
    * Pipeline: shingle (word 3-grams, hashed) → 64-hash MinHash signature
    * → 16 bands × 4 rows → band-bucket self-join → exact-Jaccard verify.
    * With r=4, b=16 a pair at J=0.9 is missed with prob (1-0.9⁴)¹⁶ ≈ 4e-8,
    * so the exact all-pairs DuckDB oracle is a safe differential check at
    * test scale while the Spark plan stays O(n·bands) at 100 TB. */
  val q81MinHashLsh: QuerySpec = QuerySpec(
    "q81_dedup_minhash_lsh",
    """WITH g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text,' ')) < 3 THEN [text]
      |         ELSE list_distinct(list_transform(range(len(string_split(text,' ')) - 2),
      |           i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) END AS sh
      |  FROM documents)
      |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
      |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / len(list_distinct(a.sh || b.sh)), 4) AS jaccard
      |FROM g a JOIN g b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |      / len(list_distinct(a.sh || b.sh)) >= 0.8
      |ORDER BY doc_id_a, doc_id_b""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    // 64 minhashes in one pass (graft.functions.MinHash64); band b hashes
    // signature rows [4b, 4b+4). ONE corpus-wide shingle+signature pass:
    // buckets are formed by groupBy (not a self-join, which would evaluate
    // the whole upstream twice), pairs expand inside each bucket, and the
    // exact-Jaccard verify recomputes shingles only for the (few)
    // candidate docs after a broadcast semi-join. Bucket pair expansion is
    // O(k²) in bucket size — at larger scale cap/salt degenerate buckets
    // (a bucket of identical boilerplate) before expanding.
    val bands = sp.table("documents")
      .select(col("doc_id"),
        posexplode(expr(s"lshbands64(minhash64($shingleSql))")).as(Seq("band", "key")))
    // localCheckpoint: `pairs` is consumed three times below (both candId
    // branches + the verify join) — without materialization the whole
    // corpus scan+shuffle pipeline would re-execute per consumer.
    val pairs = bands
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, x -> transform(ids, y -> named_struct('a', x, 'b', y))))")).as("p"))
      .filter(col("p.a") < col("p.b"))
      .select(col("p.a").as("doc_id_a"), col("p.b").as("doc_id_b"))
      .distinct()
      .localCheckpoint()
    val candIds = pairs.select(col("doc_id_a").as("doc_id"))
      .union(pairs.select(col("doc_id_b").as("doc_id"))).distinct()
    val g = sp.table("documents")
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), expr(shingleSql).as("sh"))
    pairs
      .join(g.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a")), Seq("doc_id_a"))
      .join(g.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b")), Seq("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("j"))
      .filter(col("j") >= 0.8)
      .select(col("doc_id_a"), col("doc_id_b"), round(col("j"), 4).as("jaccard"))
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  /** SimHash near-duplicate pairs: per-row 64-bit signature over word
    * hashes (custom Expression, graft.functions.SimHash64), then a
    * byte-pigeonhole bucket join — any pair at hamming ≤ 7 shares at
    * least one of the 8 signature bytes, so candidate generation is
    * O(docs × 8), not O(docs²), with 100% recall (≤7 flipped bits
    * cannot touch all 8 bytes). Because recall is exact, the all-pairs
    * DuckDB oracle is the *same* result set, not an approximation: the
    * oracle re-derives the per-word FNV-1a 64 feature hash in HUGEINT
    * (the q120 recipe), takes the bit-majority per doc, and compares
    * every pair's popcount(xor). Word hash is our portable fnv_hash —
    * deterministic across engines and partitionings. */
  val q82SimHash: QuerySpec = {
    // ASCII-corpus assumption: this oracle hashes per-CHARACTER code
    // points (ascii(substr(...))), while Spark's fnv_hash hashes UTF-8
    // BYTES — identical only while every word is pure ASCII, which the
    // synthetic documents fixture guarantees (TESTDATA.md). DuckDB
    // cannot subscript BLOB bytes, so a byte-exact replay would need a
    // manual code-point→UTF-8 expansion (see q120's explicit byte-image
    // recipe for the general pattern). Revisit if the fixture ever
    // grows non-ASCII words.
    val fnvWord =
      """list_reduce(list_prepend(CAST('14695981039346656037' AS HUGEINT),
        |      list_transform(range(length(word)), i -> CAST(ascii(substr(word, CAST(i+1 AS INT), 1)) AS HUGEINT))),
        |      (h, x) -> ((h - (h % 256) + xor(CAST(h % 256 AS BIGINT), CAST(x AS BIGINT))) * 1099511628211)
        |                % CAST('18446744073709551616' AS HUGEINT))""".stripMargin
    def signed(h: String): String =
      s"""CAST(CASE WHEN $h >= CAST('9223372036854775808' AS HUGEINT)
         |          THEN $h - CAST('18446744073709551616' AS HUGEINT) ELSE $h END AS BIGINT)""".stripMargin
    QuerySpec(
      "q82_dedup_simhash",
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |h AS (
         |  SELECT doc_id, ${signed(fnvWord)} AS h FROM w),
         |bits AS (
         |  SELECT doc_id, r.b,
         |    SUM(CASE WHEN ((h >> r.b) & 1) = 1 THEN 1 ELSE -1 END) AS cnt
         |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) r
         |  GROUP BY doc_id, r.b),
         |sig AS (
         |  SELECT doc_id,
         |    ${signed("SUM(CASE WHEN cnt > 0 THEN (CAST(1 AS HUGEINT) << b) ELSE CAST(0 AS HUGEINT) END)")} AS sh
         |  FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         |  bit_count(xor(a.sh, b.sh)) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh, b.sh)) <= 7
         |ORDER BY doc_id_a, doc_id_b""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val docs = sp.table("documents").select(col("doc_id"),
      expr("simhash64(transform(split(text, ' '), w -> fnv_hash(w)))").as("sh"))
    val bytes = docs.select(col("doc_id"), col("sh"),
      explode(expr(
        "transform(sequence(0, 7), i -> named_struct('bi', i, 'bv', (sh >> (i * 8)) & 255))")).as("bk"))
      .select(col("doc_id"), col("sh"), col("bk.bi").as("bi"), col("bk.bv").as("bv"))
    val a = bytes.select(col("bi"), col("bv"), col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
    val b = bytes.select(col("bi"), col("bv"), col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bi", "bv"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 7)
      .orderBy(col("doc_id_a"), col("doc_id_b"))
    }
  }

  /** Exact character-3-gram Jaccard near-duplicate pairs within a
    * `source` (threshold 0.6). The pair space is NOT all-pairs-per-
    * source (a dominant crawl source would make that O(k²) over most of
    * the corpus): candidates come from MinHash band buckets — 64 bands
    * of width 1 over the fnv-hashed gram set, keyed (band, minhash,
    * source) — expanded through [[boundedPairs]], then exact Jaccard
    * verifies only the colliding pairs. A pair at J ≥ 0.6 shares a
    * given minhash with prob ≥ 0.6, so it is missed by all 64 bands
    * with prob ≤ 0.4⁶⁴ ≈ 1e-25: the exact all-pairs DuckDB oracle
    * remains a safe differential check while the Spark plan stays
    * O(docs × 64) with bounded per-task blocks at 100 TB. */
  val q83NgramJaccard: QuerySpec = {
    val grams = "array_distinct(transform(sequence(0, length(text) - 3), i -> substr(text, i + 1, 3)))"
    QuerySpec(
      "q83_dedup_ngram_jaccard",
      """WITH g AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(length(text) - 2),
        |      i -> substr(text, i + 1, 3))) AS gr
        |  FROM documents)
        |SELECT a.source AS source, a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |  ROUND(CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
        |        / len(list_distinct(a.gr || b.gr)), 4) AS jaccard3
        |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
        |      / len(list_distinct(a.gr || b.gr)) >= 0.6
        |ORDER BY source, doc_id_a, doc_id_b""".stripMargin) { (s, dir) =>
      val sp = QuerySpec.prepared(s, dir)
      val keyed = sp.table("documents")
        .filter(col("source").isNotNull)
        .select(col("doc_id"), col("source"),
          posexplode(expr(s"minhash64(transform($grams, g -> fnv_hash(g)))")).as(Seq("band", "key")))
        .select(struct(col("band"), col("key"), col("source")).as("bkey"),
          col("doc_id").as("id"))
      val pairs = boundedPairs(keyed, cap = 256).localCheckpoint()
      val candIds = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b").as("doc_id"))).distinct()
      val g = sp.table("documents")
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), expr(grams).as("gr"))
      pairs
        .join(g.select(col("doc_id").as("id_a"), col("source"), col("gr").as("gr_a")), Seq("id_a"))
        .join(g.select(col("doc_id").as("id_b"), col("gr").as("gr_b")), Seq("id_b"))
        .select(col("source"), col("id_a"), col("id_b"),
          (size(array_intersect(col("gr_a"), col("gr_b"))).cast("double") /
            size(array_union(col("gr_a"), col("gr_b")))).as("j"))
        .filter(col("j") >= 0.6)
        .select(col("source"), col("id_a").as("doc_id_a"), col("id_b").as("doc_id_b"),
          round(col("j"), 4).as("jaccard3"))
        .orderBy(col("source"), col("doc_id_a"), col("doc_id_b"))
    }
  }

  /** Embedding cosine near-duplicates within a `label` (threshold 0.4),
    * double-precision dot/norms evaluated element-in-order on both
    * engines so values agree bit-for-bit before rounding.
    *
    * The pair space is NOT all-pairs-per-label (one dominant label makes
    * that O(k²)): candidates come from random-hyperplane LSH — 32 bands
    * of 2 sign bits each, hyperplane component (k, i) = ±1 from the
    * parity of xxhash64(k*64 + i) — keyed (band, 2-bit key, label) and
    * expanded through [[boundedPairs]]; exact cosine then verifies only
    * colliding pairs. NOT fnv parity (the q86 seed recipe): FNV-1a's low
    * bit is linear in its input bytes (lsb(h·odd prime) = lsb(h), so the
    * parity is just XOR of the seed's byte lsbs), which makes fnv-parity
    * hyperplanes over consecutive seeds collapse to ONE hyperplane up to
    * global sign; xxhash64's avalanche finalizer gives independent sign
    * bits. The oracle never replays the hyperplanes (it is exact
    * all-pairs), so hash portability does not matter here — only
    * determinism and independence do.
    * A pair at cos ≥ 0.4 disagrees on one hyperplane bit with prob
    * acos(0.4)/π ≈ 0.369, so it collides in a band with prob 0.631² ≈
    * 0.398 and is missed by all 32 bands with prob 0.602³² ≈ 9e-8 — the
    * exact all-pairs DuckDB oracle stays a safe differential check while
    * the Spark plan is O(vecs × 32) with bounded blocks. */
  val q84EmbeddingCosine: QuerySpec = QuerySpec(
    "q84_dedup_embedding_cosine",
    """SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
      |  ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
      |ORDER BY label, id_a, id_b""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val bitsSql =
      """transform(sequence(0, 63), k ->
        |  CASE WHEN aggregate(
        |    zip_with(v, sequence(0, size(v) - 1), (x, i) ->
        |      CASE WHEN pmod(xxhash64(CAST(k * 64 + i AS BIGINT)), 2) = 0 THEN x ELSE -x END),
        |    0D, (acc, p) -> acc + p) > 0 THEN 1L ELSE 0L END)""".stripMargin
    val e = sp.table("embeddings")
      .filter(col("label").isNotNull)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val keyed = e.withColumn("bits", expr(bitsSql))
      .select(col("vec_id"), col("label"),
        posexplode(expr("transform(sequence(0, 31), b -> bits[2*b] * 2 + bits[2*b+1])"))
          .as(Seq("band", "key")))
      .select(struct(col("band"), col("key"), col("label")).as("bkey"),
        col("vec_id").as("id"))
    val pairs = boundedPairs(keyed, cap = 256).localCheckpoint()
    val candIds = pairs.select(col("id_a").as("vec_id"))
      .union(pairs.select(col("id_b").as("vec_id"))).distinct()
    val ev = e.join(broadcast(candIds), Seq("vec_id"), "left_semi")
    pairs
      .join(ev.select(col("vec_id").as("id_a"), col("label"), col("v").as("v_a")), Seq("id_a"))
      .join(ev.select(col("vec_id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .select(col("label"), col("id_a"), col("id_b"), expr("vec_cosine(v_a, v_b)").as("c"))
      .filter(col("c") >= 0.4)
      .select(col("label"), col("id_a"), col("id_b"), round(col("c"), 6).as("cos"))
      .orderBy(col("label"), col("id_a"), col("id_b"))
  }

  /** Connected components by min-label propagation iterated TO FIXPOINT:
    * each round every node adopts the smallest label among itself and
    * its neighbors; the loop stops when a round changes zero labels, so
    * a path component of any diameter converges (a fixed round count
    * silently under-merges anything longer — caught at test scale by
    * the WITH RECURSIVE oracle, but not at 100 TB where there is no
    * oracle). One join + groupBy per round plus an O(1)-result count
    * action for the convergence probe; labels are localCheckpoint-ed so
    * lineage stays flat. Rounds needed = component diameter + 1. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    var labels = edges.select(col("src").as("doc_id"), col("src").as("cluster"))
      .unionAll(edges.select(col("dst").as("doc_id"), col("dst").as("cluster")))
      .groupBy("doc_id").agg(min("cluster").as("cluster"))
      .localCheckpoint()
    var converged = false
    while (!converged) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .select(col("src").as("doc_id"), col("cluster"))
      val next = labels.unionAll(viaNeighbor)
        .groupBy("doc_id").agg(min("cluster").as("cluster"))
        .localCheckpoint()
      converged = next
        .join(labels.withColumnRenamed("cluster", "prev"), Seq("doc_id"))
        .filter(col("cluster") =!= col("prev"))
        .isEmpty
      labels = next
    }
    labels
  }

  /** Near-duplicate clusters: [[connectedComponents]] over the verified
    * MinHash pairs — near-dup components at J ≥ 0.8 are clique-like
    * (diameter 1-2), so the fixpoint loop typically runs 2-3 rounds, but
    * an adversarially long chain now converges instead of under-merging.
    * Output: every clustered doc with its canonical (min) id, so "keep
    * one per cluster" is a filter on doc_id = cluster_id. */
  val q79DedupClusters: QuerySpec = QuerySpec(
    "q79_dedup_clusters",
    // Oracle: exact all-pairs Jaccard (the q81 oracle shape) → undirected
    // edge list with self-loops → WITH RECURSIVE transitive closure →
    // min reachable id per node. The closure is the ground-truth fixpoint,
    // so this also guards the iteration count of the Spark side's label
    // propagation (a component with diameter > 6 would diverge from it).
    """WITH RECURSIVE g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text,' ')) < 3 THEN [text]
      |         ELSE list_distinct(list_transform(range(len(string_split(text,' ')) - 2),
      |           i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) END AS sh
      |  FROM documents),
      |p AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / len(list_distinct(a.sh || b.sh)) >= 0.8),
      |edges AS (
      |  SELECT a AS src, b AS dst FROM p
      |  UNION SELECT b, a FROM p
      |  UNION SELECT a, a FROM p
      |  UNION SELECT b, b FROM p),
      |reach AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
      |SELECT src AS doc_id, MIN(dst) AS cluster, (src = MIN(dst)) AS is_canonical
      |FROM reach GROUP BY src ORDER BY cluster, doc_id""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val pairs = q81MinHashLsh.run(sp, dir).select("doc_id_a", "doc_id_b")
    // undirected edge list incl. self-loops so isolated-after-filter docs
    // keep their own label; checkpointed — reused every round
    val edges = pairs.select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
      .unionAll(pairs.select(col("doc_id_b").as("src"), col("doc_id_a").as("dst")))
      .localCheckpoint()
    connectedComponents(edges)
      .withColumn("is_canonical", col("doc_id") === col("cluster"))
      .orderBy("cluster", "doc_id")
  }

  /** Cross-language near-dup report: operator composition — the verified
    * LSH pairs joined back to document metadata, counting same- vs
    * cross-language duplicate pairs (the translation-leakage check of a
    * curation pipeline). The oracle recomputes from exact all-pairs
    * Jaccard, so it also re-validates LSH completeness. */
  val q101CrossLang: QuerySpec = QuerySpec(
    "q101_dedup_crosslang",
    """WITH g AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN len(string_split(text,' ')) < 3 THEN [text]
      |         ELSE list_distinct(list_transform(range(len(string_split(text,' ')) - 2),
      |           i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) END AS sh
      |  FROM documents),
      |p AS (
      |  SELECT a.lang AS lang_a, b.lang AS lang_b
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |        / len(list_distinct(a.sh || b.sh)) >= 0.8)
      |SELECT (lang_a = lang_b) AS same_lang, COUNT(*) AS n_pairs
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val langs = sp.table("documents").select(col("doc_id"), col("lang"))
    q81MinHashLsh.run(sp, dir)
      .join(langs.select(col("doc_id").as("doc_id_a"), col("lang").as("lang_a")), Seq("doc_id_a"))
      .join(langs.select(col("doc_id").as("doc_id_b"), col("lang").as("lang_b")), Seq("doc_id_b"))
      .groupBy((col("lang_a") === col("lang_b")).as("same_lang"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("same_lang"))
  }

  /** Incremental dedup: a NEW batch (doc_id % 10 = 9, standing in for
    * "this week's crawl") is LSH-probed against the EXISTING corpus —
    * only the delta is shingled, signed, and joined, never
    * delta × delta or corpus × corpus. This is the shape that keeps a
    * 100 TB corpus maintainable: the standing corpus contributes its
    * (band, key) index (in production: precomputed and stored), the
    * delta streams through it, and the exact verify touches only
    * colliding pairs. Same 16×4 band scheme and the same exact
    * all-pairs oracle argument as [[q81MinHashLsh]], restricted to
    * new × old pairs. */
  val q151IncrementalDedup: QuerySpec = QuerySpec(
    "q151_dedup_incremental",
    """WITH g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text,' ')) < 3 THEN [text]
      |         ELSE list_distinct(list_transform(range(len(string_split(text,' ')) - 2),
      |           i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3])) END AS sh
      |  FROM documents)
      |SELECT n.doc_id AS new_doc_id, o.doc_id AS dup_of,
      |  ROUND(CAST(len(list_intersect(n.sh, o.sh)) AS DOUBLE)
      |        / len(list_distinct(n.sh || o.sh)), 4) AS jaccard
      |FROM g n JOIN g o ON n.doc_id % 10 = 9 AND o.doc_id % 10 <> 9
      |WHERE CAST(len(list_intersect(n.sh, o.sh)) AS DOUBLE)
      |      / len(list_distinct(n.sh || o.sh)) >= 0.8
      |ORDER BY new_doc_id, dup_of""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val bands = sp.table("documents")
      .select(col("doc_id"),
        posexplode(expr(s"lshbands64(minhash64($shingleSql))")).as(Seq("band", "key")))
    val newB = bands.filter(col("doc_id") % 10 === 9)
      .select(col("doc_id").as("new_doc_id"), col("band"), col("key"))
    val oldB = bands.filter(col("doc_id") % 10 =!= 9)
      .select(col("doc_id").as("dup_of"), col("band"), col("key"))
    val pairs = newB.join(oldB, Seq("band", "key"))
      .select(col("new_doc_id"), col("dup_of"))
      .distinct()
      .localCheckpoint()
    val candIds = pairs.select(col("new_doc_id").as("doc_id"))
      .union(pairs.select(col("dup_of").as("doc_id"))).distinct()
    val g = sp.table("documents")
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), expr(shingleSql).as("sh"))
    pairs
      .join(g.select(col("doc_id").as("new_doc_id"), col("sh").as("sh_n")), Seq("new_doc_id"))
      .join(g.select(col("doc_id").as("dup_of"), col("sh").as("sh_o")), Seq("dup_of"))
      .select(col("new_doc_id"), col("dup_of"),
        (size(array_intersect(col("sh_n"), col("sh_o"))).cast("double") /
          size(array_union(col("sh_n"), col("sh_o")))).as("j"))
      .filter(col("j") >= 0.8)
      .select(col("new_doc_id"), col("dup_of"), round(col("j"), 4).as("jaccard"))
      .orderBy(col("new_doc_id"), col("dup_of"))
  }

  /** Corpus-version diff: two corpus versions (v1 = all docs, v2 = docs
    * surviving a re-crawl filter with some texts "revised") compared by
    * full outer join on doc_id + content-hash equality — the dataset-
    * versioning report (added/removed/changed/unchanged) that gates an
    * incremental training-data release. One doc_id-keyed shuffle; text
    * equality is compared through a hash, never by shipping both texts
    * to one node. */
  val q152CorpusDiff: QuerySpec = QuerySpec.sql(
    "q152_corpus_diff",
    """WITH v1 AS (SELECT doc_id, md5(text) AS h FROM documents
      |            WHERE doc_id % 7 <> 0),
      |v2 AS (SELECT doc_id,
      |         md5(CASE WHEN doc_id % 11 = 0 THEN concat(text, ' rev2')
      |                  ELSE text END) AS h
      |       FROM documents WHERE doc_id % 5 <> 0)
      |SELECT status, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
      |FROM (
      |  SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
      |    CASE WHEN v1.doc_id IS NULL THEN 'added'
      |         WHEN v2.doc_id IS NULL THEN 'removed'
      |         WHEN v1.h <> v2.h THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id) t
      |GROUP BY status
      |ORDER BY status""".stripMargin)

  val all: Seq[QuerySpec] = Seq(
    q80Exact, q81MinHashLsh.benched, q82SimHash, q83NgramJaccard,
    q84EmbeddingCosine.benched, q79DedupClusters, q101CrossLang,
    q151IncrementalDedup, q152CorpusDiff)
}
