package graft.llmops

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
  *  - n-gram Jaccard = exact verification, blocked by a partition key so
  *    the pair space stays bounded per block;
  *  - embedding near-dup = cosine within a blocking key (label/LSH bucket).
  *
  * All hash functions are seeded deterministic (xxhash64), so results are
  * identical on 1 or 10,000 partitions.
  */
object Dedup {

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

  /** Exact character-3-gram Jaccard, blocked by `source` (the bounded
    * verify stage of a dedup pipeline — per-block pair space only). */
  val q83NgramJaccard: QuerySpec = QuerySpec.sql2(
    "q83_dedup_ngram_jaccard",
    """WITH g AS (
      |  SELECT doc_id, source,
      |    array_distinct(transform(sequence(0, length(text) - 3),
      |      i -> substr(text, i + 1, 3))) AS gr
      |  FROM documents)
      |SELECT a.source AS source, a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
      |  ROUND(CAST(size(array_intersect(a.gr, b.gr)) AS DOUBLE)
      |        / size(array_union(a.gr, b.gr)), 4) AS jaccard3
      |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE CAST(size(array_intersect(a.gr, b.gr)) AS DOUBLE)
      |      / size(array_union(a.gr, b.gr)) >= 0.6
      |ORDER BY source, doc_id_a, doc_id_b""".stripMargin,
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
      |ORDER BY source, doc_id_a, doc_id_b""".stripMargin)

  /** Embedding cosine near-duplicates within a blocking key (label):
    * double-precision dot/norms evaluated element-in-order on both
    * engines, so values agree bit-for-bit before rounding. */
  val q84EmbeddingCosine: QuerySpec = QuerySpec.sql2(
    "q84_dedup_embedding_cosine",
    """WITH e AS (
      |  SELECT vec_id, label,
      |    transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings)
      |SELECT label, id_a, id_b, ROUND(cos, 6) AS cos FROM (
      |  SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
      |    vec_cosine(a.v, b.v) AS cos
      |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id) p
      |WHERE cos >= 0.4
      |ORDER BY label, id_a, id_b""".stripMargin,
    """SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
      |  ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
      |ORDER BY label, id_a, id_b""".stripMargin)

  /** Near-duplicate clusters: connected components over the verified
    * MinHash pairs by iterative min-label propagation (each round: every
    * doc adopts the smallest cluster id among itself and its neighbors).
    * Each round closes one hop, so 6 rounds converge components of
    * diameter ≤ 6 — near-dup components at J ≥ 0.8 are clique-like
    * (diameter 1-2); for adversarially long chains switch to pointer
    * doubling. The loop is the standard scalable CC shape (one join +
    * groupBy per round, labels checkpointed so lineage stays flat).
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
    var labels = edges.select(col("src").as("doc_id"), col("src").as("cluster"))
      .unionAll(edges.select(col("dst").as("doc_id"), col("dst").as("cluster")))
      .groupBy("doc_id").agg(min("cluster").as("cluster"))
      .localCheckpoint()
    for (_ <- 1 to 6) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .select(col("src").as("doc_id"), col("cluster"))
      labels = labels.unionAll(viaNeighbor)
        .groupBy("doc_id").agg(min("cluster").as("cluster"))
        .localCheckpoint()
    }
    labels
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
