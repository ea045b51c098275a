package graft

import org.apache.spark.sql.functions._

/** Pins the distributed suffix-array construction (llmops.SuffixArray):
  * the prefix-doubling ranks must reproduce the DIRECT lexicographic
  * suffix sort exactly — ties (identical suffixes) included — because
  * the q380 oracle is DuckDB's `ORDER BY w[pos:]` over the very same
  * suffixes. The reference check here sorts the materialized suffix
  * word-arrays with a plain rank window (fine in a test; the
  * production path never does this — that is the point of the
  * doubling). */
class SuffixArraySpec extends EngineSuite {

  test("prefix-doubling ranks == direct lexicographic suffix sort, ties included") {
    val sp = QuerySpec.prepared(spark, sfDir)
    val sa = llmops.SuffixArray.suffixRanks(sp)

    val docs = sp.table("documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val expected = docs
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p0", "word")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"))
      .join(docs, "doc_id")
      .select(col("doc_id"), col("pos"),
        expr("slice(w, int(pos), size(w) - int(pos) + 1)").as("suf"))
      .select(col("doc_id"), col("pos"),
        rank().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("suf")))
          .cast("long").as("rank"))

    val n = expected.count()
    assert(sa.count() == n, "one rank row per (doc, word position)")
    val mismatches = sa.join(expected, Seq("doc_id", "pos"))
      .filter(sa("rank") =!= expected("rank"))
      .count()
    assert(mismatches == 0L,
      s"$mismatches suffix positions rank differently from the direct sort")
  }

  test("q381 max LCP is realized by an adjacent pair and bounded by doc length") {
    val sp = QuerySpec.prepared(spark, sfDir)
    val row = SparkEntry.queries("q381_sa_lcp_stats")(spark, sfDir).collect()(0)
    // EVERY adjacent pair must surface: n-1 of them for n suffixes (the
    // regression mode of the Prefix dual-exchange bug was silent row
    // loss here — 6,838 pairs out of 27,938)
    val nSuffixes = sp.table("documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(row.getAs[Long]("n_pairs") == nSuffixes - 1,
      s"adjacent pairs ${row.getAs[Long]("n_pairs")} != suffixes-1 ${nSuffixes - 1}")
    val maxLcp = row.getAs[Long]("max_lcp")
    val phrase = row.getAs[String]("top_phrase")
    val maxWords = sp.table("documents")
      .select(size(split(col("text"), " ")).as("n")).agg(max("n"))
      .collect()(0).getInt(0)
    assert(maxLcp >= 0 && maxLcp <= maxWords)
    // the reported passage really is maxLcp words long
    assert(phrase.isEmpty && maxLcp == 0 ||
      phrase.split(" ").length.toLong == maxLcp)
    // and it really occurs at least twice in the corpus
    if (maxLcp > 0) {
      val hits = sp.table("documents")
        .filter(col("text").contains(phrase)).count()
      assert(hits >= 1L, "top phrase must occur in the corpus")
    }
  }

  test("q382 covered tokens never exceed the source total") {
    val rows = SparkEntry.queries("q382_sa_dup_coverage")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tot = r.getAs[Long]("total_tokens")
      val dup = r.getAs[Long]("dup_tokens")
      assert(dup >= 0L && dup <= tot,
        s"source ${r.getAs[String]("source")}: dup $dup vs total $tot")
    }
  }
}
