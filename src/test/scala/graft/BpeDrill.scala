package graft

/** Diagnostic drill (not a test): times the FULL-RECOUNT batched BPE
  * trainer against the INCREMENTAL (delta-maintained pair counts) loop
  * at the q416 budget (48 merges: 6 rounds × m = 8, pool = 32) on
  * SPARK_GRAFT_SF_DIR — the measurement behind the BENCH_SF1.json note
  * that per-round cost tracks the touched-word slice, not the vocab.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.BpeDrill"
  */
object BpeDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.GraftSession.local(cores = 32, shufflePartitions = 32)
    graft.sources.TestTables.register(spark, sfDir)
    // SPARK_GRAFT_DRILL_VOCAB=N swaps in a SYNTHETIC N-word corpus (one
    // distinct base-26-encoded word per doc): the driver fixtures hold
    // only 31 distinct words, so their symbol tables are ~200 rows and
    // per-round cost is pure scheduling overhead on BOTH trainer
    // variants — the touched-slice-vs-vocab separation needs a symbol
    // table that is actually large.
    sys.env.get("SPARK_GRAFT_DRILL_VOCAB").map(_.toInt).foreach { n =>
      spark.range(n.toLong)
        .selectExpr("id AS doc_id",
          "translate(lower(conv(id + 1000000, 10, 26)), '0123456789', " +
            "'qrstuvwxyz') AS text")
        .createOrReplaceTempView("documents")
      println(s"[drill] synthetic vocab: $n distinct words")
    }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[drill] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm-up: class loading + parquet footers outside the timings
    locally {
      val (m, s) = llmops.BpeTokenizer.trainMerges(spark, rounds = 1)
      discard(m.count()); llmops.Checkpoints.unpersist(s)
    }
    for (i <- 1 to 2) {
      time(s"full_recount_K48_run$i") {
        val (m, s) = llmops.BpeTokenizer.trainMergesBatched(
          spark, rounds = 6, m = 8, pool = 32)
        discard(m.count()); llmops.Checkpoints.unpersist(s)
      }
      time(s"incremental_K48_run$i") {
        val (m, s, c) = llmops.BpeTokenizer.trainMergesIncremental(
          spark, rounds = 6, m = 8, pool = 32)
        discard(m.count())
        llmops.Checkpoints.unpersist(s); llmops.Checkpoints.unpersist(c)
      }
    }
    spark.stop()
  }
}
