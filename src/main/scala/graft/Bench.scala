package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds.
  *
  * Runs under the exact engine configuration Verify uses
  * ([[graft.engine.GraftSession]]) so bench timings measure the verified
  * semantics (UTC, non-ANSI, AQE, bloom-filter joins). Failed queries are
  * reported with value -1 and listed in "failed" — never silently folded
  * into the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.GraftSession.local(cores = cpus, shufflePartitions = cpus)

    // Warm up: class loading + parquet footer reads happen outside timings.
    graft.sources.TestTables.register(spark, sfDir)
    discard(spark.range(16).count())

    // Optional subset (comma-separated name prefixes, resolved against the
    // FULL registry): scale drills bench heavy non-headline queries too.
    // Blank prefixes (set-but-empty env var) would match everything via
    // the empty-string prefix — filter them and fall back to the
    // headline set when none remain.
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty) match {
      case Some(prefixes) =>
        SparkEntry.queries.keys.toSeq.sorted
          .filter(n => prefixes.exists(n.startsWith))
      case None => SparkEntry.benchQueries
    }
    // Release artifacts are once-per-release jobs: the artifact-read
    // audits (q426/q427/q431, and q432's versioned release 2 which
    // publishes FROM the same persisted relation) time the production
    // PER-AUDIT path, so the suffix-array artifact is published before
    // any timed run — q381 stays in the set as the build-cost sentinel
    // (r19 VERDICT #1: the bench should price what a deployment runs
    // daily, not fold the release job into the first audit's cold
    // slot).
    if (names.exists(n => n.startsWith("q426") || n.startsWith("q427") ||
        n.startsWith("q431") || n.startsWith("q432")))
      discard(graft.llmops.SuffixArray
        .saPairs(QuerySpec.prepared(spark, sfDir), sfDir).count())

    val queries = SparkEntry.queries
    var failed = List.empty[String]
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        discard(queries(name)(spark, sfDir).count())
        (System.nanoTime() - t0) / 1e9
      }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          if (!failed.contains(name)) failed ::= name
          -1.0
      }
    }
    // Warm-run count parsed BEFORE any timed run: a malformed value must
    // fail fast, not throw after the cold timings of a multi-hour drill
    // were already paid. (Scale drills on 10x fixtures can't always
    // afford best-of-3 on a multi-minute query — this env var trims the
    // warm-run count for those runs only; the driver keeps the default.)
    val warms = sys.env.get("SPARK_GRAFT_BENCH_WARMS")
      .map(s => s.trim.toIntOption.getOrElse(sys.error(
        s"SPARK_GRAFT_BENCH_WARMS must be an integer, got '$s'")).max(1))
      .getOrElse(3)
    // cold = first execution (includes planning + codegen, the
    // interactive-latency number); warm = best of three post-cold
    // executions (steady state — the min filters scheduler/GC noise so
    // round-over-round comparisons track code changes, not machine load;
    // observed run-to-run drift on this container is ±15-20%).
    // Cold runs follow registration order, so a heavy query's GC/JIT
    // debt used to land in the NEXT query's cold slot (r12: q19 cold
    // 13s after the q258 rollup, warm unchanged at 0.75s) — a System.gc
    // between cold timings keeps each cold number its own.
    val cold = names.map { n => System.gc(); n -> run(n) }
    val warmRuns = Seq.fill(warms)(names.map(n => n -> run(n)).toMap)
    val warm = names.map { n =>
      val ok = warmRuns.map(_(n)).filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = cold.collect { case (_, v) if v >= 0 => v }.sum
    val warmTotal = warm.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":${json(cold)},"warm_total":$warmTotal,"queries_warm":${json(warm)},"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // sbt prefixes stdout with "[info] ", which can defeat line-oriented
    // JSON parsing downstream — also drop the bare line in a file.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
