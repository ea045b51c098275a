package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden plan fingerprints for the Bench headline set: a bench delta is
  * only attributable to machine noise if the plan DIDN'T change — this
  * spec makes that check one diff instead of a hand audit (the r12
  * 1.13× warm drift took exactly such an audit to clear). Fails when any
  * bench query's normalized physical plan shape (operators, join
  * strategies, exchanges, scan sources — see
  * [[graft.engine.PlanFingerprint]]) differs from the recorded golden.
  *
  * On an INTENDED plan change, regenerate with
  * `REGEN_FINGERPRINTS=1 sbt "testOnly graft.BenchPlanSpec"` and commit
  * the diff — the diff itself documents what the plan change was.
  *
  * The second test maintains `registry_plan_fingerprints.txt`: a COARSE
  * fingerprint (operator multiset + shuffle count, no tree) for EVERY
  * registered query, rewritten on every run — not a gate, an artifact.
  * Any query's plan drift between rounds shows up in `git diff` of that
  * file; the committed state documents the whole registry's plan
  * shapes at the round boundary. */
class BenchPlanSpec extends EngineSuite {

  private val goldenPath =
    Paths.get("/root/repo/src/test/resources/bench_plan_fingerprints.txt")

  private def currentFingerprints: Seq[(String, String)] =
    SparkEntry.benchQueries.sorted.map { name =>
      name -> graft.engine.PlanFingerprint.of(
        SparkEntry.queries(name)(spark, sfDir))
    }

  test("bench headline plans match their golden fingerprints") {
    val current = currentFingerprints
    if (sys.env.contains("REGEN_FINGERPRINTS")) {
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath,
        current.map { case (n, f) => s"$n $f" }.asJava)
      info(s"regenerated ${current.size} fingerprints at $goldenPath")
    } else {
      assert(Files.exists(goldenPath),
        s"no golden file at $goldenPath — run with REGEN_FINGERPRINTS=1")
      val golden = Files.readAllLines(goldenPath).asScala
        .filter(_.nonEmpty)
        .map { l => val i = l.indexOf(' '); l.take(i) -> l.drop(i + 1) }
        .toMap
      val currentMap = current.toMap
      val missing = currentMap.keySet -- golden.keySet
      assert(missing.isEmpty,
        s"bench queries with no golden fingerprint (regen + commit): $missing")
      val stale = golden.keySet -- currentMap.keySet
      assert(stale.isEmpty,
        s"golden fingerprints for queries no longer benched (regen + commit): $stale")
      for ((name, fp) <- current) {
        assert(golden(name) == fp,
          s"""$name: plan shape changed vs golden —
             |golden : ${golden(name)}
             |current: $fp
             |If intended, REGEN_FINGERPRINTS=1 and commit the diff.""".stripMargin)
      }
    }
  }

  test("registry-wide coarse fingerprints are (re)written for git-diff drift tracking") {
    val registryPath =
      Paths.get("/root/repo/src/test/resources/registry_plan_fingerprints.txt")
    val lines = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val fp =
        try graft.engine.PlanFingerprint.summary(fn(spark, sfDir))
        catch { case e: Throwable => s"err:${e.getClass.getSimpleName}" }
      s"$name $fp"
    }
    Files.createDirectories(registryPath.getParent)
    Files.write(registryPath, lines.asJava)
    info(s"wrote ${lines.size} registry fingerprints at $registryPath")
    assert(lines.size == SparkEntry.queries.size)
  }
}
