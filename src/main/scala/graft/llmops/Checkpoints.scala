package graft.llmops

import org.apache.spark.sql.DataFrame

/** Storage hygiene for iterative (fixpoint / bounded-round) dataflows.
  * Every loop that localCheckpoints its per-round state must release the
  * superseded round's blocks once the next round is materialized, or
  * block-manager storage grows O(rounds) — harmless in a test JVM,
  * an executor-memory leak on a long-running 100 TB job.
  *
  * Durability note (the 100 TB story for the whole llmops package): the
  * corpus-staging pattern throughout (Dedup, Retrieval, CorpusStats, …)
  * uses `localCheckpoint()` — executor-pinned, lineage-truncated, cheap,
  * and exactly right at this scope, but its blocks die with an executor.
  * A multi-hour 1000-executor run should flip those staging points to
  * RELIABLE checkpoints (`spark.sparkContext.setCheckpointDir` + Dataset
  * `.checkpoint()` — HDFS-backed, lineage-free recovery after executor
  * loss) behind a session config; the fixpoint loops here are already
  * structured so the swap is a one-line change at each staging site. */
private[graft] object Checkpoints {

  /** Releases the block-manager storage behind a localCheckpoint-ed
    * DataFrame (the checkpointed RDD sits inside the plan's LogicalRDD
    * leaf, which Dataset offers no public handle to — matched by class
    * name so we stay off private[sql] API). */
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach { node =>
      if (node.getClass.getName == "org.apache.spark.sql.execution.LogicalRDD") {
        node.getClass.getMethod("rdd").invoke(node) match {
          case r: org.apache.spark.rdd.RDD[_] => r.unpersist(blocking = false)
          case _ => ()
        }
      }
    }
}
