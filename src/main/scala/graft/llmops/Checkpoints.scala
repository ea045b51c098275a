package graft.llmops

import org.apache.spark.sql.DataFrame

/** Storage hygiene for iterative (fixpoint / bounded-round) dataflows.
  * Every loop that localCheckpoints its per-round state must release the
  * superseded round's blocks once the next round is materialized, or
  * block-manager storage grows O(rounds) — harmless in a test JVM,
  * an executor-memory leak on a long-running 100 TB job. */
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
