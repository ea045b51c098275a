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
  * stages through [[Checkpoints.stage]]/`.staged`, which defaults to
  * `localCheckpoint()` — executor-pinned, lineage-truncated, cheap, and
  * exactly right at test scope — but flips to RELIABLE checkpoints
  * (HDFS-backed, lineage-free recovery after executor loss) when the
  * session sets `spark.graft.stage.reliable=true` and a
  * `sparkContext.setCheckpointDir` is configured: the one-switch
  * durability story a multi-hour 1000-executor run needs, with zero
  * changes at the staging sites. */
private[graft] object Checkpoints {

  /** Conf key: "true" + a set checkpoint dir → reliable checkpoints. */
  val ReliableKey = "spark.graft.stage.reliable"

  /** Materialize a staging point: every pipeline that consumes an
    * intermediate relation more than once stages it through here. */
  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf.getOption(ReliableKey).contains("true") &&
      spark.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  /** `relation.staged` — call-site-shaped like `.localCheckpoint()`. */
  implicit final class Stageable(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = stage(df)
  }

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
