package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-deployable entry point for the engine's function surface:
  *
  *   spark-submit --conf spark.sql.extensions=graft.engine.GraftExtensions ...
  *
  * installs every Impala gap-filling function and sketch aggregate into
  * each new session without any code-level attach — the idiomatic way to
  * ship a Catalyst-extending library (SparkSessionExtensions is the same
  * hook a custom Strategy or optimizer Rule would use; the reference's
  * analogue is BuiltinsDb populating its function registry at catalog
  * startup, catalog/BuiltinsDb.java:42-61). GraftSession.attach remains
  * for harness-owned sessions that are created without extension confs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    graft.functions.ImpalaFunctions.builders.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.ImpalaFunctions", name),
        builder))
    }
    extensions.injectOptimizerRule(_ => graft.plans.RangeBucketJoinRewrite)
    extensions.injectOptimizerRule(_ => graft.plans.AppxCountDistinctRewrite)
    extensions.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinRewrite)
    extensions.injectOptimizerRule(_ => graft.plans.SmallQueryFastPath)
  }
}
