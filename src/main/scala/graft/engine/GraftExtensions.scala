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
    // statement-scoped straight_join: must run during resolution, before
    // the analyzer's "Remove Unresolved Hints" drops unknown hint names
    extensions.injectResolutionRule(_ => graft.plans.StraightJoinHint)
    // The engine's optimizer rules are designed for the END of logical
    // optimization ("User Provided Optimizers", batch 38 — AFTER the
    // DSv2 early-scan-pushdown batch). Neither injectOptimizerRule (the
    // operator fixed point, batch 11/13) nor injectPreCBORule (batch 16)
    // runs post-pushdown — verified: SmallQueryFastPath's Repartition(1)
    // from either slot blocks V2ScanRelationPushDown from pushing
    // LIMIT/TopN into the source (ext_source served [0,1000) instead of
    // [0,7)). So the extension installs them where attach() does —
    // session.experimental.extraOptimizations — using the session handle
    // the rule builder receives at optimizer construction, and
    // contributes a no-op to the operator batch itself.
    extensions.injectOptimizerRule { session =>
      GraftSession.installOptimizerRules(session)
      GraftExtensions.NoOp
    }
  }
}

object GraftExtensions {
  /** Placeholder contribution to the operator-optimization batch; the
    * real rules land in extraOptimizations (see above). */
  private object NoOp
      extends org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
    override def apply(
        plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = plan
  }
}
