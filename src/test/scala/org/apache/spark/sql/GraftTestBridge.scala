package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-only access to SparkSessionExtensions' private[sql] apply
  * methods, so the suite can verify what `graft.GraftExtensions`
  * injects without building a second SparkContext. */
object GraftTestBridge {
  def optimizerRules(ext: SparkSessionExtensions,
      session: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(session)
  def registerFunctions(ext: SparkSessionExtensions,
      registry: FunctionRegistry): Unit =
    ext.registerFunctions(registry)
}
