package org.apache.spark.sql

import org.apache.spark.sql.execution.SparkStrategy

/** Test-only bridge past the `private[sql]` Scala signature of
  * `sessionState` (public bytecode): lets ExtensionsSpec assert which
  * planner strategies a session actually resolved — the
  * injectPlannerStrategy path has no other observable surface short
  * of planning a query.
  */
object GraftTestBridge {
  def plannerStrategies(s: SparkSession): Seq[SparkStrategy] =
    s.asInstanceOf[classic.SparkSession].sessionState.planner.strategies
}
