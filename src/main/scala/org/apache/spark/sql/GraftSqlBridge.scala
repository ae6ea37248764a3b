package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `org.apache.spark.sql`-scoped shim graft needs: building a
  * DataFrame from a raw LogicalPlan (to hand custom logical nodes such as
  * [[graft.plans.TopKPerKey]] to the planner) and extracting the Catalyst
  * expression behind a public Column. Both are `private[sql]` in Spark 4's
  * classic API — the standard extension-library move is a package-scoped
  * bridge; everything else in graft stays on public surface.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    classic.Dataset.ofRows(cs, plan)
  }

  /** EAGER Column → Expression conversion. `ExpressionUtils.expression`
    * returns a lazy `ColumnNodeExpression` wrapper that reports itself
    * resolved, so a custom logical node holding one is skipped by the
    * analyzer and dies at codegen; the converter unwraps to the real
    * Catalyst tree (e.g. UnresolvedAttribute), which resolves normally.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a Catalyst expression back into a public Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
