package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Minimal package-private escape hatch: `classic.Dataset.ofRows` is
  * private[sql], and it is the only supported way to wrap a custom
  * LogicalPlan ([[graft.plans.TopKPerGroupNode]]) back into a public
  * DataFrame. Standard practice for Spark extensions; nothing else from
  * the internal API is exposed here.
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(castToImpl(spark), plan)

  /** Wrap a catalyst Expression as a public Column (the 4.x ColumnNode
    * indirection made `new Column(expr)` private). Used to inject an
    * explicitly-ANSI Cast into DataFrame-side generated-column
    * recomputation so DML regen refuses bad values exactly like the
    * sink's bound generators, independent of session cast semantics. */
  def columnOf(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expressionOf(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Unwrap Spark's row-level-DML table wrapper (private[sql]) so a
    * planner rule can recognize the base table behind an UPDATE/
    * DELETE/MERGE scan relation. */
  def rowLevelBaseTable(
      t: connector.catalog.Table): Option[connector.catalog.Table] = t match {
    case r: connector.write.RowLevelOperationTable => Some(r.table)
    case _ => None
  }
}
