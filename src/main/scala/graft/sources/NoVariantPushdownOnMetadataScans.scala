package graft.sources

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Declines VARIANT-extraction pushdown on scans that carry METADATA
  * columns (`_batch`/`_row_file`/`_row_pos`/the hidden row id).
  *
  * Why a rule: Spark's `V2ScanRelationPushDown` pipeline builds the
  * scan for accepted variant extractions (`buildScanWithPushedVariants`)
  * BEFORE the column-pruning phase — and column pruning is the only
  * channel that conveys requested metadata columns to the scan
  * builder. A scan built under accepted extractions therefore serves
  * exactly its rewritten data schema, the rebuilt relation output
  * drops the plan's metadata attributes, and binding fails with
  * INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND (Spark's own parquet v2 has the
  * same interaction with `_metadata`). The builder cannot see the
  * plan, so this rule — registered via `injectOptimizerRule`, which
  * runs in the operator-optimization batch, strictly before the
  * early-pushdown batch — tags the RELATION instead: any commitlog
  * relation whose output references a metadata column gets the
  * decline option, and [[CommitLogScanBuilder.pushVariantExtractions]]
  * answers all-false. Those plans read whole variants (the engine's
  * own row-level and feed scans, plus metadata-selecting user
  * queries); pure data-column plans keep the shredded-subcolumn win. */
object NoVariantPushdownOnMetadataScans extends Rule[LogicalPlan] {
  /** Row-level DML wraps the table in Spark's RowLevelOperationTable —
    * unwrap it (those scans are exactly the ones that carry the
    * delta rowId metadata attributes). */
  private def isCommitLog(
      t: org.apache.spark.sql.connector.catalog.Table): Boolean =
    t.isInstanceOf[CommitLogTable] ||
      org.apache.spark.sql.GraftShims.rowLevelBaseTable(t)
        .exists(_.isInstanceOf[CommitLogTable])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case rel: DataSourceV2Relation
        if isCommitLog(rel.table) &&
          rel.options.get(CommitLogSource.NoVariantExtractionOpt) == null && {
            // on a CHANGE-FEED relation the CDF stamps (and a tracked
            // table's row id) are REGULAR schema columns — column
            // pruning conveys them to the scan like any data column,
            // so only the true metadata trio starves; everywhere else
            // the full special set does (r15 — lets `variant_get`
            // push into an insert-only feed window)
            val feed = Option(rel.options.get("readChangeFeed"))
              .exists(_.toBoolean)
            val hazardous: String => Boolean =
              if (feed)
                Set(CommitLogSource.BatchCol, CommitLogSource.RowFileCol,
                  CommitLogSource.RowPosCol)
              else
                n => CommitLogSource.SpecialCols.contains(n) ||
                  n == CommitLogWrite.RowIdCol
            rel.output.exists(a => hazardous(a.name))
          } =>
      val m = new java.util.HashMap[String, String](rel.options)
      m.put(CommitLogSource.NoVariantExtractionOpt, "true")
      rel.copy(options = new CaseInsensitiveStringMap(m))
  }
}
