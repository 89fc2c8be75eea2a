package org.apache.spark.sql.connector.catalog

import org.apache.spark.sql.types.StructType

/** Shim into Spark's `private[sql]` catalog utilities — the standard
  * connector trick for the one conversion the public API hides:
  * [[CatalogV2Util.v2ColumnsToStructType]] is what Spark's DEFAULT
  * `createTable(Column[])` overload uses before delegating to the
  * deprecated StructType variant, and graft's catalog must run the
  * SAME conversion when it overrides that overload to capture
  * generation expressions (which the conversion drops — see
  * GraftCatalog.createTable). Keeping the conversion Spark's own means
  * column defaults/comments keep their exact metadata encoding. */
object GraftShims {
  def v2ColumnsToStructType(columns: Array[Column]): StructType =
    CatalogV2Util.v2ColumnsToStructType(columns.toSeq)
}
