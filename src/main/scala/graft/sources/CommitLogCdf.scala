package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ROW-GRANULARITY CHANGE FEED over a [[CommitLog]] table — the Delta
  * CDF contract (`_change_type` / `_commit_version` columns) that
  * S22c/S22d could not give: those emit FILE-granularity changes,
  * which is why the tail must hard-fail a copy-on-write commit (its
  * added files re-state rows the consumer has already seen). This API
  * lifts that limit by DIFFING each COW commit's removed-rows against
  * its added-rows ON THE TABLE KEY:
  *
  *  - append-only commit  → every added row as `insert`
  *  - remove-only commit  → every removed row as `delete`
  *  - copy-on-write commit → key only in removed → `delete`; key only
  *    in added → `insert`; key in both with changed non-key columns →
  *    `update_preimage` (old row) + `update_postimage` (new row); key
  *    in both, row unchanged → NO feed row (the rewrite merely copied
  *    it — emitting it would make every compaction look like churn).
  *
  * A signed fold (+1 for insert/update_postimage, −1 for
  * delete/update_preimage) over the feed from v0 reconstructs any
  * snapshot — through COW commits — which is exactly the retraction
  * discipline C5's MV maintenance consumes.
  *
  * Scale: the version loop is bounded metadata (one manifest read per
  * version). Append/delete legs are plain scans of commit-sized file
  * sets; the COW diff is ONE shuffle join per rewrite commit keyed on
  * the table key, both sides COMMIT-sized (the rewritten files), never
  * table-sized — at 100 TB a compaction of N files costs a join of
  * those N files' rows, not a table scan. Contract: `keyCols` is a
  * table key — at most one row per key on each side of a rewrite
  * (the same uniqueness MERGE demands).
  */
object CommitLogCdf {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"

  /** Whether EXCEPT ALL can diff rows of this type as multisets — map
    * and variant columns have no defined equality, so tables carrying
    * them cannot materialize row-diff CDC (their COW feed versions
    * serve at FILE granularity instead: removed rows as deletes, added
    * rows as inserts — sign-exact under the retraction fold). */
  def multisetComparable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case _: org.apache.spark.sql.types.VariantType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => multisetComparable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType =>
        multisetComparable(a.elementType)
      case _ => true
    }

  /** The row-level feed for `fromVersion < v <= toVersion`, ordered by
    * nothing (consumers aggregate or window themselves). Data columns
    * ride unchanged, plus `_change_type` and `_commit_version`. */
  def changeFeed(
      spark: SparkSession, root: String,
      fromVersion: Int, toVersion: Int,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "row-level CDF needs the table key")
    // dataChange=false versions (OPTIMIZE) restate the same rows in
    // new files — by contract they contribute NO feed rows, so they
    // are skipped without even the COW diff join
    val frames = CommitLog.changes(root, fromVersion, toVersion)
      .filter(_.dataChange).flatMap { ch =>
      // a merge that ran with changeFeed=true materialized this
      // version's change rows — authoritative and cheaper than the
      // diff (and the ONLY source of row changes through a DV merge)
      val materialized =
        CommitLogSource.listParquet(root, CommitLogMerge.changeDirName(ch.version))
      if (materialized.nonEmpty) {
        Some(spark.read.parquet(materialized: _*)
          .withColumn(CommitVersionCol, lit(ch.version)))
      } else {
      CommitLogSource.requireNoDv(ch.added ++ ch.removed,
        s"row-level CDF v${ch.version} of $root")
      // read under the schema IN FORCE at this version: pre-evolution
      // files null-fill by name, and an all-empty epoch's zero-file
      // batch reads as an empty frame instead of failing inference
      def read(batches: Seq[String]): DataFrame =
        CommitLogSource.readBatches(spark, root, batches,
          CommitLog.schemaOf(root, ch.version),
          CommitLog.formerNamesOf(root, ch.version), keepMeta = false)
      val frame = (ch.added.nonEmpty, ch.removed.nonEmpty) match {
        case (true, false) =>
          Some(read(ch.added).withColumn(ChangeTypeCol, lit("insert")))
        case (false, true) =>
          Some(read(ch.removed).withColumn(ChangeTypeCol, lit("delete")))
        case (true, true) =>
          // a MAP/VARIANT column breaks the key-diff twice: the key
          // join's struct equality cannot compare it. On a row-TRACKED
          // table IDENTITY replaces comparability — diff on the
          // preserved `_graft_row_id` (a table key by construction)
          // and test row sameness on the JSON serialization instead
          // of struct equality: unchanged restated rows cancel, a
          // changed row emits its update pair. Untracked
          // non-comparable tables keep the typed refusal (consume
          // those via the connector feed's file-granularity serving).
          val comparableAll = CommitLog.schemaOf(root, ch.version)
            .map(org.apache.spark.sql.types.StructType.fromDDL)
            .forall(_.fields.forall(f => multisetComparable(f.dataType)))
          if (comparableAll)
            Some(cowDiff(read(ch.added), read(ch.removed), keyCols))
          else {
            require(CommitLogWrite.rowTrackingOn(
                CommitLog.tblPropsOf(root, ch.version)),
              s"v${ch.version} of $root rewrites a map/variant table " +
                "without row tracking — rows cannot be diffed (enable " +
                "rowTracking, or read the connector change feed, which " +
                "serves such versions at file granularity)")
            // the declared DDL hides the row id — read the rewrite's
            // schema (declared + _graft_row_id), which every tracked
            // file physically carries
            def readT(batches: Seq[String]): DataFrame =
              CommitLogSource.readBatches(spark, root, batches,
                CommitLog.rewriteDdl(root, ch.version),
                CommitLog.formerNamesOf(root, ch.version), keepMeta = false)
            Some(cowDiff(readT(ch.added), readT(ch.removed),
              Seq(CommitLogWrite.RowIdCol), jsonEquality = true)
              .drop(CommitLogWrite.RowIdCol))
          }
        case (false, false) => None // schema-only commit: no rows changed
      }
      frame.map(_.withColumn(CommitVersionCol, lit(ch.version)))
      }
    }
    if (frames.isEmpty) {
      // a poll window holding only OPTIMIZE / schema-only commits is a
      // NORMAL incremental read whose answer is the empty feed — a
      // consumer must not crash because maintenance ran
      val schema = CommitLogSource.tableSchema(root)
        .add(ChangeTypeCol, org.apache.spark.sql.types.StringType)
        .add(CommitVersionCol, org.apache.spark.sql.types.IntegerType)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    } else
      // a window spanning an additive schema evolution yields frames
      // with different column sets — pre-evolution rows null-fill the
      // later columns (Delta CDF's end-schema read), instead of the
      // union crashing a legitimate incremental read
      frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Row diff of one copy-on-write commit: full-outer join of the
    * removed rows (pre) and added rows (post) on the key; unchanged
    * rows vanish, changed ones emit a preimage/postimage pair.
    *
    * `jsonEquality` (tracked map/variant tables, keyed on the row id):
    * struct `<=>` cannot compare those types, so row sameness is the
    * JSON serialization instead — byte-identical restated rows always
    * serialize identically (COW copies values verbatim), and a
    * re-encoded-but-JSON-equal value counting as unchanged is
    * invisible to the retraction fold (the consumer contract). */
  private def cowDiff(
      added: DataFrame, removed: DataFrame, keyCols: Seq[String],
      jsonEquality: Boolean = false): DataFrame = {
    val cols = added.columns.toSeq
    require(removed.columns.toSeq == cols,
      s"rewrite changed the column set: ${removed.columns.toSeq} -> $cols " +
        "(schema evolution must go through a log-declared DDL, not a rewrite)")
    def packed(df: DataFrame, as: String): DataFrame =
      df.select(keyCols.map(col) :+ struct(cols.map(col): _*).as(as): _*)
    val pre = packed(removed, "_pre")
    val post = packed(added, "_post")
    // null-safe struct equality: an unchanged row (including nulls in
    // value columns) emits nothing; <=> on the full struct compares all
    // value columns at once inside codegen
    val same =
      if (jsonEquality) to_json(col("_pre")) <=> to_json(col("_post"))
      else col("_pre") <=> col("_post")
    val changes = pre.join(post, keyCols, "full_outer")
      .select(explode(
        when(col("_post").isNull,
          array(struct(lit("delete").as("ct"), col("_pre").as("row"))))
        .when(col("_pre").isNull,
          array(struct(lit("insert").as("ct"), col("_post").as("row"))))
        // typed empty array (slice of a one-element array) — unchanged
        // rows emit nothing
        .when(same,
          slice(array(struct(lit("x").as("ct"), col("_pre").as("row"))), 1, 0))
        .otherwise(array(
          struct(lit("update_preimage").as("ct"), col("_pre").as("row")),
          struct(lit("update_postimage").as("ct"), col("_post").as("row"))))
      ).as("c"))
    changes.select(
      cols.map(c => col(s"c.row.$c").as(c)) :+ col("c.ct").as(ChangeTypeCol): _*)
  }

  /** The sign a retraction-discipline consumer applies to each feed
    * row: +1 states the row, −1 retracts it. */
  def changeSign(changeType: Column): Column =
    when(changeType.isin("insert", "update_postimage"), 1L).otherwise(-1L)
}
