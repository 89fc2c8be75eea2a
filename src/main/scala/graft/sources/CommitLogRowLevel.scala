package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** GROUP-BASED row-level SQL over the commit log — Spark's
  * `SupportsRowLevelOperations` contract, which is how `UPDATE`,
  * arbitrary-predicate `DELETE`, and `MERGE INTO` reach a DSv2 table
  * as plain SQL:
  *
  *  1. Spark's rewrite rules (RewriteUpdateTable / RewriteDeleteFromTable
  *     / RewriteMergeIntoTable) read the table through THIS operation's
  *     scan and compute the post-command rows (survivors for DELETE,
  *     CASE-WHEN-applied rows for UPDATE, the merged output for MERGE).
  *  2. The result lands through this operation's write, whose commit
  *     REPLACES the scanned groups with the written files.
  *
  * This implementation is the honest copy-on-write baseline: the scan
  * deliberately does NO filter pushdown or manifest pruning — a file
  * pruned from a ReplaceData read would have its rows silently dropped
  * from the rewrite, because "replace" means "the written rows are the
  * whole new content of the scanned groups". With every live batch
  * scanned, the commit is a full-table rewrite: `removed` = the
  * snapshot at the operation's read version (deletion vectors
  * included — the rewrite doubles as compaction, since the scan
  * reconciles them), `added` = one fresh batch of the rewritten rows.
  * Narrowing groups at runtime (SupportsRuntimeV2Filtering, the
  * Iceberg refinement) is an optimization on top of this contract,
  * not a correctness requirement.
  *
  * Concurrency is the Delta conflict matrix under WriteSerializable:
  * the read version is captured when the operation is created and the
  * commit aims at `readVersion + 1`; a rival BLIND DATA APPEND does
  * NOT abort — its rows did not exist at the read version, so the
  * statement's predicate never saw them, and the commit rebases
  * forward past it (continuous ingest and maintenance DML coexist).
  * Any OTHER rival — a rewrite, a DV delete, OPTIMIZE, a schema or
  * constraint change — aborts the statement with
  * `ConcurrentModificationException`: it may have changed rows this
  * statement read, and a rewrite can never rebase across that.
  * CHECK constraints in force validate the staged result pre-publish,
  * exactly like the sink. Sparse DELETEs with translatable predicates
  * never get here — `SupportsDelete`'s metadata path claims them
  * first; this is the heavy verb for the expressions that path
  * refuses. */
class CommitLogRowLevelOperation(
    root: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** One read version per statement: scan and replace-commit agree. */
  private[sources] val readVersion = CommitLog.latestVersion(root)

  /** The data batches this statement's rewrite REPLACES. Defaults to
    * every live data batch (the whole-table COW baseline); Spark's
    * runtime group filter narrows it to the batches that actually
    * hold matched rows (see [[CommitLogRowLevelScan.filter]]) —
    * untouched batches are then neither read, rewritten, nor removed. */
  @volatile private[sources] var scannedBatches: Seq[String] =
    CommitLog.files(root, readVersion)
      .filterNot(_.startsWith(CommitLogMerge.DvPrefix))

  override def command(): RowLevelOperation.Command = cmd

  /** Requiring `_batch` does double duty: it routes the rewrite
    * through Spark's metadata-projecting write path (the task projects
    * the rewritten row to data columns, stripping the internal
    * `__row_operation` marker before it reaches the writer), and it is
    * the attribute the runtime group filter collects from matched
    * rows. */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      CommitLogSource.BatchCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      // Spark prunes to data columns + the required `_batch` — COLUMN
      // pruning only; deliberately no filter pushdown (a file pruned
      // from a replace-groups read would have its rows dropped)
      private var required: org.apache.spark.sql.types.StructType =
        CommitLogSource.tableSchema(root, readVersion)
      override def pruneColumns(
          s: org.apache.spark.sql.types.StructType): Unit = required = s
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new CommitLogRowLevelScan(
          CommitLogRowLevelOperation.this, root, readVersion, required)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new CommitLogReplaceWrite(CommitLogRowLevelOperation.this,
          root, readVersion, info.schema(), cmd.toString)
    }
}

/** The row-level read: the operation's live data batches (narrowed by
  * the runtime group filter), deletion vectors reconciled per file,
  * renamed columns resolved through the name chain — the batch-scan
  * semantics, minus pushdown, plus group narrowing. */
class CommitLogRowLevelScan(
    op: CommitLogRowLevelOperation, root: String, readVersion: Int,
    schema: StructType)
    extends org.apache.spark.sql.connector.read.Scan
    with org.apache.spark.sql.connector.read.Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  import org.apache.spark.sql.connector.read.InputPartition

  override def readSchema(): StructType = schema
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this
  override def description(): String =
    s"CommitLogRowLevelScan root=$root v=$readVersion " +
      s"groups=${op.scannedBatches.size}"

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      CommitLogSource.BatchCol))

  /** Spark's GROUP FILTER: the command's condition runs as a subquery
    * collecting the distinct `_batch` values of MATCHED rows, and this
    * scan (the main read) narrows to exactly those batches. Batches
    * outside the IN-list hold no matched rows: they are neither read,
    * rewritten, nor removed — the statement's cost becomes
    * touched-batch-sized, the Iceberg COW shape. A filter we cannot
    * interpret is ignored (keep everything — filtering is an
    * optimization, never a correctness lever). */
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        (p.children().head match {
          case r: org.apache.spark.sql.connector.expressions.NamedReference
              if r.fieldNames().sameElements(Array(CommitLogSource.BatchCol)) =>
            Some(p.children().tail.collect {
              case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
                String.valueOf(l.value)
            }.toSet)
          case _ => None
        }).foreach { matched =>
          op.scannedBatches = op.scannedBatches.filter(b =>
            matched.contains(
              CommitLogMerge.normDir(CommitLog.batchPath(root, b))))
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] = {
    val dvBatches = CommitLog.files(root, readVersion)
      .filter(_.startsWith(CommitLogMerge.DvPrefix))
    val deletedByFile = CommitLogMerge.dvPositionsByFile(
      SparkSession.active, root, dvBatches)
    op.scannedBatches
      .flatMap(CommitLogSource.listParquet(root, _))
      .map(f => CommitLogInputPartition(f,
        deletedPositions = deletedByFile.getOrElse(
          CommitLogMerge.normDir(f), Array.empty)): InputPartition)
      .toArray
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    CommitLogReaderFactory(schema, CommitLog.formerNamesOf(root, readVersion))
}

/** The replace-groups write: stages like the one-shot append, commits
  * `removed = the scanned groups` + `added = the rewrite`. On a
  * PARTITIONED table the rewrite lands one batch per partition tuple
  * with the tuple in the manifest — an UPDATE/MERGE/DELETE leaves the
  * table as exactly prunable and partition-overwritable as it found
  * it (a single mixed rewrite batch would strand the touched
  * partitions' tuples). */
class CommitLogReplaceWrite(
    op: CommitLogRowLevelOperation,
    root: String, readVersion: Int, schema: StructType, verb: String)
    extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  private val writeId = EnvelopeBatchWrite.nextWriteId()
  private val stageName = s"stage-$writeId"
  private val batchName = s"rl$writeId"
  private val partCols = CommitLog.partColsOf(root, readVersion)

  override def toBatch: BatchWrite = this

  /** Partitioned rewrites cluster on the partition columns (non-strict
    * — AQE may split a skewed partition, the tuple grouping merges the
    * files back into one batch); unpartitioned rewrites impose
    * nothing. */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    if (partCols.isEmpty)
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    else
      org.apache.spark.sql.connector.distributions.Distributions.clustered(
        partCols.map(c => org.apache.spark.sql.connector.expressions
          .Expressions.identity(c)
          : org.apache.spark.sql.connector.expressions.Expression).toArray)
  override def distributionStrictlyRequired(): Boolean = false
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (partCols.isEmpty) Array.empty
    else partCols.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions.identity(c),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      .toArray

  /** GENERATED columns recompute on every rewritten row — Spark's
    * UPDATE/MERGE rewrite carries whatever the plan produced (a SET on
    * a source column leaves the old generated value in the postimage),
    * and a stale value would poison the batch's partition tuple and
    * every filter derived from the generation expression. Same
    * task-side wrap the sink uses; unchanged rows recompute to the
    * value they already hold. */
  private val generators = CommitLogWrite.boundGenerators(
    schema, CommitLog.tblPropsOf(root, readVersion))

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val base =
      if (partCols.isEmpty)
        CommitLogBatchWriterFactory(s"$root/$stageName", schema)
      else
        CommitLogPartitionedBatchWriterFactory(
          s"$root/$stageName", schema, partCols)
    if (generators.isEmpty) base
    else GeneratingWriterFactory(base, schema, generators)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rootP = new Path(root)
    val f = FileSystem.get(rootP.toUri,
      SparkSession.active.sessionState.newHadoopConf())
    val stage = new Path(rootP, stageName)
    def dropStage(): Unit = if (f.exists(stage)) f.delete(stage, true)

    // task publish: the sink's level-1 discipline, shared
    val msgs = messages.collect { case m: CommitLogCommitMessage => m }
    val fileMsgs = messages.collect {
      case m: CommitLogPartitionedCommitMessage => m.files
    }.flatten.toSeq
    CommitLogWrite.promoteTaskFiles(f, stage,
      (msgs.map(m => (m.tmpName, m.visibleName)) ++
        fileMsgs.map(m => (m.tmpName, m.visibleName))))

    // the rewritten rows ARE the table's new content: the CHECKs in
    // force (declared CHECKs + the DDL's NOT NULL columns) must hold
    // over them before anything publishes
    val inForce = CommitLogWrite.checksInForce(root, readVersion, schema)
    if (inForce.nonEmpty) {
      val parts = CommitLogWrite.stagedParts(f, stage)
      if (parts.nonEmpty) {
        val staged = SparkSession.active.read.schema(schema).parquet(parts: _*)
        inForce.foreach { case (name, expr) =>
          val bad = CommitLogWrite.violations(staged, expr)
          if (bad > 0) {
            dropStage()
            throw new CommitLog.ConstraintViolationException(name, expr, bad)
          }
        }
      }
    }

    // the group filter may prove NOTHING matched: zero groups scanned
    // and zero rows written is a clean no-op — no version published
    val wroteRows = msgs.map(_.rows).sum + fileMsgs.map(_.rows).sum
    if (op.scannedBatches.isEmpty && wroteRows == 0) {
      dropStage()
      return
    }

    val (added, stats, tupleParts) =
      if (partCols.isEmpty) {
        // an all-deleting statement may write zero rows — the empty
        // batch still publishes (dense versions, exact replace
        // semantics)
        if (!f.exists(stage)) f.mkdirs(stage)
        val dest = new Path(rootP, batchName)
        require(f.rename(stage, dest), s"failed to promote $stage to $dest")
        (Seq(batchName), CommitLogWrite.mergedStats(msgs, batchName),
          Map.empty: CommitLog.Parts)
      } else {
        val grouped = CommitLogWrite.groupByTuple(fileMsgs, batchName)
        grouped.foreach { g =>
          val dest = new Path(rootP, g.batch)
          if (f.exists(dest)) f.delete(dest, true)
          f.mkdirs(dest)
          g.files.foreach { m =>
            val from = new Path(stage, m.visibleName)
            if (f.exists(from)) f.rename(from, new Path(dest, m.visibleName))
          }
        }
        dropStage()
        (grouped.map(_.batch),
          grouped.map(g => g.batch -> CommitLogWrite.boxesOf(
            g.files.flatMap(_.stats))).filter(_._2.nonEmpty).toMap,
          grouped.map(g => g.batch -> g.tokens)
            .toMap: CommitLog.Parts)
      }
    // replace exactly the SCANNED groups (the group filter narrowed
    // them to touched batches); a DV batch whose every reference lies
    // in a removed batch is dead after the rewrite — drop it too, and
    // keep DVs that still guard surviving batches (their entries into
    // removed files can never match a planned partition again). One
    // read over ALL outstanding DVs decides coverage — not one Spark
    // job per prior sparse delete.
    val scanned = op.scannedBatches
    val scannedDirs = scanned
      .map(b => CommitLogMerge.normDir(CommitLog.batchPath(root, b))).toSet
    val dvs = CommitLog.files(root, readVersion)
      .filter(_.startsWith(CommitLogMerge.DvPrefix))
    val coveredDvs = CommitLogMerge.coveredDvBatches(
      SparkSession.active, root, dvs, scannedDirs)
    val removed = scanned ++ coveredDvs

    // CDC MATERIALIZATION: the SQL surface has no per-statement opt-in
    // (the deleteWhere precedent), and a COW rewrite WITHOUT
    // materialized change rows permanently faults every change-feed
    // consumer (`.changes`, readChangeFeed) at this version. Preimage =
    // the scanned groups DV-reconciled (touched-batch sized — the
    // group filter already narrowed them); postimage = the rewrite
    // just promoted. EXCEPT ALL diffs them as MULTISETS, so no table
    // key is needed: DELETE's postimage is a subset by construction
    // (pre-only rows ARE the deletes); UPDATE's sides are the
    // update_preimage/update_postimage rows; a group-based MERGE
    // cannot attribute clause labels without a key, so its sides land
    // as delete/insert — sign-exact under the retraction fold
    // (CommitLogCdf.changeSign), which is the consumer contract.
    // Opt out per table with TBLPROPERTIES('graft.changeFeed'='false');
    // map/variant columns skip too (not comparable — EXCEPT ALL cannot
    // diff them), and the feed refuses such versions with guidance.
    // (Row-TRACKED tables never reach this COW leg — they route
    // through the delta operation, whose DV + postimage commits the
    // feed serves at row granularity; a tracked table's UNMATERIALIZED
    // COW rewrite, possible via the API verbs, is identity-diffed at
    // read time by [[CommitLogCdf.changeFeed]] on `_graft_row_id`.)
    val changeTmp = s"_changes/_tmp-$writeId"
    def dropChanges(): Unit = {
      val p = new Path(rootP, changeTmp)
      if (f.exists(p)) f.delete(p, true)
    }
    val spark = SparkSession.active
    val feedOn = CommitLog.tblPropsOf(root, readVersion)
      .get(CommitLogWrite.ChangeFeedProp).forall(_.toBoolean) &&
      schema.fields.forall(fl => comparable(fl.dataType))
    if (feedOn) {
      import org.apache.spark.sql.functions.lit
      val ddl = Some(CommitLog.bareDdl(schema))
      val formers = CommitLog.formerNamesOf(root, readVersion)
      val post = CommitLogSource.readBatches(
        spark, root, added, ddl, formers, keepMeta = false)
      val pre =
        if (scanned.isEmpty) post.limit(0)
        else CommitLogMerge.snapshotOf(spark, root, scanned, dvs, ddl, formers)
      def side(df: org.apache.spark.sql.DataFrame, label: String) =
        df.withColumn(CommitLogCdf.ChangeTypeCol, lit(label))
      val changes = verb match {
        case "DELETE" => side(pre.exceptAll(post), "delete")
        case "UPDATE" =>
          side(pre.exceptAll(post), "update_preimage")
            .unionByName(side(post.exceptAll(pre), "update_postimage"))
        case _ =>
          side(pre.exceptAll(post), "delete")
            .unionByName(side(post.exceptAll(pre), "insert"))
      }
      changes.write
        .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
        .parquet(s"$root/$changeTmp")
    }

    // COMMIT with the write-serializable conflict matrix: the rewrite
    // publishes at base+1; a losing race REBASES forward if and only
    // if every rival commit was a BLIND DATA APPEND (rows this
    // statement's predicate never saw — they did not exist at its read
    // version; nothing staged is invalidated because the rivals'
    // batches are neither read nor removed). Any other rival —
    // another rewrite, a DV delete, OPTIMIZE, a schema or constraint
    // change — aborts the statement: it may have changed rows this
    // statement read, and a rewrite can never rebase across that.
    // This is what lets continuous ingest and maintenance DML coexist
    // on one table: at 1000 executors an append stream must not abort
    // every DELETE.
    val committedV = CommitLog.rewriteCommitLoop(root, readVersion, verb,
      beforeAttempt = _ => (),
      tryOnce = base => CommitLog.tryCommit(root, base + 1,
        added = added, removed = removed,
        schema = Some(CommitLog.bareDdl(schema)), stats = stats,
        op = Some(verb), parts = tupleParts, partCols = partCols,
        changeFiles = Some(feedOn)),
      cleanup = () => {
        dropChanges()
        added.foreach { b =>
          val p = new Path(rootP, b)
          if (f.exists(p)) f.delete(p, true)
        }
      })
    if (feedOn)
      // rename in only after the version is OURS; a failure is loud
      CommitLogMerge.promoteChanges(spark, root, changeTmp, committedV)
  }

  /** EXCEPT ALL hashes whole rows — map and variant columns are not
    * comparable, so tables carrying them skip CDC materialization (the
    * feed serves those versions at FILE granularity instead — see
    * [[CommitLogChangePlan.partitions]]). */
  private def comparable(dt: org.apache.spark.sql.types.DataType): Boolean =
    CommitLogCdf.multisetComparable(dt)

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(s"$root/$stageName")
    val f = FileSystem.get(p.toUri,
      SparkSession.active.sessionState.newHadoopConf())
    if (f.exists(p)) f.delete(p, true)
  }
}
