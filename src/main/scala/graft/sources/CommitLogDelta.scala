package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DELTA-BASED row-level SQL over the commit log — Spark's
  * `SupportsDelta` refinement of `SupportsRowLevelOperations`, the
  * MERGE-ON-READ twin of [[CommitLogRowLevelOperation]]'s group-based
  * copy-on-write. Selected per session by
  * `spark.graft.rowLevel.mode = delta` (default `cow`).
  *
  * Where the group-based plan REPLACES whole batches (read every
  * touched batch, rewrite every surviving row), the delta plan writes
  * ONLY the changed rows: Spark's rewrite rules feed this operation's
  * writer a stream of per-row verbs — `delete(rowId)` /
  * `update(rowId, newRow)` / `insert(row)` — keyed by the row identity
  * `(_row_file, _row_pos)` the scan exposes as metadata columns (the
  * same (file, position) identity deletion vectors use). The write
  * lands as at most TWO batches in one serializable commit:
  *
  *  - a `dv-` POSITION batch: every deleted/updated row's (file, pos)
  *    — [[CommitLogMerge]]'s merge-on-read contract, reconciled by
  *    every read path at plan time;
  *  - a data batch of inserted rows and update postimages.
  *
  * An UPDATE of 50 rows in a million-row table costs 50 positions +
  * 50 postimage rows — the S23 write amplification, now behind plain
  * SQL `UPDATE`/`MERGE INTO`/`DELETE`. The standing MOR trade: reads
  * pay the (deletes-sized) DV reconciliation until a COW verb or
  * compaction absorbs the vectors.
  *
  * The scan is the CONNECTOR's standard pruned scan pinned at the
  * operation's read version — unlike the group-based scan, filter
  * pushdown and manifest pruning are SAFE here (an unread row is
  * simply not matched; nothing unread is rewritten away), so the
  * matched-row search prunes from boxes/blooms/partition tuples like
  * any query. Commits are WRITE-SERIALIZABLE: rival blind data appends
  * rebase past (their rows did not exist at the read version; the DV
  * positions reference files they never touched), every other rival
  * aborts — the DML discipline; CHECK constraints in force validate
  * inserted rows and postimages pre-publish. */
class CommitLogDeltaOperation(
    root: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation with SupportsDelta {

  private[sources] val readVersion = CommitLog.latestVersion(root)

  /** Row-tracked table: the hidden row id rides the statement as a
    * METADATA attribute — update postimages then land with their
    * PRESERVED id (the group-based COW twin cannot do this: Spark's
    * replace-data projection strips metadata before the writer, which
    * is why tracked tables always route through THIS operation). */
  private[sources] val tracked = CommitLogWrite.rowTrackingOn(
    CommitLog.tblPropsOf(root, readVersion))

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(CommitLogSource.RowFileCol),
    Expressions.column(CommitLogSource.RowPosCol))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (tracked) Array(Expressions.column(CommitLogWrite.RowIdCol))
    else Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val pinned = new java.util.HashMap[String, String](options)
    pinned.put("versionAsOf", readVersion.toString)
    new CommitLogScanBuilder(root,
      CommitLogSource.tableSchema(root, readVersion),
      new CaseInsensitiveStringMap(pinned))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new CommitLogDeltaWrite(root, readVersion, info.schema(), cmd.toString)
    }
}

/** One task's staged delta: its postimage/insert file and its DV
  * position file (either may be absent). `maxK` = the highest row-id
  * allocation step this task consumed (-1 = none), for the driver's
  * watermark advance. */
case class CommitLogDeltaCommitMessage(
    data: Option[CommitLogCommitMessage],
    dv: Option[CommitLogCommitMessage],
    maxK: Long = -1L) extends WriterCommitMessage

/** The delta write: at most one data batch + one `dv-` batch,
  * committed together at exactly `readVersion + 1`. */
class CommitLogDeltaWrite(
    root: String, readVersion: Int, dataSchema: StructType, verb: String)
    extends DeltaWrite with DeltaBatchWrite {

  private val writeId = EnvelopeBatchWrite.nextWriteId()
  private val stageName = s"stage-$writeId"
  private val tag = writeId.takeRight(8)
  private val dataBatch = s"dl$writeId"
  private val dvBatch = s"${CommitLogMerge.DvPrefix}${readVersion + 1}-$tag"

  // ROW TRACKING: postimages/inserts land with the hidden row-id
  // column — preserved ids arrive as the statement's metadata
  // attribute, fresh ids (MERGE inserts) allocate from the watermark
  // in force exactly like the sink's identity ladder, and the commit
  // advances the watermark with a planned-against precondition.
  private val tblProps = CommitLog.tblPropsOf(root, readVersion)
  private val tracked = CommitLogWrite.rowTrackingOn(tblProps)
  private val writeSchema =
    if (tracked) CommitLogWrite.withRowId(dataSchema) else dataSchema
  private val hwmKey =
    CommitLogWrite.IdentityHwmPrefix + CommitLogWrite.RowIdCol
  private val plannedHwm: Option[Long] = tblProps.get(hwmKey).map(_.toLong)
  private val baseK: Long =
    plannedHwm.map(h => Math.addExact(h, 1L)).getOrElse(0L)
  private val idBlock: Long = {
    val b = tblProps.get(CommitLogWrite.IdentityBlockProp).map(_.toLong)
      .getOrElse(CommitLogWrite.DefaultIdentityBlock)
    require(b > 0,
      s"${CommitLogWrite.IdentityBlockProp} must be positive, got $b")
    b
  }

  override def toBatch: DeltaBatchWrite = this

  // GENERATED columns recompute on every postimage/insert (see the COW
  // twin's rationale in CommitLogReplaceWrite) — bound once here,
  // evaluated task-side after the row is padded to the write schema
  private val generators = CommitLogWrite.boundGenerators(
    writeSchema, tblProps)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    CommitLogDeltaWriterFactory(s"$root/$stageName", writeSchema,
      if (tracked) writeSchema.fieldIndex(CommitLogWrite.RowIdCol) else -1,
      baseK, info.numPartitions(), idBlock, generators.toArray)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val rootP = new Path(root)
    val f = FileSystem.get(rootP.toUri, spark.sessionState.newHadoopConf())
    val stage = new Path(rootP, stageName)
    def dropStage(): Unit = if (f.exists(stage)) f.delete(stage, true)

    val msgs = messages.collect { case m: CommitLogDeltaCommitMessage => m }
    CommitLogWrite.promoteTaskFiles(f, stage,
      (msgs.flatMap(_.data) ++ msgs.flatMap(_.dv))
        .map(m => (m.tmpName, m.visibleName)))

    val dataMsgs = msgs.flatMap(_.data)
    val dvMsgs = msgs.flatMap(_.dv)
    if (dataMsgs.isEmpty && dvMsgs.isEmpty) {
      // nothing matched and nothing inserted: clean no-op, no version
      dropStage()
      return
    }

    // inserted rows and update postimages are NEW table content — the
    // CHECKs in force (declared CHECKs + the DDL's NOT NULL columns)
    // must hold over them before anything publishes
    val inForce = CommitLogWrite.checksInForce(root, readVersion, dataSchema)
    if (inForce.nonEmpty && dataMsgs.nonEmpty) {
      val parts = dataMsgs.map(m => s"$root/$stageName/${m.visibleName}")
        .filter(p => f.exists(new Path(p)))
      if (parts.nonEmpty) {
        val staged = spark.read.schema(dataSchema).parquet(parts: _*)
        inForce.foreach { case (name, expr) =>
          val bad = CommitLogWrite.violations(staged, expr)
          if (bad > 0) {
            dropStage()
            throw new CommitLog.ConstraintViolationException(name, expr, bad)
          }
        }
      }
    }

    // level 2: move each kind's visible files into its batch dir
    def promote(kind: Seq[CommitLogCommitMessage], batch: String): Unit = {
      val dest = new Path(rootP, batch)
      if (f.exists(dest)) f.delete(dest, true) // crashed earlier attempt
      f.mkdirs(dest)
      kind.foreach { m =>
        val from = new Path(stage, m.visibleName)
        if (f.exists(from)) f.rename(from, new Path(dest, m.visibleName))
      }
    }
    if (dataMsgs.nonEmpty) promote(dataMsgs, dataBatch)
    if (dvMsgs.nonEmpty) promote(dvMsgs, dvBatch)
    dropStage()

    val added = (if (dataMsgs.nonEmpty) Seq(dataBatch) else Nil) ++
      (if (dvMsgs.nonEmpty) Seq(dvBatch) else Nil)
    val stats = CommitLogWrite.mergedStats(dataMsgs, dataBatch)
    // row-id watermark advance: fresh allocations must land the new
    // watermark in the SAME commit, and the staged ids were derived
    // from plannedHwm — a rival that advanced it first (e.g. a blind
    // append allocating its own ids) may collide, so the precondition
    // is re-checked per rebase attempt and aborts instead of rebasing
    val maxK = msgs.map(_.maxK).foldLeft(-1L)(math.max)
    val hwmProps: Map[String, Option[String]] =
      if (maxK < 0) Map.empty
      else Map(hwmKey -> Some(Math.addExact(baseK, maxK).toString))
    def checkHwm(base: Int): Unit =
      if (maxK >= 0 &&
          CommitLog.tblPropsOf(root, base).get(hwmKey)
            .map(_.toLong) != plannedHwm) {
        added.foreach { b =>
          val p = new Path(rootP, b)
          if (f.exists(p)) f.delete(p, true)
        }
        throw new java.util.ConcurrentModificationException(
          s"$verb (delta) on $root: a rival advanced the row-id " +
            s"watermark past the value this statement planned against " +
            s"($plannedHwm) — its staged ids may collide; re-run the " +
            "statement")
      }
    // WriteSerializable conflict matrix (the COW twin's discipline,
    // CommitLogRowLevel.scala): a rival BLIND DATA APPEND does not
    // abort — its rows did not exist at the read version and this
    // delta's DV positions reference files the rival neither removed
    // nor touched; rebase forward. Any other rival aborts.
    CommitLog.rewriteCommitLoop(root, readVersion, s"$verb (delta)",
      beforeAttempt = checkHwm,
      tryOnce = base => CommitLog.tryCommit(root, base + 1, added,
        removed = Nil, stats = stats, op = Some(verb), props = hwmProps),
      cleanup = () => added.foreach { b =>
        val p = new Path(rootP, b)
        if (f.exists(p)) f.delete(p, true)
      })
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(s"$root/$stageName")
    val f = FileSystem.get(p.toUri,
      SparkSession.active.sessionState.newHadoopConf())
    if (f.exists(p)) f.delete(p, true)
  }
}

case class CommitLogDeltaWriterFactory(
    stageDir: String, writeSchema: StructType,
    rowIdOrdinal: Int = -1, baseK: Long = 0L,
    numPartitions: Int = 1,
    idBlock: Long = CommitLogWrite.DefaultIdentityBlock,
    gens: Array[(Int, org.apache.spark.sql.catalyst.expressions.Expression)] =
      Array.empty)
    extends DeltaWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new CommitLogDeltaWriter(stageDir, writeSchema,
      f"p$partitionId%05d-t$taskId",
      rowIdOrdinal, baseK, partitionId, numPartitions, idBlock, gens)
}

/** Task-side delta writer: inserts/postimages stream to a data file,
  * deleted row ids (file, pos) to a DV file — both through the
  * standard task writer, opened lazily so an all-noop task leaves no
  * bytes. The id row arrives in [[CommitLogDeltaOperation.rowId]]
  * order, which IS the DV schema (_file, _pos).
  *
  * On a ROW-TRACKED table (`rowIdOrdinal >= 0`) every written row
  * carries the hidden row-id column: update postimages take their
  * PRESERVED id from the statement's metadata attribute, inserts
  * allocate fresh ids from the sink's coordination-free k-block ladder
  * (task p, block j covers baseK + (p + j·numPartitions)·B …) and the
  * driver advances the watermark in the data commit. */
class CommitLogDeltaWriter(
    stageDir: String, writeSchema: StructType, suffix: String,
    rowIdOrdinal: Int = -1, baseK: Long = 0L,
    partitionId: Int = 0, numPartitions: Int = 1,
    idBlock: Long = CommitLogWrite.DefaultIdentityBlock,
    gens: Array[(Int, org.apache.spark.sql.catalyst.expressions.Expression)] =
      Array.empty)
    extends DeltaWriter[InternalRow] {

  /** Row transforms this writer applies before the parquet encode:
    * pad + row-id fill (tracked tables), generated-column recompute. */
  private val rewrites = rowIdOrdinal >= 0 || gens.nonEmpty

  private val dvSchema = StructType(Seq(
    StructField("_file", StringType), StructField("_pos", LongType)))
  private lazy val dataW = new CommitLogDataWriter(
    stageDir, writeSchema, s"_d-$suffix.parquet.tmp", s"data-$suffix.parquet")
  private lazy val dvW = new CommitLogDataWriter(
    stageDir, dvSchema, s"_v-$suffix.parquet.tmp", s"dvpart-$suffix.parquet")
  private var dataUsed = false
  private var dvUsed = false

  private val types = writeSchema.fields.map(_.dataType)
  private var j = 0L // fresh ids this task allocated
  private var maxK = -1L

  /** The row padded to the write schema, generated ordinals
    * recomputed, and (tracked tables) the row-id slot filled:
    * `id` >= 0 preserves, -1 allocates fresh from the ladder. */
  private def withId(row: InternalRow, id: Long): InternalRow = {
    val out = new org.apache.spark.sql.catalyst.expressions
      .GenericInternalRow(types.length)
    val n = math.min(types.length, row.numFields)
    var i = 0
    while (i < n) {
      out(i) = if (row.isNullAt(i)) null else row.get(i, types(i))
      i += 1
    }
    var g = 0
    while (g < gens.length) {
      val (gi, e) = gens(g)
      out(gi) = e.eval(out)
      g += 1
    }
    if (rowIdOrdinal >= 0)
      out(rowIdOrdinal) =
        if (id >= 0) Long.box(id)
        else {
          val k = Math.addExact(
            Math.multiplyExact(
              Math.addExact(partitionId.toLong,
                Math.multiplyExact(j / idBlock, numPartitions.toLong)),
              idBlock),
            j % idBlock)
          j += 1
          if (k > maxK) maxK = k
          Long.box(Math.addExact(baseK, k))
        }
    out
  }

  override def insert(row: InternalRow): Unit = {
    dataUsed = true
    if (!rewrites) dataW.write(row)
    else dataW.write(withId(row, -1L))
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    dvUsed = true
    dvW.write(id)
  }

  override def update(
      metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(metadata, id)
    dataUsed = true
    if (!rewrites) dataW.write(row)
    else dataW.write(withId(row, {
      // the metadata attribute is exactly [_graft_row_id] on tracked
      // tables (empty otherwise — generators alone also take this
      // path). On a TRACKED table a missing/null id is a broken
      // preservation contract — minting a fresh one here would be
      // silent identity drift (the feed's fold would see a
      // delete+insert instead of an update), so refuse loudly.
      if (rowIdOrdinal < 0) -1L
      else if (metadata == null || metadata.numFields == 0 ||
          metadata.isNullAt(0))
        throw new IllegalStateException(
          "row-tracked UPDATE arrived without its preserved row id " +
            "(metadata attribute null/missing) — refusing to mint a " +
            "fresh identity for an existing row")
      else metadata.getLong(0)
    }))
  }

  override def commit(): WriterCommitMessage =
    CommitLogDeltaCommitMessage(
      if (dataUsed) Some(dataW.commit().asInstanceOf[CommitLogCommitMessage])
      else None,
      if (dvUsed) Some(dvW.commit().asInstanceOf[CommitLogCommitMessage])
      else None,
      maxK)

  override def abort(): Unit = {
    if (dataUsed) dataW.abort()
    if (dvUsed) dvW.abort()
  }

  override def close(): Unit = ()
}
