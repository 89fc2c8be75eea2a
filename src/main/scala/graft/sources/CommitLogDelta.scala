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

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(CommitLogSource.RowFileCol),
    Expressions.column(CommitLogSource.RowPosCol))

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
  * position file (either may be absent). */
case class CommitLogDeltaCommitMessage(
    data: Option[CommitLogCommitMessage],
    dv: Option[CommitLogCommitMessage]) extends WriterCommitMessage

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

  override def toBatch: DeltaBatchWrite = this

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    CommitLogDeltaWriterFactory(s"$root/$stageName", dataSchema)

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
    // CHECKs in force must hold over them before anything publishes
    val inForce = CommitLog.constraintsOf(root, readVersion)
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
    // WriteSerializable conflict matrix (the COW twin's discipline,
    // CommitLogRowLevel.scala): a rival BLIND DATA APPEND does not
    // abort — its rows did not exist at the read version and this
    // delta's DV positions reference files the rival neither removed
    // nor touched; rebase forward. Any other rival aborts.
    var base = readVersion
    var committed = false
    var attempts = 0
    while (!committed && attempts < 50) {
      attempts += 1
      if (CommitLog.tryCommit(root, base + 1, added, removed = Nil,
          stats = stats, op = Some(verb)))
        committed = true
      else CommitLog.appendOnlySince(root, base) match {
        case Some(latest) => base = latest
        case None =>
          added.foreach { b =>
            val p = new Path(rootP, b)
            if (f.exists(p)) f.delete(p, true)
          }
          throw new java.util.ConcurrentModificationException(
            s"$verb (delta) lost the race at v${base + 1} of $root: a " +
              "rival other than a blind append committed first — re-run " +
              "the statement (a row-level delta only rebases across pure " +
              "appends; any other rival may have changed rows this " +
              "statement read)")
      }
    }
    if (!committed)
      throw new IllegalStateException(
        s"$verb (delta) on $root gave up after 50 rebase attempts (livelock?)")
    if ((base + 1) % CommitLog.checkpointInterval == 0)
      CommitLog.writeCheckpoint(root, base + 1)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(s"$root/$stageName")
    val f = FileSystem.get(p.toUri,
      SparkSession.active.sessionState.newHadoopConf())
    if (f.exists(p)) f.delete(p, true)
  }
}

case class CommitLogDeltaWriterFactory(
    stageDir: String, dataSchema: StructType) extends DeltaWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new CommitLogDeltaWriter(stageDir, dataSchema,
      f"p$partitionId%05d-t$taskId")
}

/** Task-side delta writer: inserts/postimages stream to a data file,
  * deleted row ids (file, pos) to a DV file — both through the
  * standard task writer, opened lazily so an all-noop task leaves no
  * bytes. The id row arrives in [[CommitLogDeltaOperation.rowId]]
  * order, which IS the DV schema (_file, _pos). */
class CommitLogDeltaWriter(
    stageDir: String, dataSchema: StructType, suffix: String)
    extends DeltaWriter[InternalRow] {

  private val dvSchema = StructType(Seq(
    StructField("_file", StringType), StructField("_pos", LongType)))
  private lazy val dataW = new CommitLogDataWriter(
    stageDir, dataSchema, s"_d-$suffix.parquet.tmp", s"data-$suffix.parquet")
  private lazy val dvW = new CommitLogDataWriter(
    stageDir, dvSchema, s"_v-$suffix.parquet.tmp", s"dvpart-$suffix.parquet")
  private var dataUsed = false
  private var dvUsed = false

  override def insert(row: InternalRow): Unit = {
    dataUsed = true
    dataW.write(row)
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    dvUsed = true
    dvW.write(id)
  }

  override def update(
      metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def commit(): WriterCommitMessage =
    CommitLogDeltaCommitMessage(
      if (dataUsed) Some(dataW.commit().asInstanceOf[CommitLogCommitMessage])
      else None,
      if (dvUsed) Some(dvW.commit().asInstanceOf[CommitLogCommitMessage])
      else None)

  override def abort(): Unit = {
    if (dataUsed) dataW.abort()
    if (dvUsed) dvW.abort()
  }

  override def close(): Unit = ()
}
