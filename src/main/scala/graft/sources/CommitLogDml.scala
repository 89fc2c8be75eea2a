package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** DELETE WHERE / UPDATE SET … WHERE over the [[CommitLog]] — the two
  * row-level verbs a lakehouse user runs between merges (Delta's
  * `DELETE FROM t WHERE …` / `UPDATE t SET … WHERE …`), sharing
  * [[CommitLogMerge]]'s write-amplification dial and concurrency
  * contract.
  *
  * Unlike MERGE, the caller brings no change set: the verb FINDS the
  * affected rows by predicate. The find phase is a column-pruned scan —
  * only the columns the predicate (and, for UPDATE, the assignments)
  * reference are read, plus the row position — reconciled against any
  * outstanding deletion vectors. Everything downstream is matched- or
  * touched-batch-sized.
  *
  * Physical leg per commit, chosen exactly like MERGE:
  *  - matched fraction of the touched batches < `dvFraction` →
  *    '''DV append''': the matched (file, row_index) positions land as
  *    a `dv-` batch (UPDATE also appends the postimage rows); nothing
  *    rewrites. Deleting fifty rows from a million-row file costs
  *    fifty positions.
  *  - at or above → '''COW rewrite''': touched batches rewrite without
  *    the deleted rows / with assignments applied; DV batches the
  *    rewrite fully covers drop from the manifest (the verb doubles as
  *    compaction).
  *
  * UPDATE postimages are validated against the CHECK constraints in
  * force BEFORE anything is staged — an `UPDATE … SET price = -1`
  * fails with [[CommitLog.ConstraintViolationException]], no version
  * consumed (DELETE cannot violate a row invariant; it only removes
  * rows).
  *
  * Both verbs publish SERIALIZABLE-conservative like MERGE: exactly
  * `readVersion + 1` via [[CommitLog.tryCommit]], throwing
  * `ConcurrentModificationException` if any rival committed first —
  * never a rebase, because the rival may have changed rows the find
  * phase already read. A predicate matching nothing is a no-op: no
  * version is published.
  *
  * `changeFeed = true` materializes the verb's CDC rows (`delete` /
  * `update_preimage` + `update_postimage`) to `_changes/v<N>/` with
  * MERGE's stage-then-rename-after-win protocol, so
  * [[CommitLogCdf.changeFeed]] and the connector's `readChangeFeed`
  * stream through a DML commit exactly as through a merge.
  */
object CommitLogDml {

  final case class DmlStats(
      version: Int, leg: String, affected: Long,
      touchedBatches: Seq[String], removedBatches: Seq[String])

  /** DELETE FROM the table: remove every visible row where `condition`
    * evaluates TRUE (NULL keeps the row — SQL DELETE semantics). */
  def delete(
      spark: SparkSession, root: String, condition: String,
      dvFraction: Double = 0.3, readVersion: Int = -1,
      changeFeed: Boolean = false): DmlStats =
    run(spark, root, condition, assignments = Nil, dvFraction,
      readVersion, changeFeed)

  /** UPDATE the table: apply `assignments` (column → SQL expression
    * over the old row) to every visible row where `condition`
    * evaluates TRUE. Assigned columns must exist — this verb never
    * changes the schema. */
  def update(
      spark: SparkSession, root: String, condition: String,
      assignments: Seq[(String, String)],
      dvFraction: Double = 0.3, readVersion: Int = -1,
      changeFeed: Boolean = false): DmlStats = {
    require(assignments.nonEmpty, "UPDATE needs at least one assignment")
    run(spark, root, condition, assignments, dvFraction,
      readVersion, changeFeed)
  }

  private def run(
      spark: SparkSession, root: String, condition: String,
      assignments: Seq[(String, String)],
      dvFraction: Double, readVersion: Int,
      changeFeed: Boolean): DmlStats = {
    val isUpdate = assignments.nonEmpty
    val verb = if (isUpdate) "UPDATE" else "DELETE"
    val readV = if (readVersion < 0) CommitLog.latestVersion(root) else readVersion
    val (dvs, datas) =
      CommitLog.files(root, readV).partition(_.startsWith(CommitLogMerge.DvPrefix))
    require(datas.nonEmpty, s"cannot $verb in empty table $root")
    // row-tracked tables: the hidden row-id column must ride the
    // copy-on-write rewrite (survivors AND update postimages keep
    // their ids — preservation is just `col(_graft_row_id)` passing
    // through the projection)
    val schemaDdl = CommitLog.rewriteDdl(root, readV)
    require(!assignments.exists(_._1 == CommitLogWrite.RowIdCol),
      s"${CommitLogWrite.RowIdCol} is the engine's row-tracking " +
        "column — it cannot be assigned")
    val formers = CommitLog.formerNamesOf(root, readV)
    val tableSchema = CommitLogSource.readBatches(
      spark, root, datas, schemaDdl).schema
    val dataCols = tableSchema.fieldNames.toSeq
    assignments.foreach { case (c, _) =>
      require(dataCols.contains(c),
        s"$verb assigns unknown column '$c' (table has $dataCols)")
    }
    // GENERATED columns: the definition owns them — explicit
    // assignment refuses (the ALWAYS contract), and every UPDATE
    // postimage RECOMPUTES them after the assignments apply, so an
    // assignment to a source column can never leave a stale generated
    // value (whose stale partition tuple would then mis-prune derived
    // filters). Recomputing unchanged rows is a semantic no-op: the
    // invariant already held on them.
    val genExprs: Map[String, String] =
      CommitLog.tblPropsOf(root, readV).collect {
        case (k, sql) if k.startsWith(CommitLogWrite.GeneratedPropPrefix) =>
          k.stripPrefix(CommitLogWrite.GeneratedPropPrefix) -> sql
      }
    assignments.foreach { case (c, _) =>
      require(!genExprs.contains(c),
        s"column '$c' is GENERATED ALWAYS AS (${genExprs.getOrElse(c, "")}) " +
          "— the definition owns it; assign its source columns instead")
    }
    // same binding as the sink (ANSI cast, refuse-don't-null):
    // CommitLogWrite.regenFrame, not session-semantics expr().cast()
    def regen(df: DataFrame): DataFrame =
      CommitLogWrite.regenFrame(df, tableSchema,
        CommitLog.tblPropsOf(root, readV))
    // TRUE-only match (SQL DML semantics: NULL predicate leaves the row)
    val hit = coalesce(expr(condition), lit(false))

    // ---- find phase: predicate/assignment columns + position only ----
    def refsOf(sqlExpr: String): Seq[String] =
      spark.sessionState.sqlParser.parseExpression(sqlExpr).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          a.name
      }.distinct
    val needed =
      (refsOf(condition) ++ assignments.flatMap(a => refsOf(a._2))).distinct
    needed.foreach(c => require(dataCols.contains(c),
      s"$verb references unknown column '$c' (table has $dataCols)"))
    val narrow = CommitLogSource.readBatches(spark, root, datas, schemaDdl,
        formers, keepMeta = true)
      .select(needed.map(col) :+
        col("_metadata.file_path").as("_file") :+
        col("_metadata.row_index").as("_pos"): _*)
    val reconciled =
      if (dvs.isEmpty) narrow
      else CommitLogMerge.dvAntiJoin(narrow,
        spark.read.schema(CommitLogMerge.dvSchema).parquet(
          dvs.map(b => CommitLog.batchPath(root, b)): _*))
    val matched = reconciled.filter(hit)
      .withColumn("_batch", regexp_extract(col("_file"), "^(.*)/[^/]+$", 1))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val affected = matched.count()
      if (affected == 0) return DmlStats(readV, "noop", 0, Nil, Nil)
      val byDir = CommitLogMerge.dirToName(root, datas)
      val touched = matched.select(col("_batch")).distinct()
        .collect()
        .map(r => byDir(CommitLogMerge.normDir(r.getString(0)))).toSeq.sorted
      val touchedRows = CommitLogSource.readBatches(spark, root, touched,
        schemaDdl).count()
      val changedFraction =
        if (touchedRows == 0) 1.0 else affected.toDouble / touchedRows

      // full-width reconciled rows of the touched batches — the only
      // full-width read, and it is touched-sized, not table-sized
      def touchedFull: DataFrame = {
        val base = CommitLogSource.readBatches(
            spark, root, datas.filter(touched.contains), schemaDdl,
            formers, keepMeta = true)
          .withColumn("_file", col("_metadata.file_path"))
          .withColumn("_pos", col("_metadata.row_index"))
        val vis =
          if (dvs.isEmpty) base
          else CommitLogMerge.dvAntiJoin(base,
            spark.read.schema(CommitLogMerge.dvSchema).parquet(
              dvs.map(b => CommitLog.batchPath(root, b)): _*))
        vis.drop("_file", "_pos", "_metadata")
      }
      def applied(c: String): Column =
        assignments.toMap.get(c).map(e => expr(e).as(c)).getOrElse(col(c))

      // assignment results must keep the declared column type — a
      // type-drifted postimage would land parquet the table's schema
      // can no longer read back (analysis-only, nothing executes)
      if (isUpdate) {
        val postSchema = CommitLogSource.readBatches(
            spark, root, datas, schemaDdl, formers, keepMeta = false)
          .select(dataCols.map(applied): _*).schema
        dataCols.foreach { c =>
          val (got, want) = (postSchema(c).dataType, tableSchema(c).dataType)
          require(got == want,
            s"UPDATE assigns $got to column '$c' which is $want — " +
              "cast explicitly in the assignment")
        }
      }

      // postimages violating a CHECK in force (declared CHECKs + the
      // DDL's NOT NULL columns) fail BEFORE staging
      if (isUpdate) {
        val post = touchedFull.filter(hit).select(dataCols.map(applied): _*)
        val inForce = CommitLogWrite.checksInForce(root, readV, post.schema)
        if (inForce.nonEmpty) {
          inForce.foreach { case (name, ce) =>
            val bad = post.filter(not(coalesce(expr(ce), lit(true)))).count()
            if (bad > 0)
              throw new CommitLog.ConstraintViolationException(name, ce, bad)
          }
        }
      }

      val next = readV + 1
      val tag = java.util.UUID.randomUUID().toString.take(8)
      val (added, removed, leg) =
        if (changedFraction < dvFraction &&
            affected + CommitLogMerge.outstandingDvRows(spark, root, dvs) <=
              CommitLogMerge.dvCap(spark)) {
          // fraction AND absolute-position dial (see CommitLogMerge.
          // DvCapConf): past the cap, the COW leg pays the rewrite
          // instead of growing plan-time DV state past what the
          // driver may hold
          // ---- DV leg: positions (+ postimages for UPDATE) ----
          val dvBatch = s"${CommitLogMerge.DvPrefix}$next-$tag"
          matched.select(col("_file"), col("_pos"))
            .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dvBatch")
          if (isUpdate) {
            val dataBatch = s"u$next-$tag"
            regen(touchedFull.filter(hit).select(dataCols.map(applied): _*))
              .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dataBatch")
            (Seq(dataBatch, dvBatch), Nil, "dv")
          } else (Seq(dvBatch), Nil, "dv")
        } else {
          // ---- COW leg: rewrite touched, compact covered DVs ----
          val survivors =
            if (isUpdate)
              regen(touchedFull.select(dataCols.map(c =>
                when(hit, applied(c)).otherwise(col(c)).as(c)): _*))
            else touchedFull.filter(!hit)
          // ONE read over all outstanding DVs (r16: the per-dv filter
          // ran one Spark job per vector); dvs order preserved
          val coveredSet = CommitLogMerge.coveredDvBatches(spark, root, dvs,
            touched.map(b =>
              CommitLogMerge.normDir(CommitLog.batchPath(root, b))).toSet).toSet
          val coveredDvs = dvs.filter(coveredSet)
          val nSurvivors = survivors.count()
          if (nSurvivors == 0 && !isUpdate)
            // every row of every touched batch deleted: pure removal
            (Nil, touched ++ coveredDvs, "cow")
          else {
            val rw = s"${if (isUpdate) "u" else "d"}$next-$tag"
            survivors.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$rw")
            (Seq(rw), touched ++ coveredDvs, "cow")
          }
        }

      // CDC rows, staged hidden, renamed in only after the version wins
      val changeTmp = s"_changes/_tmp-$tag"
      if (changeFeed) {
        val pre = touchedFull.filter(hit)
        val rows =
          if (isUpdate)
            pre.select(dataCols.map(col) :+
                lit("update_preimage").as("_change_type"): _*)
              .unionByName(regen(pre.select(dataCols.map(applied): _*))
                .withColumn("_change_type", lit("update_postimage")))
          else
            pre.select(dataCols.map(col) :+ lit("delete").as("_change_type"): _*)
        rows.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$changeTmp")
      }

      if (!CommitLog.tryCommit(root, next, added, removed, op = Some(verb),
          changeFiles = Some(changeFeed))) {
        if (changeFeed) {
          val p = new org.apache.hadoop.fs.Path(s"$root/$changeTmp")
          val f = org.apache.hadoop.fs.FileSystem.get(
            p.toUri, spark.sessionState.newHadoopConf())
          if (f.exists(p)) f.delete(p, true)
        }
        throw new java.util.ConcurrentModificationException(
          s"$verb lost the race at v$next of $root: a rival committed " +
            "first — re-read and re-run (row-level verbs never rebase: " +
            "the rival may have changed rows this find phase read)")
      }
      if (changeFeed)
        CommitLogMerge.promoteChanges(spark, root, changeTmp, next)
      if (next % CommitLog.checkpointInterval == 0)
        CommitLog.writeCheckpoint(root, next)
      DmlStats(next, leg, affected, touched, removed)
    } finally matched.unpersist()
  }
}
