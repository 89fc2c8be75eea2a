package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE INTO over the [[CommitLog]] — the one-verb composition a
  * lakehouse user runs hourly: reconcile the table against a keyed
  * change set (`_op` column: 'U' upsert / 'D' delete) with
  *
  *  - WHEN MATCHED AND op='D'  → DELETE the row
  *  - WHEN MATCHED AND op='U'  → UPDATE (replace non-key columns)
  *  - WHEN NOT MATCHED AND op='U' → INSERT
  *  - WHEN NOT MATCHED AND op='D' → no-op
  *
  * (C4's relational semantics, `queries/Changelog.scala`, composed with
  * the optimistic commit protocol.)
  *
  * == The write-amplification dial ==
  *
  * The merge picks its physical leg per commit, the S22-vs-S23 design
  * space as one decision:
  *
  *  - '''COW rewrite''' (S22): rewrite every TOUCHED batch (any batch
  *    holding a matched key) into one new batch with updates applied,
  *    deletes dropped, inserts appended; `removed` = the touched
  *    batches (plus any deletion-vector batch whose references they
  *    fully cover — a COW merge doubles as compaction). Reads stay
  *    scan-speed; the delete pays the rewrite.
  *  - '''DV append''' (S23): append only the (file, row_index)
  *    positions of deleted/updated rows as a `dv-` batch plus a batch
  *    of new rows (inserts + update postimages); nothing is removed.
  *    The delete is cheap; reads pay a broadcast anti-join until a COW
  *    merge or compaction reconciles (see [[snapshot]]).
  *
  * Leg choice: changed-row fraction of the touched batches under
  * `dvFraction` → DV (rewriting a million-row file to delete fifty
  * rows is the amplification MOR exists to avoid); at or above → COW.
  *
  * == Concurrency ==
  *
  * A merge is SERIALIZABLE-conservative: it publishes with
  * [[CommitLog.tryCommit]] at exactly `readVersion + 1` and throws
  * `ConcurrentModificationException` if ANY rival committed first —
  * never the append-style rebase, because the rival may have changed
  * rows this merge's match phase already read (Delta arbitrates
  * finer-grained on predicates; coarse-and-sound is the honest start).
  * Two merges on overlapping keys therefore arbitrate: exactly one
  * wins, the loser re-reads and re-runs.
  *
  * == Scale shape ==
  *
  * Match phase: the base side projects ONLY key + row-position columns
  * (column-pruned scan), the change set joins it once on the key, and
  * everything downstream of that join is change-set- or
  * touched-batch-sized. The rewrite pass re-reads just the touched
  * batches. No full-width table scan, no second pass over untouched
  * data — the Delta MERGE two-pass shape.
  *
  * Contracts: `source` carries the table's full column set plus `_op`,
  * one row per key (required — checked); batches are single-level
  * directories under the table root (what every engine write here
  * produces).
  */
object CommitLogMerge {

  final case class MergeStats(
      version: Int, leg: String,
      inserted: Long, updated: Long, deleted: Long,
      touchedBatches: Seq[String], removedBatches: Seq[String])

  private[graft] val DvPrefix = "dv-"

  /** Map a batch's resolved data DIRECTORY back to its manifest name —
    * the inverse of [[CommitLog.batchPath]], needed because
    * `_metadata.file_path` yields physical paths while manifests hold
    * names (which, for a shallow clone's external references, differ
    * from the directory's own basename). */
  private[sources] def dirToName(
      root: String, names: Seq[String]): Map[String, String] =
    names.map(n => normDir(CommitLog.batchPath(root, n)) -> n).toMap

  /** Scheme-stripped directory path ('file:///a/b' and '/a/b' agree). */
  private[sources] def normDir(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** [[normDir]] as a Column: scheme (+authority) stripped to the URI
    * path. DV batches on disk carry BOTH spellings — the row leg's
    * stamp writes scheme-stripped paths, `_metadata.file_path` carries
    * the `file:` scheme — so every (file, pos) reconcile join must
    * normalize BOTH sides or rows a differently-spelled DV killed
    * would silently resurrect. */
  private[sources] def normFileCol(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, "^[A-Za-z][-A-Za-z0-9+.]*:(//[^/]*)?", "")

  /** Deletion-vector file schema — fixed by every DV write site
    * ((_file, _pos) selects before the parquet write). Passing it to
    * the internal read-backs skips the per-read footer schema-inference
    * job (r16: mergeSchemasInParallel showed up in the driver profile
    * of every DML decl). */
  private[sources] val dvSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_pos",
        org.apache.spark.sql.types.LongType)))

  /** The DV reconcile: base rows (carrying `_file`, `_pos`) minus the
    * DV positions — spelling-normalized on both sides. */
  private[sources] def dvAntiJoin(
      base: DataFrame, dv: DataFrame): DataFrame =
    // the join key uses an engine-reserved name: a plain `_nf` could
    // shadow (and then drop) a user column of that name on the
    // full-width frames COW rewrites pass through here
    base.withColumn("__graft_nf", normFileCol(col("_file")))
      .join(
        broadcast(dv.select(
          normFileCol(col("_file")).as("__graft_nf"), col("_pos"))),
        Seq("__graft_nf", "_pos"), "left_anti")
      .drop("__graft_nf")

  /** Hard ceiling on the deletion-vector positions a single table may
    * carry into driver-side plan state (`dvPositionsByFile` collects
    * them; 16M longs ≈ 128 MB). "Deletes-sized" is unbounded in
    * adversarial workloads — 10⁹ outstanding sparse deletes would be
    * ~8 GB of driver arrays — so the WRITE legs route past-cap
    * statements to copy-on-write and the READ path refuses with
    * compaction guidance instead of silently OOMing the driver. */
  private[graft] val DvCapConf = "spark.graft.dv.maxPlannedPositions"
  private[sources] val DvCapDefault: Long = 16L << 20

  private[sources] def dvCap(spark: SparkSession): Long =
    spark.conf.get(DvCapConf, DvCapDefault.toString).toLong

  /** Total outstanding DV positions — a footer-count job, no data read. */
  private[sources] def outstandingDvRows(
      spark: SparkSession, root: String, dvs: Seq[String]): Long =
    if (dvs.isEmpty) 0L
    else spark.read.schema(dvSchema)
      .parquet(dvs.map(b => CommitLog.batchPath(root, b)): _*).count()

  /** Outstanding deletion-vector positions grouped by the
    * scheme-stripped path of the data FILE they reference —
    * deletes-sized by the MOR contract AND capped (see [[DvCapConf]]),
    * collected once at plan time and attached to the file's partition
    * for sequential skipping. */
  private[sources] def dvPositionsByFile(
      spark: SparkSession, root: String,
      dvBatches: Seq[String]): Map[String, Array[Long]] =
    if (dvBatches.isEmpty) Map.empty
    else {
      val df = spark.read.schema(dvSchema)
        .parquet(dvBatches.map(b => CommitLog.batchPath(root, b)): _*)
      val total = df.count() // footer-only, no data pages
      val cap = dvCap(spark)
      if (total > cap)
        throw new IllegalStateException(
          s"$root carries $total outstanding deletion-vector positions " +
            s"(> $DvCapConf = $cap): planning would materialize them on " +
            "the driver — run CommitLogOptimize.purge (REORG APPLY " +
            "PURGE: applies the vectors executor-side and drops them, " +
            "never driver-sized) or a COW merge, or raise the cap")
      df.collect()
        .groupBy(r => normDir(r.getAs[String]("_file")))
        .map { case (f, rows) => f -> rows.map(_.getAs[Long]("_pos")).sorted }
    }

  /** DV batches whose EVERY referenced data directory lies inside
    * `coveredDirs` — dead after a rewrite that removes those batches,
    * so the committing verb drops them too (compaction as a side
    * effect). One read over ALL outstanding DVs decides coverage, not
    * one Spark job per prior sparse delete; DVs that still guard a
    * surviving batch are kept (their entries into removed files can
    * never match a planned partition again). */
  private[sources] def coveredDvBatches(
      spark: SparkSession, root: String, dvs: Seq[String],
      coveredDirs: Set[String]): Seq[String] =
    if (dvs.isEmpty) Nil
    else {
      import org.apache.spark.sql.functions.{col, regexp_extract}
      val refDirsByDv = spark.read.schema(dvSchema)
        .parquet(dvs.map(b => CommitLog.batchPath(root, b)): _*)
        .select(
          regexp_extract(col("_metadata.file_path"), "^(.*)/[^/]+$", 1)
            .as("dvdir"),
          regexp_extract(col("_file"), "^(.*)/[^/]+$", 1).as("ref"))
        .distinct().collect()
        .groupBy(r => normDir(r.getString(0)))
        .map { case (d, rows) =>
          d -> rows.map(r => normDir(r.getString(1))).toSet
        }
      val dvByDir = dvs.map(b =>
        normDir(CommitLog.batchPath(root, b)) -> b).toMap
      refDirsByDv.collect {
        case (dvDir, refs) if refs.subsetOf(coveredDirs) => dvByDir(dvDir)
      }.toSeq
    }

  /** Where a version's materialized change-data rows live (when the
    * committing merge ran with `changeFeed = true`); underscore-hidden
    * from every data read. */
  private[graft] def changeDirName(v: Int): String = s"_changes/v$v"

  /** Promote staged change rows after the version is won. A failed
    * rename must NOT pass silently: for a DV or COW version the
    * materialized rows are the ONLY plannable change source, and a
    * missing dir permanently faults every change-feed consumer at
    * that version. We own the version, so a pre-existing dest can
    * only be our own crashed prior attempt — clear it and retry once,
    * then fail loudly (the data commit itself already landed). */
  private[sources] def promoteChanges(
      spark: SparkSession, root: String, changeTmp: String, next: Int): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(root).toUri,
      spark.sessionState.newHadoopConf())
    val src = new org.apache.hadoop.fs.Path(s"$root/$changeTmp")
    val dest = new org.apache.hadoop.fs.Path(s"$root/${changeDirName(next)}")
    if (!fs.rename(src, dest)) {
      if (fs.exists(dest)) fs.delete(dest, true)
      if (!fs.rename(src, dest))
        throw new IllegalStateException(
          s"v$next of $root committed, but its change rows failed to " +
            s"promote from $changeTmp to ${changeDirName(next)} — " +
            "change-feed consumers will fault at this version until the " +
            "stage is promoted manually")
    }
  }

  /** The reconciled snapshot at `version` (default latest): data
    * batches minus outstanding deletion-vector positions. The DV side
    * is deletes-sized and broadcasts — the S23 read shape. */
  def snapshot(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val v = if (version < 0) CommitLog.latestVersion(root) else version
    val (dvs, datas) = CommitLog.files(root, v).partition(_.startsWith(DvPrefix))
    require(datas.nonEmpty, s"empty table $root at v$v")
    // read under the log's DDL: footer-sampled inference would drop
    // additively-evolved columns (and choke on empty-epoch batches);
    // renamed columns resolve through the column map in force at v
    snapshotOf(spark, root, datas, dvs, CommitLog.schemaOf(root, v),
      CommitLog.formerNamesOf(root, v))
  }

  /** `changeFeed = true` additionally materializes this merge's ROW
    * CHANGES (insert / update_preimage / update_postimage / delete,
    * the Delta CDC files) to `_changes/v<N>/` — the underscore keeps
    * them invisible to every data read; [[CommitLogCdf.changeFeed]]
    * and the connector's `readChangeFeed` scans consume them directly,
    * which is what makes a STREAMING change feed plannable through DV
    * and COW merges (a scan cannot run the diff join). Cost: one extra
    * read of the touched batches to capture preimages (the COW leg
    * reads them anyway); written pre-commit to a hidden temp and
    * renamed in only AFTER the version wins — a lost race or crash
    * leaves no change file, and consumers fall back to computing the
    * diff. */
  def merge(
      spark: SparkSession, root: String, source: DataFrame,
      keyCols: Seq[String], opCol: String = "_op",
      dvFraction: Double = 0.3,
      readVersion: Int = -1,
      changeFeed: Boolean = false): MergeStats = {
    require(keyCols.nonEmpty, "merge needs the table key")
    val readV = if (readVersion < 0) CommitLog.latestVersion(root) else readVersion
    val (dvs, datas) = CommitLog.files(root, readV).partition(_.startsWith(DvPrefix))
    require(datas.nonEmpty, s"cannot merge into empty table $root")
    // ROW-TRACKED tables: the hidden row-id column rides every read
    // and write below — update postimages and COW survivors keep their
    // ids, inserts allocate fresh ones past the watermark (advanced in
    // the same serializable commit; merge never rebases, so the
    // planned-against watermark cannot be raced)
    val tblProps = CommitLog.tblPropsOf(root, readV)
    val tracked = CommitLogWrite.rowTrackingOn(tblProps)
    val ridCol = CommitLogWrite.RowIdCol

    val formers = CommitLog.formerNamesOf(root, readV)
    val tableSchema = CommitLogSource.readBatches(
      spark, root, datas, CommitLog.rewriteDdl(root, readV)).schema
    // GENERATED columns: the definition owns them — every row this
    // merge WRITES (inserts, postimages, COW replacement values)
    // recomputes them after the source values apply, the sink's
    // ignore-the-writer semantic (a source-supplied stale value would
    // otherwise poison tuples/boxes and derived pruning)
    // same binding as the sink (ANSI cast, refuse-don't-null):
    // CommitLogWrite.regenFrame, not session-semantics expr().cast()
    def regen(df: DataFrame): DataFrame =
      CommitLogWrite.regenFrame(df, tableSchema, tblProps)
    val dataCols = tableSchema.fieldNames.toSeq
    // the USER columns — the source contract never mentions the hidden
    // row-id column (the engine owns it)
    val userCols = dataCols.filterNot(_ == ridCol)
    require(source.columns.toSet == (userCols :+ opCol).toSet,
      s"source must carry ${userCols :+ opCol}, got ${source.columns.toSeq}")
    // name-AND-type: a type-drifted source would land parquet files the
    // table's declared schema can no longer read back
    userCols.foreach { c =>
      val (got, want) = (source.schema(c).dataType, tableSchema(c).dataType)
      require(got == want,
        s"source column '$c' is $got but the table declares $want — " +
          "cast explicitly before merging")
    }

    // one row per key — two MATCHED actions for one key is ambiguous
    val srcKeyed = source.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val srcN = srcKeyed.count()
      require(srcKeyed.select(keyCols.map(col): _*).distinct().count() == srcN,
        "merge source must hold at most one row per key — pre-reduce it " +
          "(max_by on a sequence column, the C4 discipline)")

      // every row this merge can WRITE (inserts, postimages, COW
      // replacement values) comes verbatim from the source's U rows:
      // one pre-stage pass enforces the CHECKs in force (declared
      // CHECKs + the DDL's NOT NULL columns) on all legs
      val newRows = srcKeyed.filter(col(opCol) === "U")
        .select(userCols.map(col): _*)
      val inForce = CommitLogWrite.checksInForce(root, readV, newRows.schema)
      if (inForce.nonEmpty) {
        inForce.foreach { case (cn, ce) =>
          val bad = newRows.filter(not(coalesce(expr(ce), lit(true)))).count()
          if (bad > 0)
            throw new CommitLog.ConstraintViolationException(cn, ce, bad)
        }
      }

      // ---- match phase: narrow base projection ⋈ change set ----
      val narrowBase = CommitLogSource.readBatches(
          spark, root, datas, CommitLog.rewriteDdl(root, readV),
          formers, keepMeta = true)
        .select(keyCols.map(col) ++
          (if (tracked) Seq(col(ridCol)) else Nil) :+
          col("_metadata.file_path").as("_file") :+
          col("_metadata.row_index").as("_pos"): _*)
      val reconciled =
        if (dvs.isEmpty) narrowBase
        else dvAntiJoin(narrowBase,
          spark.read.schema(dvSchema).parquet(
            dvs.map(b => CommitLog.batchPath(root, b)): _*))
      val matched = reconciled
        .join(srcKeyed.select(keyCols.map(col) :+ col(opCol).as("_op"): _*),
          keyCols)
        .withColumn("_batch", regexp_extract(col("_file"), "^(.*)/[^/]+$", 1))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      try {
        val Array(matchedU, matchedD) = {
          val r = matched.agg(
            count(when(col("_op") === "U", 1)).as("u"),
            count(when(col("_op") === "D", 1)).as("d")).head()
          Array(r.getLong(0), r.getLong(1))
        }
        val srcU = srcKeyed.filter(col(opCol) === "U").count()
        val inserted = srcU - matchedU
        val byDir = dirToName(root, datas)
        val touched = matched.select(col("_batch")).distinct()
          .collect().map(r => byDir(normDir(r.getString(0)))).toSeq.sorted
        val touchedRows =
          if (touched.isEmpty) 0L
          else CommitLogSource.readBatches(spark, root, touched,
            CommitLog.rewriteDdl(root, readV)).count()
        val changedFraction =
          if (touchedRows == 0) 1.0
          else (matchedU + matchedD).toDouble / touchedRows

        val next = readV + 1
        val tag = java.util.UUID.randomUUID().toString.take(8)
        // fresh row ids for inserted rows: watermark + 1 + the 33-bit
        // strided task counter (monotonically_increasing_id) — unique
        // by construction, gaps allowed (the identity contract). The
        // frame is PERSISTED before any action: mid() is plan-stable
        // only over a materialized input, and the written ids must be
        // exactly the ids the watermark advance below accounts for.
        val hwmKey = CommitLogWrite.IdentityHwmPrefix + ridCol
        val idBase: Long = tblProps.get(hwmKey).map(_.toLong + 1L).getOrElse(0L)
        val insertsBare = regen(srcKeyed.filter(col(opCol) === "U")
          .join(matched.select(keyCols.map(col): _*), keyCols, "left_anti")
          .select(userCols.map(col): _*))
        val inserts =
          if (!tracked) insertsBare
          else insertsBare
            .withColumn(ridCol, lit(idBase) + monotonically_increasing_id())
            .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

        // nothing matched, nothing to insert (e.g. all-unmatched
        // deletes): a no-op, no version published
        if (matchedU + matchedD == 0 && inserted == 0)
          return MergeStats(readV, "noop", 0, 0, 0, Nil, Nil)

        val (added, removed, leg) =
          if (touched.isEmpty) {
            // pure insert: a plain append batch, nothing rewrites
            val b = s"m$next-$tag"
            inserts.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$b")
            (Seq(b), Nil, "append")
          } else if (changedFraction < dvFraction &&
              matchedU + matchedD +
                outstandingDvRows(spark, root, dvs) <= dvCap(spark)) {
            // fraction AND absolute-position dial: a sparse merge on a
            // huge table can still exceed what plan-time DV collection
            // may hold — past the cap, pay the COW rewrite instead
            // ---- DV leg: append positions + new rows ----
            val dvBatch = s"$DvPrefix$next-$tag"
            matched.filter(col("_op").isin("U", "D"))
              .select(col("_file"), col("_pos"))
              .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dvBatch")
            val dataBatch = s"m$next-$tag"
            val postimages = regen(
              if (!tracked) srcKeyed.filter(col(opCol) === "U")
                .join(matched.select(keyCols.map(col): _*), keyCols,
                  "left_semi")
                .select(userCols.map(col): _*)
              else srcKeyed.filter(col(opCol) === "U")
                .join(matched.filter(col("_op") === "U")
                  .select(keyCols.map(col) :+ col(ridCol): _*), keyCols)
                .select(userCols.map(col) :+ col(ridCol): _*))
            inserts.unionByName(postimages)
              .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$dataBatch")
            (Seq(dataBatch, dvBatch), Nil, "dv")
          } else {
            // ---- COW leg: rewrite touched batches + compact covered DVs ----
            val rw = s"m$next-$tag"
            val touchedFull = snapshotOf(spark, root,
              datas.filter(touched.contains), dvs,
              CommitLog.rewriteDdl(root, readV), formers)
            val newVals = srcKeyed.filter(col(opCol) === "U")
              .select(keyCols.map(col) :+
                struct(userCols.map(col): _*).as("_new"): _*)
            val delKeys = srcKeyed.filter(col(opCol) === "D")
              .select(keyCols.map(col): _*)
            val survivors = regen(touchedFull
              .join(delKeys, keyCols, "left_anti")
              .join(newVals, keyCols, "left")
              .select(userCols.map(c =>
                when(col("_new").isNotNull, col(s"_new.$c"))
                  .otherwise(col(c)).as(c)) ++
                // a survivor keeps its id whether updated or untouched
                (if (tracked) Seq(col(ridCol)) else Nil): _*))
            survivors.unionByName(inserts)
              .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$rw")
            // a DV batch whose every referenced file lives in a removed
            // batch is dead after the rewrite — drop it (compaction).
            // ONE read over all outstanding DVs (r16: the per-dv filter
            // ran one Spark job per vector); dvs order preserved.
            val coveredSet = coveredDvBatches(spark, root, dvs,
              touched.map(b => normDir(CommitLog.batchPath(root, b))).toSet).toSet
            val coveredDvs = dvs.filter(coveredSet)
            (Seq(rw), touched ++ coveredDvs, "cow")
          }

        // change-data capture, staged hidden: preimages from the
        // reconciled touched rows, postimages from the source, inserts
        // as-is — all four Delta CDC row kinds in one frame
        val changeTmp = s"_changes/_tmp-$tag"
        if (changeFeed) {
          val opKeyed = matched
            .select(keyCols.map(col) :+ col("_op"): _*)
          // a tracked table's change rows CARRY the row id — the feed
          // is then foldable by identity (update = delete+insert with
          // the same id)
          val ridCols = if (tracked) Seq(col(ridCol)) else Nil
          val pre =
            if (touched.isEmpty) None
            else Some(snapshotOf(spark, root, datas.filter(touched.contains),
                dvs, CommitLog.rewriteDdl(root, readV), formers)
              .join(opKeyed, keyCols)
              .select(userCols.map(col) ++ ridCols :+
                when(col("_op") === "D", lit("delete"))
                  .otherwise(lit("update_preimage")).as("_change_type"): _*))
          val post = regen(
            if (!tracked) srcKeyed.filter(col(opCol) === "U")
              .join(opKeyed.filter(col("_op") === "U"), keyCols, "left_semi")
              .select(userCols.map(col): _*)
            else srcKeyed.filter(col(opCol) === "U")
              .join(matched.filter(col("_op") === "U")
                .select(keyCols.map(col) :+ col(ridCol): _*), keyCols)
              .select(userCols.map(col) ++ ridCols: _*))
            .withColumn("_change_type", lit("update_postimage"))
          val ins = inserts
            .select(userCols.map(col) ++ ridCols :+
              lit("insert").as("_change_type"): _*)
          pre.map(_.unionByName(post)).getOrElse(post).unionByName(ins)
            .write.mode(SaveMode.ErrorIfExists).parquet(s"$root/$changeTmp")
        }

        // tracked + fresh inserts: advance the row-id watermark in the
        // SAME commit; the exact-version CAS (never a rebase) makes a
        // rival allocator abort this merge rather than collide with it
        val hwmProps: Map[String, Option[String]] =
          if (!tracked || inserted == 0) Map.empty
          else {
            val maxId = inserts.agg(max(col(ridCol))).head().getLong(0)
            Map(hwmKey -> Some(math.max(
              maxId, tblProps.get(hwmKey).map(_.toLong).getOrElse(-1L))
              .toString))
          }
        // every action over the inserts frame has run (batch write,
        // change rows, watermark max) — release the materialization
        if (tracked) inserts.unpersist()
        if (!CommitLog.tryCommit(root, next, added, removed,
            op = Some("MERGE"), props = hwmProps,
            changeFiles = Some(changeFeed))) {
          // stage is dead bytes a later vacuum sweeps; state unchanged
          if (changeFeed) {
            val p = new org.apache.hadoop.fs.Path(s"$root/$changeTmp")
            val fs = org.apache.hadoop.fs.FileSystem.get(
              p.toUri, spark.sessionState.newHadoopConf())
            if (fs.exists(p)) fs.delete(p, true)
          }
          throw new java.util.ConcurrentModificationException(
            s"merge lost the race at v$next of $root: a rival committed " +
              "first — re-read and re-run the merge (merges never rebase: " +
              "the rival may have changed rows this match phase read)")
        }
        if (changeFeed)
          // rename in only after the version is OURS; a failure is loud
          promoteChanges(spark, root, changeTmp, next)
        if (next % CommitLog.checkpointInterval == 0)
          CommitLog.writeCheckpoint(root, next)
        MergeStats(next, leg, inserted, matchedU, matchedD, touched, removed)
      } finally matched.unpersist()
    } finally srcKeyed.unpersist()
  }

  /** Reconciled rows of a batch subset (COW rewrite input) — read
    * under the log's DDL so evolved columns survive the rewrite. */
  private[sources] def snapshotOf(
      spark: SparkSession, root: String,
      datas: Seq[String], dvs: Seq[String],
      schemaDdl: Option[String],
      formers: CommitLog.ColMap = Map.empty): DataFrame = {
    val base = CommitLogSource.readBatches(spark, root, datas, schemaDdl,
        formers, keepMeta = true)
      .withColumn("_file", col("_metadata.file_path"))
      .withColumn("_pos", col("_metadata.row_index"))
    val visible =
      if (dvs.isEmpty) base
      else dvAntiJoin(base,
        spark.read.schema(dvSchema).parquet(
          dvs.map(b => CommitLog.batchPath(root, b)): _*))
    visible.drop("_file", "_pos", "_metadata")
  }
}
