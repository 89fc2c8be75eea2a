package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** OPTIMIZE over the [[CommitLog]] — small-batch compaction as a
  * COMMITTED, layout-only rewrite (the Delta OPTIMIZE / Iceberg
  * rewrite-data-files verb): pick the live batches under a size
  * threshold, rewrite them as ONE packed batch, and publish a
  * `dataChange=false` commit that removes the smalls and adds the
  * pack. Because the flag rides the manifest:
  *
  *  - streaming tails ([[CommitLogSource]]'s micro-batch stream and
  *    [[CommitLogTail.drain]]) SKIP the commit — compaction runs under
  *    a live tail without faulting it or double-emitting rows;
  *  - the row-level CDF emits nothing for it (no churn from layout);
  *  - time travel still works — pre-optimize versions read the small
  *    batches until vacuum expires them;
  *  - a rival append commits concurrently via rebase (disjoint files),
  *    while a rival rewrite of the SAME smalls (another OPTIMIZE, a
  *    COW merge) aborts exactly one loser through the optimistic
  *    protocol's remove-set conflict check.
  *
  * The rewrite itself is the S12 discipline: `coalesce`, never
  * `repartition` — a pure read-concatenate-write with NO shuffle, so
  * at 100 TB compacting N small files moves exactly their bytes once.
  * Stats boxes are unioned per column from the source batches'
  * manifest boxes (a column missing a box in ANY source stays
  * unknown), so the pack is as prunable as its inputs without a
  * second data pass.
  *
  * Merge-on-read guard: outstanding `dv-` deletion-vector batches
  * reference rows by (batch, row_index) POSITION — rewriting a batch
  * under a DV would silently resurrect its deleted rows, so optimize
  * refuses until a COW merge/compaction clears the DVs
  * ([[CommitLogMerge]] owns that path).
  */
object CommitLogOptimize {

  final case class OptimizeResult(
      version: Int, packed: Option[String], sources: Seq[String])

  /** Compact every live batch smaller than `smallBytes` into one packed
    * batch (no-op below two candidates — there is nothing to pack).
    * `targetPartitions` bounds the pack's file count (coalesce width).
    * On a PARTITIONED table, compaction runs WITHIN partitions — one
    * pack per partition tuple, carrying the tuple forward — so the
    * table stays exactly prunable and partition-overwritable after
    * maintenance (a cross-partition pack would strand every source
    * tuple). Batches without a recorded tuple (pre-partitioning or
    * engine rewrites) compact together as their own group.
    * Throws `ConcurrentModificationException` when a rival rewrote any
    * candidate first; the staged pack is cleaned up before rethrow. */
  def optimize(
      spark: SparkSession, root: String,
      smallBytes: Long, targetPartitions: Int = 1,
      minGroup: Int = 2,
      tupleScope: Option[Set[Map[String, String]]] = None): OptimizeResult = {
    require(smallBytes > 0L && targetPartitions >= 1 && minGroup >= 2)
    val readVersion = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, readVersion)
    CommitLogSource.requireNoDv(live, s"optimize of $root")

    val allSmalls = live.filter(b =>
      CommitLogSource.batchBytes(root, b) < smallBytes)
    if (CommitLog.partColsOf(root, readVersion).nonEmpty) {
      val parts = CommitLog.partsOf(root, readVersion)
      // tupleScope bounds maintenance to the named tuples (the
      // auto-compact hook passes the write's OWN tuples, so one hot
      // partition's backlog never schedules table-wide work)
      val groups = allSmalls.groupBy(b => parts.get(b))
        .filter { case (t, _) =>
          tupleScope.forall(sc => t.exists(sc.contains)) }
        .values.filter(_.size >= minGroup).toSeq.sortBy(_.head)
      if (groups.isEmpty) return OptimizeResult(readVersion, None, Nil)
      // one pack per tuple group, all published in ONE layout-only
      // commit (partial maintenance must not half-publish)
      val packs = groups.map(g =>
        packOne(spark, root, readVersion, g,
          parts.get(g.head), targetPartitions))
      // a layout rewrite restates exactly its sources' rows, so the
      // pack's count is their sum — known iff every source carried one
      val srcRows = CommitLog.rowsOf(root, readVersion)
      def packRows(pack: String, sources: Seq[String]): CommitLog.Rows =
        if (sources.forall(srcRows.contains))
          Map(pack -> sources.map(srcRows).sum)
        else Map.empty
      try {
        val c = commitRewrite(root, readVersion,
          added = packs.map(_._1), removed = groups.flatten,
          stats = packs.flatMap(_._2).toMap,
          blooms = packs.flatMap(_._3).toMap,
          op = "OPTIMIZE",
          parts = packs.flatMap(p => p._4.map(p._1 -> _)).toMap,
          rows = packs.zip(groups).flatMap { case (p, g) =>
            packRows(p._1, g)
          }.toMap)
        return OptimizeResult(c.version, packs.headOption.map(_._1),
          groups.flatten)
      } catch {
        case e: java.util.ConcurrentModificationException =>
          val rootP0 = new Path(root)
          val fs0 = FileSystem.get(rootP0.toUri,
            spark.sessionState.newHadoopConf())
          packs.foreach { p =>
            val pp = new Path(rootP0, p._1)
            if (fs0.exists(pp)) fs0.delete(pp, true)
          }
          throw e
      }
    }

    val rootP = new Path(root)
    val fs = FileSystem.get(rootP.toUri, spark.sessionState.newHadoopConf())
    val smalls = allSmalls
    if (smalls.size < minGroup) return OptimizeResult(readVersion, None, Nil)

    val (packed, packStats, packBlooms, _) =
      packOne(spark, root, readVersion, smalls, None, targetPartitions)
    val srcRows = CommitLog.rowsOf(root, readVersion)
    try {
      val c = commitRewrite(root, readVersion,
        added = Seq(packed), removed = smalls,
        stats = packStats, blooms = packBlooms, op = "OPTIMIZE",
        rows =
          if (smalls.forall(srcRows.contains))
            Map(packed -> smalls.map(srcRows).sum)
          else Map.empty)
      OptimizeResult(c.version, Some(packed), smalls)
    } catch {
      case e: java.util.ConcurrentModificationException =>
        // a rival rewrote one of the smalls first: the pack would
        // resurrect its rows — drop the staged pack and surface
        val p = new Path(rootP, packed)
        if (fs.exists(p)) fs.delete(p, true)
        throw e
    }
  }

  /** Stage ONE pack from `sources`: the S12 coalesce rewrite (no
    * shuffle — each byte moves exactly once), read UNDER THE LOG'S DDL
    * so additively-evolved columns survive and renamed columns land
    * under current logical names. Boxes union per column across
    * sources (only columns EVERY source boxes — a boxless source may
    * hold rows outside any union); blooms OR together iff every source
    * carried the column at the same width. Returns the staged batch
    * name + its manifest facets; nothing is committed here. */
  private def packOne(
      spark: SparkSession, root: String, readVersion: Int,
      sources: Seq[String], tuple: Option[Map[String, String]],
      targetPartitions: Int)
      : (String, CommitLog.Stats, CommitLog.Blooms, Option[Map[String, String]]) = {
    val packed = s"opt${EnvelopeBatchWrite.nextWriteId()}"
    val formers = CommitLog.formerNamesOf(root, readVersion)
    CommitLogSource.readBatches(spark, root, sources,
        // rewriteDdl: a row-tracked table's hidden row-id column must
        // survive the packing rewrite
        CommitLog.rewriteDdl(root, readVersion), formers, keepMeta = false)
      .coalesce(targetPartitions)
      .write.parquet(s"$root/$packed")

    val stats = CommitLog.statsOf(root, readVersion)
    // boxes recorded before a rename carry the then-logical name —
    // normalize every key to its CURRENT logical name so eras union
    val toLogical: Map[String, String] =
      formers.toSeq.flatMap { case (l, fs) => fs.map(_ -> l) }.toMap
    val sourceBoxes = sources.map(b => stats.getOrElse(b, Map.empty)
      .map { case (c, box) => toLogical.getOrElse(c, c) -> box })
    val shared = sourceBoxes.map(_.keySet).reduce(_ intersect _)
    val packBox: Map[String, CommitLog.ColStat] = shared.map { c =>
      val sts = sourceBoxes.map(_(c))
      // boxes union; null counts SUM only when every source counted
      val nulls =
        if (sts.forall(_.nulls.isDefined)) Some(sts.map(_.nulls.get).sum)
        else None
      // string bounds union only when EVERY source carries them: a
      // bound-less source batch (pre-r15 era, or all-null) may still
      // hold values the union would miss — cross-era merges poison
      def lt(a: Array[Byte], b: Array[Byte]) =
        java.util.Arrays.compareUnsigned(a, b) < 0
      val (slo, shi) =
        if (sts.forall(s => s.strLo.isDefined && s.strHi.isDefined))
          (Some(sts.map(_.strLo.get).reduce((a, b) => if (lt(a, b)) a else b)),
            Some(sts.map(_.strHi.get).reduce((a, b) => if (lt(a, b)) b else a)))
        else (None, None)
      // ndv sketches union exactly (register max); a sketch-less
      // source (pre-r16 era) poisons — a partial union under-reports
      val ndv =
        if (sts.forall(_.ndv.isDefined))
          Some(sts.map(_.ndv.get).reduce(CommitLogNdv.merge))
        else None
      // exact sums ADD across the pack's sources (a sum-less source
      // poisons; an overflowing total drops rather than wraps)
      val sum =
        if (sts.forall(_.sum.isDefined))
          try Some(sts.map(_.sum.get).reduce(Math.addExact(_, _)))
          catch { case _: ArithmeticException => None }
        else None
      c -> CommitLog.ColStat(
        sts.map(_.lo).min, sts.map(_.hi).max, nulls, slo, shi, ndv, sum)
    }.toMap
    val packStats: CommitLog.Stats =
      if (packBox.isEmpty) Map.empty else Map(packed -> packBox)

    val allBlooms = CommitLog.bloomsOf(root, readVersion)
    val srcBlooms = sources.map(b => allBlooms.getOrElse(b, Map.empty)
      .map { case (c, v) => toLogical.getOrElse(c, c) -> v })
    val bloomCols = srcBlooms.map(_.keySet).reduce(_ intersect _)
    val packBloom = bloomCols.flatMap { c =>
      val hexes = srcBlooms.map(_(c))
      val widths = hexes.map(_.length * 4).distinct // hex chars = 4 bits
      if (widths.size == 1)
        Some(c -> CommitLogBloom.toHex(
          hexes.map(CommitLogBloom.fromHex).reduce(CommitLogBloom.merge)))
      else if (widths.forall(w => Integer.bitCount(w) == 1)) {
        // auto-sized eras differ by batch size: power-of-two filters
        // FOLD to the smallest width exactly (fold-then-merge equals
        // build-small), so the pack keeps a bloom instead of dropping
        // the column; worst case it saturates — harmless, never wrong
        val common = widths.min
        Some(c -> CommitLogBloom.toHex(hexes
          .map(h => CommitLogBloom.fold(CommitLogBloom.fromHex(h), common))
          .reduce(CommitLogBloom.merge)))
      } else None // mixed non-power-of-two dials: no common domain
    }.toMap
    val packBlooms: CommitLog.Blooms =
      if (packBloom.isEmpty) Map.empty else Map(packed -> packBloom)
    (packed, packStats, packBlooms, tuple)
  }

  /** Publish a layout-only rewrite with REWRITE-SAFE rebasing: a plain
    * `CommitLog.commit` rebases past any disjoint rival, but a rival
    * DELETION-VECTOR commit (DV-leg DELETE/UPDATE/MERGE) is never
    * disjoint from a rewrite — its positions point into files the
    * rewrite re-staged from the PRE-delete snapshot, so rebasing past
    * it would resurrect the deleted rows and leave the DV dangling
    * over removed directories. Any dv- batch added since our read
    * aborts the rewrite (conservative: the optimizer just re-runs);
    * a rival that rewrote one of our sources aborts via the standard
    * removed-still-live check. */
  private[graft] def commitRewrite(
      root: String, readVersion: Int,
      added: Seq[String], removed: Seq[String],
      stats: CommitLog.Stats, blooms: CommitLog.Blooms,
      op: String, parts: CommitLog.Parts = Map.empty,
      rows: CommitLog.Rows = Map.empty): CommitLog.Commit = {
    var base = readVersion
    var attempts = 0
    while (attempts < 50) {
      attempts += 1
      if (base > readVersion) {
        if (CommitLog.changes(root, readVersion, base).exists(
            _.added.exists(_.startsWith(CommitLogMerge.DvPrefix))))
          throw new java.util.ConcurrentModificationException(
            s"$op of $root read v$readVersion but a deletion-vector " +
              "commit landed since: the staged rewrite re-states rows " +
              "deleted after they were read — re-run against the new " +
              "snapshot")
        val live = CommitLog.files(root, base).toSet
        val gone = removed.filterNot(live.contains)
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"$op of $root lost its sources $gone to a rival rewrite")
      }
      if (CommitLog.tryCommit(root, base + 1, added, removed,
          stats = stats, blooms = blooms, dataChange = false,
          op = Some(op), parts = parts, rows = rows)) {
        if ((base + 1) % CommitLog.checkpointInterval == 0)
          CommitLog.writeCheckpoint(root, base + 1)
        return CommitLog.Commit(base + 1, attempts)
      }
      base = CommitLog.latestVersion(root)
    }
    throw new IllegalStateException(
      s"$op on $root gave up after 50 attempts (livelock?)")
  }

  final case class PurgeResult(
      version: Int, purged: Seq[String], dropped: Seq[String])

  /** REORG … APPLY PURGE (SURVEY S75) — deletion-vector compaction,
    * the verb that completes the merge-on-read lifecycle (Delta's
    * `REORG TABLE … APPLY (PURGE)`): rewrite every data batch that
    * outstanding `dv-` vectors reference with its deleted positions
    * APPLIED, and publish one `dataChange=false` commit that swaps the
    * touched batches for their reconciled rewrites and drops every
    * vector. Untouched batches move zero bytes.
    *
    * Why it matters at 100 TB: outstanding DVs tax every read twice —
    * each scan pays per-row position skipping, and ONE dv- batch
    * disqualifies the whole snapshot from the vectorized columnar leg
    * ([[CommitLogScan]]'s eligibility gate) AND from [[optimize]]
    * (position-referencing rewrites resurrect deleted rows). Purge
    * restores both in one bounded maintenance pass: cost is exactly
    * the touched batches' surviving bytes, once.
    *
    * Layout-only by construction: the LIVE row set is unchanged (the
    * removed rows were retracted at their own DV versions), so tails
    * and the change feed SKIP the commit, time travel keeps serving
    * pre-purge versions through the vectors until vacuum, and the
    * rival matrix is [[optimize]]'s — appends rebase past it, a rival
    * DV/COW rewrite aborts exactly one loser ([[commitRewrite]]).
    *
    * Never driver-sized: reconciliation is [[CommitLogMerge.snapshotOf]]'s
    * broadcast anti-join on the executors, so purge works on tables
    * PAST the [[CommitLogMerge.DvCapConf]] planning cap — it is the
    * escape hatch that error message points to. Driver state here is
    * one distinct-directory collect (batch-count-sized).
    *
    * Stats: the purged batch carries its source's manifest entry with
    * every facet that stays sound on a row SUBSET — boxes and string
    * bounds (may widen, never lie), blooms (may admit a purged value:
    * one extra read, residual-filtered) — while exact null counts drop
    * to unknown (the deleted rows' null split is unrecorded); row
    * counts are re-stated EXACTLY from the rewrite's parquet footers.
    * Row-tracked tables keep their ids: the rewrite reads under
    * [[CommitLog.rewriteDdl]], which carries the hidden id column. */
  def purge(
      spark: SparkSession, root: String,
      targetPartitions: Int = 1): PurgeResult = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    require(targetPartitions >= 1)
    val readVersion = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, readVersion)
    val (dvs, datas) = live.partition(_.startsWith(CommitLogMerge.DvPrefix))
    if (dvs.isEmpty) return PurgeResult(readVersion, Nil, Nil)
    // the batches the vectors actually reference — distinct parent
    // directories of the recorded file paths, batch-count-sized
    val touchedDirs = spark.read.schema(CommitLogMerge.dvSchema)
      .parquet(dvs.map(b => CommitLog.batchPath(root, b)): _*)
      .select(regexp_extract(col("_file"), "^(.*)/[^/]+$", 1).as("d"))
      .distinct().collect()
      .map(r => CommitLogMerge.normDir(r.getString(0))).toSet
    val touched = datas.filter(b =>
      touchedDirs.contains(CommitLogMerge.normDir(CommitLog.batchPath(root, b))))
    // vectors into already-removed directories can never match a read
    // again; with every referenced live batch rewritten, ALL vectors drop
    val ddl = CommitLog.rewriteDdl(root, readVersion)
    val formers = CommitLog.formerNamesOf(root, readVersion)
    val stats = CommitLog.statsOf(root, readVersion)
    val blooms = CommitLog.bloomsOf(root, readVersion)
    val tuples = CommitLog.partsOf(root, readVersion)
    val rootP = new Path(root)
    val fs = FileSystem.get(rootP.toUri, spark.sessionState.newHadoopConf())
    var added = Seq.empty[String]
    var addStats: CommitLog.Stats = Map.empty
    var addBlooms: CommitLog.Blooms = Map.empty
    var addParts: CommitLog.Parts = Map.empty
    var addRows: CommitLog.Rows = Map.empty
    try {
      touched.foreach { b =>
        val purged = s"prg${EnvelopeBatchWrite.nextWriteId()}"
        CommitLogMerge.snapshotOf(spark, root, Seq(b), dvs, ddl, formers)
          .coalesce(targetPartitions)
          .write.parquet(s"$root/$purged")
        // exact survivor count from the rewrite's own footers (a
        // metadata read — positions may double-count across vectors,
        // the written rows cannot)
        val rows = CommitLogSource.listParquet(root, purged) match {
          case Nil => 0L
          case fsq =>
            // known schema: skip the footer schema-inference job
            val rd = ddl.map(d => spark.read.schema(
              org.apache.spark.sql.types.StructType.fromDDL(d)))
              .getOrElse(spark.read)
            rd.parquet(fsq: _*).count()
        }
        if (rows == 0L && added.nonEmpty) {
          // fully-deleted batch: nothing to restate — drop the empty
          // rewrite unless it is the commit's only add (dataChange=
          // false needs a non-empty add set)
          val pp = new Path(rootP, purged)
          if (fs.exists(pp)) fs.delete(pp, true)
        } else {
          added :+= purged
          addRows += purged -> rows
          // subset-sound facets carry; exact null counts AND sums drop
          // (deleted rows' values are baked into both); the ndv sketch
          // carries (a subset's true NDV ≤ the sketch's —
          // over-reporting is the safe estimation direction); an
          // entry left fact-less (unboxed, no bounds) drops entirely
          val carried = stats.getOrElse(b, Map.empty).collect {
            case (c, st) if st.boxed || st.strLo.isDefined =>
              c -> CommitLog.ColStat(st.lo, st.hi, None, st.strLo, st.strHi,
                st.ndv)
          }
          if (carried.nonEmpty) addStats += purged -> carried
          blooms.get(b).filter(_.nonEmpty)
            .foreach(m => addBlooms += purged -> m)
          tuples.get(b).foreach(t => addParts += purged -> t)
        }
      }
      val c = commitRewrite(root, readVersion,
        added = added, removed = touched ++ dvs,
        stats = addStats, blooms = addBlooms,
        op = "REORG", parts = addParts, rows = addRows)
      PurgeResult(c.version, added, dvs)
    } catch {
      case e: Throwable =>
        added.foreach { p =>
          val pp = new Path(rootP, p)
          if (fs.exists(pp)) fs.delete(pp, true)
        }
        throw e
    }
  }

  final case class RepartitionResult(
      version: Int, added: Seq[String], sources: Seq[String])

  /** Re-establish PARTITION-PURE layout on a partitioned table:
    * rewrite every live batch that LACKS a partition tuple (engine
    * verbs that stage with plain DataFrame writes — API MERGE/DML COW
    * legs — drop tuples) into one batch per tuple, tuples recorded.
    * This is the remedy [[CommitLogOverwriteWrite]]'s dynamic-overwrite
    * refusal points at, and what restores exact pruning after
    * API-level maintenance. Layout-only (`dataChange=false`): same
    * rows, partition-pure directories — tails and the CDF skip it.
    *
    * Cost shape: ONE clustered shuffle of only the untupled bytes
    * (tupled batches are untouched), written through the same
    * partitioned task writer the sink uses, so file-unit value forms
    * (micros/days/unscaled) match every other tuple in the log. */
  def optimizeRepartition(
      spark: SparkSession, root: String): RepartitionResult = {
    import org.apache.spark.sql.functions.col
    val readVersion = CommitLog.latestVersion(root)
    val partCols = CommitLog.partColsOf(root, readVersion)
    require(partCols.nonEmpty,
      s"optimizeRepartition of $root: the table is not partitioned")
    val live = CommitLog.files(root, readVersion)
    CommitLogSource.requireNoDv(live, s"optimizeRepartition of $root")
    val parts = CommitLog.partsOf(root, readVersion)
    val untupled = live.filterNot(b =>
        parts.get(b).exists(m => partCols.forall(m.contains)))
      // zero-file batches (all-empty epochs) hold no rows to relocate
      .filter(b => CommitLogSource.listParquet(root, b).nonEmpty)
    if (untupled.isEmpty) return RepartitionResult(readVersion, Nil, Nil)

    val schemaDdl = CommitLog.rewriteDdl(root, readVersion).getOrElse(
      throw new IllegalStateException(
        s"partitioned table $root has no declared schema"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val writeId = EnvelopeBatchWrite.nextWriteId()
    val stageName = s"stage-rp-$writeId"
    val stageDir = s"$root/$stageName"
    // read under the log's DDL, cluster on the partition columns, and
    // run the SINK'S OWN partitioned task writer per partition — the
    // imperative write loop is the task, exactly like the DSv2 path
    val df = CommitLogSource.readBatches(spark, root, untupled,
        Some(schemaDdl), CommitLog.formerNamesOf(root, readVersion),
        keepMeta = false)
      .select(schema.fieldNames.map(col).toSeq: _*)
      // a bucket spec clusters on its SOURCE column (the per-task
      // writer derives the bucket ids)
      .repartition(partCols.map(c => col(CommitLogBucket.sourceOf(c))): _*)
    val pc = partCols
    val fileMsgs: Seq[CommitLogFileMsg] = df.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val w = new CommitLogPartitionedDataWriter(stageDir, schema, pc,
          tok => f"_$tok-p$pid%05d.parquet.tmp",
          tok => f"part-$tok-p$pid%05d.parquet")
        rows.foreach(w.write)
        w.commit() match {
          case m: CommitLogPartitionedCommitMessage => m.files.iterator
          case _ => Iterator.empty
        }
      }.collect().toSeq

    val rootP = new Path(root)
    val fs = FileSystem.get(rootP.toUri, spark.sessionState.newHadoopConf())
    val stage = new Path(stageDir)
    CommitLogWrite.promoteTaskFiles(fs, stage,
      fileMsgs.map(m => (m.tmpName, m.visibleName)))
    val grouped = CommitLogWrite.groupByTuple(fileMsgs, s"rp$writeId")
    grouped.foreach { g =>
      val dest = new Path(rootP, g.batch)
      if (fs.exists(dest)) fs.delete(dest, true)
      fs.mkdirs(dest)
      g.files.foreach { m =>
        val from = new Path(stage, m.visibleName)
        if (fs.exists(from)) fs.rename(from, new Path(dest, m.visibleName))
      }
    }
    if (fs.exists(stage)) fs.delete(stage, true)
    val added = grouped.map(_.batch)
    try {
      val c = commitRewrite(root, readVersion,
        added = added, removed = untupled,
        stats = grouped.map(g => g.batch -> CommitLogWrite.boxesOf(
          g.files.flatMap(_.stats))).filter(_._2.nonEmpty).toMap,
        blooms = Map.empty, op = "OPTIMIZE REPARTITION",
        parts = grouped.map(g => g.batch -> g.tokens).toMap,
        rows = grouped.map(g => g.batch -> g.files.map(_.rows).sum).toMap)
      RepartitionResult(c.version, added, untupled)
    } catch {
      case e: java.util.ConcurrentModificationException =>
        added.foreach { b =>
          val p = new Path(rootP, b)
          if (fs.exists(p)) fs.delete(p, true)
        }
        throw e
    }
  }

  final case class ClusterResult(
      version: Int, packed: Seq[String], sources: Seq[String])

  /** OPTIMIZE ZORDER BY — the clustered full-table rewrite (Delta's
    * `OPTIMIZE … ZORDER BY (c1, c2)`): every live batch is re-laid out
    * along the Morton curve of one or two columns into `buckets`
    * range-contiguous batches, each committed with RECOMPUTED tight
    * (min,max) boxes — so after clustering, a range predicate on
    * either dimension prunes most batches straight from the manifest
    * ([[CommitLogScanBuilder]]'s pushdown). Still dataChange=false:
    * same rows, new layout — live tails and the CDF skip it.
    *
    * Mechanics: one bounds pass (broadcast), grid-quantize + interleave
    * (S14's codegen'd ZOrder), split the z-RANGE uniformly into
    * `buckets` (deterministic — no sampled quantiles, so replays and
    * oracles agree; skewed data may fill buckets unevenly, which costs
    * balance, never correctness), hash-repartition on the bucket id
    * (one shuffle of the rewritten bytes — a clustered rewrite cannot
    * be shuffle-free, that is its price), write one directory-
    * partitioned pass, promote each bucket to a batch, commit. Boxes
    * for every numeric/time column come from ONE grouped agg over the
    * same frame. At 100 TB this is run per partition/maintenance
    * window, not per table — the unit of work is the batch set chosen
    * here (all live batches; compose with [[optimize]]'s size filter
    * upstream if needed). */
  def optimizeClustered(
      spark: SparkSession, root: String,
      zorderBy: Seq[String], buckets: Int,
      gridBits: Int = 16): ClusterResult = {
    import org.apache.spark.sql.functions._
    require(zorderBy.nonEmpty && zorderBy.size <= 2,
      "zorderBy takes one or two columns (Morton interleave is 2-D)")
    require(buckets >= 2, "clustering below two buckets is optimize()")
    val readVersion = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, readVersion)
    CommitLogSource.requireNoDv(live, s"optimizeClustered of $root")
    // a whole-table z-order rewrite mixes partitions into range
    // buckets, stranding every recorded tuple — partitioned tables
    // keep their layout; compact within partitions via optimize()
    require(CommitLog.partColsOf(root, readVersion).isEmpty,
      s"optimizeClustered of $root: the table is partitioned — z-order " +
        "re-layout would strand the partition tuples; use optimize() " +
        "(per-partition compaction) instead")
    if (live.isEmpty) return ClusterResult(readVersion, Nil, Nil)

    // read under the log's DDL (see optimize() — evolved columns must
    // survive the rewrite)
    val df = CommitLogSource.readBatches(spark, root, live,
      CommitLog.rewriteDdl(root, readVersion),
      CommitLog.formerNamesOf(root, readVersion), keepMeta = false)
    // the double each column's manifest box is expressed in — the SAME
    // units the sink writes and the scan's pushdown probes (micros for
    // timestamps, epoch days for dates), or pruning silently misfires
    def boxExpr(c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType =>
          unix_micros(col(c)).cast("double")
        case org.apache.spark.sql.types.DateType =>
          unix_date(col(c)).cast("double")
        case _ => col(c).cast("double")
      }
    val boxCols = df.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.DateType => true
      case _ => false
    }).map(_.name).toSeq
    require(zorderBy.forall(boxCols.contains),
      s"zorderBy must be numeric/time columns: $zorderBy vs $boxCols")

    // one cheap bounds pass, broadcast back (the S14 layout-build shape)
    val boundAggs = zorderBy.flatMap(c =>
      Seq(min(boxExpr(c)).as(s"__min_$c"), max(boxExpr(c)).as(s"__max_$c")))
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*)
    val cells = zorderBy.map(c => graft.functions.ZOrder.gridCell(
      boxExpr(c), col(s"__min_$c"), col(s"__max_$c"), gridBits))
    val zkey =
      if (cells.size == 2) graft.functions.ZOrder.interleave(cells(0), cells(1))
      else cells.head
    val zSpan = 1L << (gridBits * cells.size)
    val dataCols = df.columns.toSeq
    val keyed = df.crossJoin(broadcast(bounds))
      .withColumn("__zb",
        // null zorder values (or an all-null column's null bounds)
        // land in bucket 0 — a null can't be range-pruned anyway, and
        // a null bucket id would break the directory promote
        coalesce(
          least(lit(buckets - 1), floor(zkey * buckets / zSpan).cast("int")),
          lit(0)))
      .select((dataCols :+ "__zb").map(col): _*)

    // per-bucket tight boxes for EVERY numeric/time column: one
    // grouped agg, metadata-sized result
    val statAggs = boxCols.flatMap(c => Seq(
      min(boxExpr(c)).as(s"lo_$c"), max(boxExpr(c)).as(s"hi_$c"))) :+
      count(lit(1)).as("__n") // exact per-bucket cardinality, same agg
    val statRows = keyed.groupBy(col("__zb"))
      .agg(statAggs.head, statAggs.tail: _*).collect()

    val writeId = EnvelopeBatchWrite.nextWriteId()
    def batchName(b: Int) = f"zb$writeId-$b%03d"
    val stage = s"$root/stage-zb-$writeId"
    // one shuffle on the bucket id → one task per bucket → one file per
    // bucket; directory-partitioned write, then promote dirs to batches
    keyed.repartition(buckets, col("__zb"))
      .write.partitionBy("__zb").parquet(stage)

    val rootP = new Path(root)
    val fs = FileSystem.get(rootP.toUri, spark.sessionState.newHadoopConf())
    val present = fs.listStatus(new Path(stage))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__zb="))
      .map(st => st.getPath.getName.stripPrefix("__zb=").toInt).sorted.toSeq
    present.foreach { b =>
      require(fs.rename(new Path(stage, s"__zb=$b"), new Path(rootP, batchName(b))),
        s"failed to promote bucket $b")
    }
    fs.delete(new Path(stage), true)

    val stats: CommitLog.Stats = statRows.map { r =>
      val b = r.getAs[Int]("__zb")
      batchName(b) -> boxCols.flatMap { c =>
        val lo = r.getAs[Any](s"lo_$c"); val hi = r.getAs[Any](s"hi_$c")
        if (lo == null || hi == null) None
        else Some(c -> CommitLog.ColStat(
          lo.asInstanceOf[Double], hi.asInstanceOf[Double]))
      }.toMap
    }.toMap
    val added = present.map(batchName)
    val bucketRows: CommitLog.Rows = statRows.map { r =>
      batchName(r.getAs[Int]("__zb")) -> r.getAs[Long]("__n")
    }.toMap
    try {
      val c = commitRewrite(root, readVersion,
        added = added, removed = live,
        stats = stats, blooms = Map.empty, op = "OPTIMIZE ZORDER",
        rows = bucketRows)
      ClusterResult(c.version, added, live)
    } catch {
      case e: java.util.ConcurrentModificationException =>
        added.foreach { b =>
          val p = new Path(rootP, b)
          if (fs.exists(p)) fs.delete(p, true)
        }
        throw e
    }
  }
}
