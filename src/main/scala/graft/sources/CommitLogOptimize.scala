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

  /** Total visible parquet bytes of one committed batch. */
  private def batchBytes(fs: FileSystem, root: String, batch: String): Long =
    CommitLogSource.listParquet(root, batch)
      .map(f => fs.getFileStatus(new Path(f)).getLen).sum

  /** Compact every live batch smaller than `smallBytes` into one packed
    * batch (no-op below two candidates — there is nothing to pack).
    * `targetPartitions` bounds the pack's file count (coalesce width).
    * Throws `ConcurrentModificationException` when a rival rewrote any
    * candidate first; the staged pack is cleaned up before rethrow. */
  def optimize(
      spark: SparkSession, root: String,
      smallBytes: Long, targetPartitions: Int = 1): OptimizeResult = {
    require(smallBytes > 0L && targetPartitions >= 1)
    val readVersion = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, readVersion)
    CommitLogSource.requireNoDv(live, s"optimize of $root")

    val rootP = new Path(root)
    val fs = FileSystem.get(rootP.toUri, spark.sessionState.newHadoopConf())
    val smalls = live.filter(b => batchBytes(fs, root, b) < smallBytes)
    if (smalls.size < 2) return OptimizeResult(readVersion, None, Nil)

    val packed = s"opt${EnvelopeBatchWrite.nextWriteId()}"
    // S12 discipline: coalesce concatenates partitions without a
    // shuffle — compaction moves each byte exactly once
    spark.read.parquet(smalls.map(b => s"$root/$b"): _*)
      .coalesce(targetPartitions)
      .write.parquet(s"$root/$packed")

    // union the sources' manifest boxes: per column, min of mins / max
    // of maxes — but only for columns EVERY source has a box for (a
    // boxless source batch may hold rows outside any union)
    val stats = CommitLog.statsOf(root, readVersion)
    val sourceBoxes = smalls.map(b => stats.getOrElse(b, Map.empty))
    val shared = sourceBoxes.map(_.keySet).reduce(_ intersect _)
    val packBox = shared.map { c =>
      val boxes = sourceBoxes.map(_(c))
      c -> (boxes.map(_._1).min, boxes.map(_._2).max)
    }.toMap
    val packStats: CommitLog.Stats =
      if (packBox.isEmpty) Map.empty else Map(packed -> packBox)

    try {
      val c = CommitLog.commit(root, readVersion,
        added = Seq(packed), removed = smalls,
        stats = packStats, dataChange = false, op = Some("OPTIMIZE"))
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
}
