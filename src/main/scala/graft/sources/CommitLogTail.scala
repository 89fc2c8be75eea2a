package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental (streaming-style) consumption of a [[CommitLog]] table —
  * the tailing half of the change feed, with the semantics Delta's
  * streaming source gives a table log:
  *
  *  - The consumer's position is a VERSION CURSOR, persisted in its own
  *    checkpoint directory and advanced only after a version's batch is
  *    handed to the sink — so a crash replays at most the in-flight
  *    version (at-least-once), and a version-keyed idempotent sink
  *    (overwrite `out/v=<N>`, the t8 discipline) upgrades the drain to
  *    exactly-once end to end.
  *  - Each drained version emits exactly its own ADDED batches (one
  *    `spark.read.parquet` over them — Catalyst plans it, pushdown and
  *    pruning apply), never a table rescan: keeping a downstream
  *    current costs O(changes), independent of table size.
  *  - DELETE semantics mirror Delta's source contract: a remove-only
  *    commit fails the drain unless `ignoreDeletes` is set (appends
  *    already emitted stay emitted — a stream cannot retract); a
  *    commit that both adds and removes (copy-on-write rewrite) always
  *    fails, because its adds re-state rows the consumer has already
  *    seen and emitting them would double-count.
  *  - AvailableNow semantics: the drain snapshots `latestVersion` at
  *    entry and stops there — commits landing mid-drain wait for the
  *    next invocation, so every call is a bounded unit of work.
  */
object CommitLogTail {
  import java.nio.file.{Files, Paths, StandardCopyOption}

  /** Last version this checkpoint has fully processed (0 = none). */
  def lastProcessed(checkpointDir: String): Int = {
    val p = Paths.get(checkpointDir, "cursor")
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toInt
    else 0
  }

  /** Durable cursor advance: write-temp + ATOMIC_MOVE, so a crash
    * leaves either the old cursor or the new one, never a torn file. */
  private def advance(checkpointDir: String, v: Int): Unit = {
    val dir = Paths.get(checkpointDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(
      s".cursor-tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, dir.resolve("cursor"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** SINGLE-CONSUMER CONTRACT, now enforced: the cursor protocol is
    * single-consumer by construction (two drains sharing a checkpoint
    * would interleave read-cursor/advance and double-emit versions), so
    * `drain` takes an exclusive lock on `<checkpointDir>/_drain.lock`
    * for its whole duration — `FileChannel.tryLock` across processes,
    * plus a JVM-local registry (the JVM-internal case file locks cannot
    * see). A second concurrent drain on the same checkpoint fails
    * loudly instead of silently corrupting the cursor. Distinct
    * checkpoints (independent consumers of the same table) are
    * unaffected. */
  private val jvmHeld =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def withDrainLock[A](checkpointDir: String)(body: => A): A = {
    val dir = Paths.get(checkpointDir)
    Files.createDirectories(dir)
    val canonical = dir.toRealPath().toString
    if (!jvmHeld.add(canonical))
      throw new IllegalStateException(
        s"another consumer in this JVM is draining checkpoint $checkpointDir " +
          "— drain is single-consumer per checkpoint")
    try {
      val ch = java.nio.channels.FileChannel.open(
        dir.resolve("_drain.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.tryLock()
        if (lock == null)
          throw new IllegalStateException(
            s"another process is draining checkpoint $checkpointDir " +
              "— drain is single-consumer per checkpoint")
        try body finally lock.release()
      } finally ch.close()
    } finally jvmHeld.remove(canonical)
  }

  /** Drain every committed version past the cursor up to the latest at
    * entry. `sink(batch, version)` receives one DataFrame per version
    * with added files; returns the number of batches emitted this
    * call. Versions whose change set emits nothing (skipped deletes)
    * still advance the cursor. Exactly one drain may run per
    * checkpoint at a time (see [[withDrainLock]]). */
  def drain(
      spark: SparkSession, root: String, checkpointDir: String,
      ignoreDeletes: Boolean = false)(
      sink: (DataFrame, Int) => Unit): Int = withDrainLock(checkpointDir) {
    val target = CommitLog.latestVersion(root)
    var emitted = 0
    CommitLog.changes(root, lastProcessed(checkpointDir), target).foreach {
      ch =>
        // OPTIMIZE commits (dataChange=false) restate already-emitted
        // rows in new files: advance past them without emitting —
        // compaction composes with a live tail instead of faulting it
        if (ch.dataChange) {
          CommitLogSource.requireNoDv(ch.added ++ ch.removed,
            s"tail drain v${ch.version} of $root")
          if (ch.removed.nonEmpty && ch.added.nonEmpty)
            throw new IllegalStateException(
              s"v${ch.version} rewrites data (adds ${ch.added.size}, removes " +
                s"${ch.removed.size}): its added files re-state rows this " +
                "consumer already emitted — a tail cannot process a " +
                "copy-on-write commit without double-counting")
          if (ch.removed.nonEmpty && !ignoreDeletes)
            throw new IllegalStateException(
              s"v${ch.version} removes ${ch.removed.mkString(",")}: a tail " +
                "emits appends only and cannot retract — set ignoreDeletes " +
                "to skip delete commits")
          if (ch.added.nonEmpty) {
            sink(spark.read.parquet(
                ch.added.map(b => CommitLog.batchPath(root, b)): _*),
              ch.version)
            emitted += 1
          }
        }
        advance(checkpointDir, ch.version)
    }
    emitted
  }
}
