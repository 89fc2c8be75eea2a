package graft.sources

/** Versioned commit log with OPTIMISTIC CONCURRENCY for the S22
  * lakehouse table layout (`queries/Sources.scala` s22_time_travel):
  * every commit publishes an immutable manifest `_log/v<N>.json`
  * listing exactly the data batches visible at version N, and the
  * Delta/Iceberg conflict protocol arbitrates concurrent writers:
  *
  *  1. A writer snapshots version R, stages its data files (writes are
  *     always NEW files — data files are immutable), and attempts to
  *     publish manifest v(R+1) with CREATE-IF-ABSENT semantics. The
  *     create is atomic (content is fully written to a hidden temp
  *     file, then hard-linked into place — `link(2)` fails with EEXIST
  *     if a rival won), so exactly ONE writer can ever own a version
  *     number: the history is linear by construction.
  *  2. The loser re-reads the new latest snapshot and conflict-checks:
  *     if every file it REMOVES (copy-on-write rewrite set; empty for
  *     pure appends) still exists in the current manifest, the rival's
  *     commit was disjoint — REBASE (recompute the file list on top of
  *     current) and retry at the next version. If a removed file is
  *     gone, a rival rewrote or dropped the same data — ABORT with
  *     `ConcurrentModificationException`; retrying would resurrect or
  *     double-delete rows.
  *
  * Pure appends therefore always commit (livelock aside — bounded by
  * `maxAttempts`); conflicting copy-on-write deletes abort cleanly,
  * exactly once, with no partial state: an unpublished manifest is
  * invisible, and staged data files without a manifest entry are dead
  * bytes a compactor may sweep.
  *
  * At 100 TB the mechanism is unchanged — manifests are metadata-sized
  * and the atomic create maps onto whatever the store offers
  * (HDFS rename-if-absent, S3 conditional PUT, a DynamoDB/JDBC lock
  * row); this implementation targets a POSIX filesystem, which is what
  * the fixtures and CI use.
  */
object CommitLog {
  import java.nio.file.{Files, Path, Paths}

  final case class Commit(version: Int, attempts: Int)

  private def manifest(root: String, v: Int): Path =
    Paths.get(root, "_log", s"v$v.json")

  /** Highest committed version; 0 = empty table (no manifests). */
  def latestVersion(root: String): Int = {
    import scala.jdk.CollectionConverters._
    val log = Paths.get(root, "_log")
    if (!Files.isDirectory(log)) return 0
    val it = Files.list(log)
    try it.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case VersionName(v) => v }
      .foldLeft(0)(math.max)
    finally it.close()
  }

  private object VersionName {
    private val Re = "v(\\d+)\\.json".r
    def unapply(name: String): Option[Int] = name match {
      case Re(d) => Some(d.toInt)
      case _ => None
    }
  }

  /** The batch names visible at version `v` (v0 = empty table). */
  def files(root: String, v: Int): Seq[String] = {
    if (v == 0) return Nil
    val txt = new String(Files.readAllBytes(manifest(root, v)), "UTF-8")
    parseList(txt)
  }

  private def parseList(txt: String): Seq[String] = {
    val body = txt.trim.stripPrefix("[").stripSuffix("]").trim
    if (body.isEmpty) Nil
    else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  private def renderList(files: Seq[String]): String =
    files.map(f => "\"" + f + "\"").mkString("[", ",", "]")

  /** Atomically publish manifest `v` listing `fs` — true iff this call
    * won the version. Content is fully durable before the name appears
    * (write temp, fsync via write, then hard-link), so a concurrent
    * reader can never observe a partial manifest. */
  def tryCommit(root: String, v: Int, fs: Seq[String]): Boolean = {
    val target = manifest(root, v)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(
      s"_tmp-v$v-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp, renderList(fs).getBytes("UTF-8"))
    try {
      Files.createLink(target, tmp) // atomic create-if-absent with content
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  final case class VacuumStats(
      expiredManifests: Int, sweptBatches: Seq[String], retainedFrom: Int)

  /** RETENTION — the maintenance half of the log (Delta VACUUM /
    * Iceberg expire-snapshots): drop every manifest older than the
    * last `keepLast` versions, then sweep data batches referenced by
    * NO surviving manifest. Order matters for crash safety: manifests
    * are deleted FIRST, so a crash at any point leaves either extra
    * expired manifests (re-vacuum) or orphaned data batches — and
    * orphans are exactly what the sweep detects (any root entry not
    * referenced by a surviving manifest), so a later vacuum finishes
    * the job. Retained versions are never touched: time travel within
    * the retention window keeps working; reads of expired versions
    * fail cleanly on the missing manifest.
    *
    * `minAgeMs` guards the one unsafe race: a concurrent committer's
    * STAGED batch exists on disk before its manifest publishes, and
    * would look orphaned. Production setting = comfortably above the
    * longest stage-to-commit latency (the same contract as Delta's
    * retention-hours check); 0 only when no writer can be in flight. */
  def vacuum(root: String, keepLast: Int, minAgeMs: Long = 0L): VacuumStats = {
    require(keepLast >= 1, "must retain at least the latest version")
    val latest = latestVersion(root)
    if (latest == 0) return VacuumStats(0, Nil, 0)
    val cutoff = math.max(1, latest - keepLast + 1)
    var expired = 0
    (1 until cutoff).foreach { v =>
      if (Files.deleteIfExists(manifest(root, v))) expired += 1
    }
    val live = (cutoff to latest).flatMap(files(root, _)).toSet
    val now = System.currentTimeMillis()
    val swept = scala.collection.mutable.ArrayBuffer.empty[String]
    listDir(Paths.get(root)).foreach { p =>
      val name = p.getFileName.toString
      val isData = !name.startsWith("_") && !name.startsWith(".")
      if (isData && !live.contains(name) &&
          now - Files.getLastModifiedTime(p).toMillis >= minAgeMs) {
        deleteTree(p)
        swept += name
      }
    }
    VacuumStats(expired, swept.toSeq.sorted, cutoff)
  }

  /** Materialized directory listing (safe to delete entries after). */
  private def listDir(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val it = Files.list(dir)
    try it.iterator().asScala.toList finally it.close()
  }

  private def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteTree)
    Files.deleteIfExists(p)
  }

  /** Optimistic commit: stage happened already (data files written);
    * publish `added`, retire `removed`, starting from the snapshot the
    * writer read at `readVersion`. Returns the committed version.
    * Throws `ConcurrentModificationException` when a rival removed any
    * of THIS writer's `removed` set first (overlapping copy-on-write). */
  def commit(
      root: String, readVersion: Int,
      added: Seq[String], removed: Seq[String] = Nil,
      maxAttempts: Int = 50): Commit = {
    val removedSet = removed.toSet
    var base = readVersion
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      val cur = files(root, base)
      if (base != readVersion && !removedSet.subsetOf(cur.toSet))
        throw new java.util.ConcurrentModificationException(
          s"conflict at v$base: rival commit removed " +
            s"${removedSet -- cur.toSet} first (overlapping copy-on-write)")
      val next = cur.filterNot(removedSet) ++ added
      if (tryCommit(root, base + 1, next)) return Commit(base + 1, attempts)
      base = latestVersion(root) // lost the race: rebase onto the winner
    }
    throw new IllegalStateException(
      s"commit on $root gave up after $maxAttempts attempts (livelock?)")
  }
}
