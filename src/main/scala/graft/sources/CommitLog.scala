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
