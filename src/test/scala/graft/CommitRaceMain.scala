package graft

/** Forked-JVM committer for ConcurrentCommitSpec's cross-process race:
  * the in-process races prove the protocol against JVM thread
  * interleavings, but the atomic create-if-absent claim is a
  * FILESYSTEM property (link(2) EEXIST) — this main lets the spec race
  * separate processes over one commit log, the way two real Spark
  * drivers would contend on a shared table. Blocks on a barrier file
  * so every committer attempts the same version window, then appends
  * one batch from the given stale read version and prints
  * `RACE <tag> <version> <attempts>`. Test tooling only. */
object CommitRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, tag, barrier, readVersion) = args.take(4)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(barrier))) {
      if (System.nanoTime() > deadline) sys.exit(2)
      Thread.sleep(5)
    }
    val c = graft.sources.CommitLog.commit(
      root, readVersion.toInt, added = Seq(s"by_$tag"))
    println(s"RACE $tag ${c.version} ${c.attempts}")
  }
}
