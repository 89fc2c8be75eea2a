package graft

import graft.sources.{CommitLog, CommitLogDml}

/** Round-15 advisor findings, each pinned as a regression:
  *
  *  1. parseStats' 5-field arity tolerates an EMPTY nulls slot the way
  *     the 7-field arm always has (renderStats' own 5-field branch
  *     carries an `n.getOrElse("")` path, so the empty slot is legal
  *     grammar) — a hand-edited or future-writer manifest degrades to
  *     nulls-unknown instead of crashing every replay with
  *     NumberFormatException;
  *  2. the round-16 `changeFiles` manifest field records at commit
  *     time whether the version promoted materialized change rows, so
  *     the variant-pushdown insert-only-window check plans from
  *     metadata instead of one remote listing per version. */
class Advice16Spec extends SparkSpec {
  import spark.implicits._

  test("an empty nulls slot in a 5-field stats entry degrades to unknown") {
    val root = java.nio.file.Files.createTempDirectory("cla16_ns").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "_log"))
    // hand-written manifest: legal grammar renderStats itself only
    // emits via the 7-field arm, but the 5-field writer path documents
    // the empty slot as legal — replay must not throw
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_log", "v1.json"),
      """{"add":["b1"],"remove":[],"stats":["b1|k|1.0|2.0|"]}"""
        .getBytes("UTF-8"))
    val st = CommitLog.statsOf(root, 1)("b1")("k")
    assert(st.box.contains((1.0, 2.0)))
    assert(st.nulls.isEmpty) // degraded, not crashed
  }

  test("commits record whether they promoted materialized change rows") {
    val root = java.nio.file.Files.createTempDirectory("cla16_cf").toString
    spark.range(0, 100).toDF("k")
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogDml.delete(spark, root, "k < 10") // feed off
    CommitLogDml.delete(spark, root, "k >= 90", changeFeed = true)
    val chs = CommitLog.changes(root, 0, CommitLog.latestVersion(root))
    // plain append: legacy-shaped (no flag) — readers use the op gate
    assert(chs(0).changeFiles.isEmpty && chs(0).op.contains("WRITE"))
    // feed-off DELETE: explicit false — no listing needed to prove it
    assert(chs(1).changeFiles.contains(false))
    // feed-on DELETE: explicit true, and the change dir really exists
    assert(chs(2).changeFiles.contains(true))
    assert(new java.io.File(s"$root/_changes/v${chs(2).version}").isDirectory)
  }
}
