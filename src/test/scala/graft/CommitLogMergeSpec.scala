package graft

import graft.sources.{CommitLog, CommitLogMerge}
import org.apache.spark.sql.functions._

/** MERGE INTO over the commit log: leg choice by write amplification,
  * per-path stats, the dv-batch guards on non-reconciling readers, and
  * — the concurrency contract — two merges from the same read version
  * arbitrate to exactly one winner (the s24 decl hash-checks the full
  * relational composition against DuckDB). */
class CommitLogMergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("merge").toString

  private def baseTable(root: String, n: Int): Unit = {
    (1 to n).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(2).write.parquet(s"$root/b1")
    CommitLog.commit(root, 0, added = Seq("b1"))
  }

  private def src(rows: (Long, Long, String)*) =
    rows.toDF("k", "v", "_op")

  test("sparse change set takes the DV leg; stats and snapshot agree") {
    val root = freshRoot()
    baseTable(root, 100)
    val st = CommitLogMerge.merge(spark, root,
      src((1L, 11L, "U"), (2L, 0L, "D"), (200L, 2000L, "U")),
      keyCols = Seq("k"))
    assert(st.leg == "dv", st)
    assert((st.inserted, st.updated, st.deleted) == (1L, 1L, 1L), st)
    assert(st.removedBatches.isEmpty, "DV leg must remove nothing")
    val snap = CommitLogMerge.snapshot(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(snap.size == 100, "100 - 1 delete + 1 insert")
    assert(snap(1L) == 11L && snap(200L) == 2000L && !snap.contains(2L))
    // the connector batch read reconciles the MOR table in the reader
    val viaConnector = spark.read.format("commitlog").option("path", root)
      .load().as[(Long, Long)].collect().toMap
    assert(viaConnector == snap,
      "connector batch read must match the reconciling snapshot")
  }

  test("dense change set takes the COW leg and compacts covered DVs") {
    val root = freshRoot()
    baseTable(root, 10)
    CommitLogMerge.merge(spark, root, src((1L, 11L, "U")), Seq("k")) // DV
    val st = CommitLogMerge.merge(spark, root,
      src((1 to 6).map(i => (i.toLong, 0L, "D")): _*), Seq("k"))
    assert(st.leg == "cow", st)
    assert(st.deleted == 6L, st)
    val files = CommitLog.files(root, st.version)
    assert(!files.exists(_.startsWith("dv-")),
      s"COW rewrite must drop the fully-covered DV batch: $files")
    val snap = CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(snap.keySet == (7 to 10).map(_.toLong).toSet)
    // the table is plain again: the DSv2 batch reader works
    assert(spark.read.format("commitlog").option("path", root).load()
      .count() == 4)
  }

  test("two merges from one read version arbitrate: exactly one wins") {
    val root = freshRoot()
    baseTable(root, 10)
    val v1 = CommitLog.latestVersion(root)
    val first = CommitLogMerge.merge(spark, root,
      src((3L, 33L, "U")), Seq("k"), readVersion = v1)
    assert(first.version == v1 + 1)
    val e = intercept[java.util.ConcurrentModificationException] {
      CommitLogMerge.merge(spark, root,
        src((3L, 99L, "U"), (4L, 44L, "U")), Seq("k"), readVersion = v1)
    }
    assert(e.getMessage.contains("rival"), e.getMessage)
    // the loser's staged bytes are invisible; the winner's state stands
    assert(CommitLog.latestVersion(root) == v1 + 1)
    assert(CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap.apply(3L) == 33L)
    // re-read and re-run, the losing merge lands cleanly
    val retry = CommitLogMerge.merge(spark, root,
      src((3L, 99L, "U"), (4L, 44L, "U")), Seq("k"))
    assert(retry.version == v1 + 2)
    assert(CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap.apply(3L) == 99L)
  }

  test("a source with two rows for one key is rejected") {
    val root = freshRoot()
    baseTable(root, 5)
    val e = intercept[IllegalArgumentException] {
      CommitLogMerge.merge(spark, root,
        src((1L, 11L, "U"), (1L, 12L, "U")), Seq("k"))
    }
    assert(e.getMessage.contains("one row per key"), e.getMessage)
  }

  test("unmatched deletes are no-ops; matched-only source still merges") {
    val root = freshRoot()
    baseTable(root, 5)
    val st = CommitLogMerge.merge(spark, root,
      src((999L, 0L, "D")), Seq("k"))
    assert((st.inserted, st.updated, st.deleted) == (0L, 0L, 0L), st)
    assert(CommitLogMerge.snapshot(spark, root).count() == 5)
  }
}
