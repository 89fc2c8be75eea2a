package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge, CommitLogWrite}
import org.apache.spark.sql.functions._

/** DELETE WHERE / UPDATE SET … WHERE over the commit log: leg choice
  * by write amplification, SQL NULL-predicate semantics, CHECK
  * constraint enforcement on UPDATE postimages, no-op on an empty
  * match, racing-verb arbitration, and changeFeed CDC materialization
  * (the s33 decl hash-checks the relational composition vs DuckDB). */
class CommitLogDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("dml").toString

  /** 100 rows over two batches: k 1-50 in b1, 51-100 in b2; v = 10k. */
  private def baseTable(root: String): Unit = {
    (1 to 50).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$root/b1")
    (51 to 100).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$root/b2")
    CommitLog.commit(root, 0, added = Seq("b1"))
    CommitLog.commit(root, 1, added = Seq("b2"))
  }

  test("sparse DELETE takes the DV leg; dense DELETE compacts it away") {
    val root = freshRoot()
    baseTable(root)
    val d1 = CommitLogDml.delete(spark, root, "k % 25 = 0") // 4 of 100
    assert(d1.leg == "dv" && d1.affected == 4, d1)
    assert(d1.removedBatches.isEmpty, "DV leg removes nothing")
    val snap1 = CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(snap1.size == 96 && !snap1.contains(25L) && !snap1.contains(100L))
    // the connector reconciles the MOR state: DV positions attach to
    // each file's partition and the record reader skips them
    val viaConnector = spark.read.format("commitlog").option("path", root)
      .load().as[(Long, Long)].collect().toMap
    assert(viaConnector == snap1, "connector batch read must match the " +
      "reconciling snapshot on a DV table")

    val d2 = CommitLogDml.delete(spark, root, "k <= 60") // dense
    assert(d2.leg == "cow", d2)
    assert(d2.affected == 58, d2) // 60 - the 2 already DV-deleted (25, 50)
    val files = CommitLog.files(root, d2.version)
    assert(!files.exists(_.startsWith("dv-")),
      s"rewrite must drop the fully-covered DV batch: $files")
    // plain connector read works again — the compaction proof
    val snap2 = spark.read.format("commitlog").option("path", root).load()
      .as[(Long, Long)].collect().toMap
    assert(snap2.keySet == (61 to 100).filter(_ % 25 != 0).map(_.toLong).toSet)
  }

  test("sparse UPDATE appends DV + postimages; dense UPDATE rewrites") {
    val root = freshRoot()
    baseTable(root)
    val u1 = CommitLogDml.update(spark, root, "k = 7",
      Seq("v" -> "v + 1"))
    assert(u1.leg == "dv" && u1.affected == 1, u1)
    val snap1 = CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(snap1.size == 100 && snap1(7L) == 71L && snap1(8L) == 80L)

    val u2 = CommitLogDml.update(spark, root, "k <= 50",
      Seq("v" -> "v * 2"))
    assert(u2.leg == "cow" && u2.affected == 50, u2)
    assert(!CommitLog.files(root, u2.version).exists(_.startsWith("dv-")))
    val snap2 = CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(snap2(7L) == 142L && snap2(50L) == 1000L && snap2(51L) == 510L)
    // assignments may reference other columns of the old row
    val u3 = CommitLogDml.update(spark, root, "k = 60",
      Seq("v" -> "k * 1000"))
    val snap3 = CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(snap3(60L) == 60000L, u3)
  }

  test("NULL predicate keeps the row (DELETE) and skips it (UPDATE)") {
    val root = freshRoot()
    Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("k", "v").repartition(1).write.parquet(s"$root/b1")
    CommitLog.commit(root, 0, added = Seq("b1"))
    val d = CommitLogDml.delete(spark, root, "v > 15") // NULL on k=2
    assert(d.affected == 1, d)
    val left = CommitLogMerge.snapshot(spark, root)
      .select("k").as[Long].collect().toSet
    assert(left == Set(1L, 2L), "NULL predicate must keep the row")
    val u = CommitLogDml.update(spark, root, "v > 5", Seq("v" -> "v + 1"))
    assert(u.affected == 1, "NULL predicate must skip the row")
  }

  test("empty match is a no-op: no version published") {
    val root = freshRoot()
    baseTable(root)
    val v0 = CommitLog.latestVersion(root)
    val d = CommitLogDml.delete(spark, root, "k > 1000")
    assert(d.leg == "noop" && d.affected == 0, d)
    assert(CommitLog.latestVersion(root) == v0)
  }

  test("UPDATE postimages violating a CHECK in force fail pre-stage") {
    val root = freshRoot()
    baseTable(root)
    CommitLogWrite.addConstraint(spark, root, "v_pos", "v > 0")
    val v0 = CommitLog.latestVersion(root)
    val e = intercept[CommitLog.ConstraintViolationException] {
      CommitLogDml.update(spark, root, "k <= 3", Seq("v" -> "-v"))
    }
    assert(e.name == "v_pos" && e.violations == 3, e.getMessage)
    assert(CommitLog.latestVersion(root) == v0, "nothing may commit")
    // an update that respects the constraint still lands
    val u = CommitLogDml.update(spark, root, "k <= 3", Seq("v" -> "v + 1"))
    assert(u.version == v0 + 1 && u.affected == 3, u)
  }

  test("racing verbs from one read version arbitrate: loser throws") {
    val root = freshRoot()
    baseTable(root)
    val readV = CommitLog.latestVersion(root)
    val win = CommitLogDml.delete(spark, root, "k = 1", readVersion = readV)
    assert(win.version == readV + 1)
    intercept[java.util.ConcurrentModificationException] {
      CommitLogDml.update(spark, root, "k = 2", Seq("v" -> "v + 1"),
        readVersion = readV)
    }
    // state is exactly the winner's
    assert(CommitLog.latestVersion(root) == readV + 1)
    val snap = CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(!snap.contains(1L) && snap(2L) == 20L)
  }

  test("changeFeed DML materializes its CDC rows post-win") {
    val root = freshRoot()
    baseTable(root)
    val u = CommitLogDml.update(spark, root, "k = 5",
      Seq("v" -> "v + 7"), changeFeed = true)
    val uRows = spark.read.parquet(s"$root/_changes/v${u.version}")
      .select("_change_type", "v").as[(String, Long)].collect().toSet
    assert(uRows == Set(("update_preimage", 50L), ("update_postimage", 57L)))
    val d = CommitLogDml.delete(spark, root, "k <= 2", changeFeed = true)
    val dRows = spark.read.parquet(s"$root/_changes/v${d.version}")
      .select("_change_type", "k").as[(String, Long)].collect().toSet
    assert(dRows == Set(("delete", 1L), ("delete", 2L)))
  }

  test("unknown predicate or assignment column fails loudly") {
    val root = freshRoot()
    baseTable(root)
    intercept[IllegalArgumentException] {
      CommitLogDml.delete(spark, root, "nope = 1")
    }
    intercept[IllegalArgumentException] {
      CommitLogDml.update(spark, root, "k = 1", Seq("nope" -> "1"))
    }
  }
}
