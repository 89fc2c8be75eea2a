package graft

import graft.sources.{CommitLog, CommitLogTail}
import org.scalatest.funsuite.AnyFunSuite

/** The change-feed tail: durable version cursor, Delta-source delete
  * semantics, crash replay bounded to the in-flight version, and
  * AvailableNow bounding. Pure JVM where possible (the sink records
  * what it was handed; parquet reads are covered by the s22d decl). */
class CommitLogTailSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"tail_$tag").toString

  private def writeBatch(root: String, batch: String, ids: Seq[Int]): Unit = {
    import spark.implicits._
    ids.toDF("id").write.parquet(s"$root/$batch")
  }

  test("drain emits each append once in order; pure-delete commits skip under ignoreDeletes") {
    val root = freshRoot("order")
    val ckpt = freshRoot("order_ckpt")
    writeBatch(root, "b1", Seq(1, 2))
    writeBatch(root, "b2", Seq(3))
    writeBatch(root, "b4", Seq(4, 5, 6))
    CommitLog.commit(root, 0, added = Seq("b1"))
    CommitLog.commit(root, 1, added = Seq("b2"))
    CommitLog.commit(root, 2, added = Nil, removed = Seq("b1"))
    CommitLog.commit(root, 3, added = Seq("b4"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val n = CommitLogTail.drain(spark, root, ckpt, ignoreDeletes = true) {
      (df, v) => seen += ((v, df.count()))
    }
    assert(n == 3)
    assert(seen.toSeq == Seq((1, 2L), (2, 1L), (4, 3L)),
      s"wrong batches or order: $seen")
    assert(CommitLogTail.lastProcessed(ckpt) == 4)
    // nothing new: the next drain is a no-op
    assert(CommitLogTail.drain(spark, root, ckpt, ignoreDeletes = true) {
      (_, _) => fail("no new versions to emit")
    } == 0)
  }

  test("a remove-only commit fails the drain without ignoreDeletes and does not advance past it") {
    val root = freshRoot("del")
    val ckpt = freshRoot("del_ckpt")
    writeBatch(root, "b1", Seq(1))
    CommitLog.commit(root, 0, added = Seq("b1"))
    CommitLog.commit(root, 1, added = Nil, removed = Seq("b1"))
    val e = intercept[IllegalStateException] {
      CommitLogTail.drain(spark, root, ckpt) { (_, _) => () }
    }
    assert(e.getMessage.contains("ignoreDeletes"))
    // v1 was emitted and committed to the cursor before v2 failed
    assert(CommitLogTail.lastProcessed(ckpt) == 1)
    // opting in resumes cleanly from the cursor
    assert(CommitLogTail.drain(spark, root, ckpt, ignoreDeletes = true) {
      (_, _) => fail("the delete commit emits nothing")
    } == 0)
    assert(CommitLogTail.lastProcessed(ckpt) == 2)
  }

  test("a copy-on-write commit always fails: its adds re-state already-emitted rows") {
    val root = freshRoot("cow")
    val ckpt = freshRoot("cow_ckpt")
    writeBatch(root, "b1", Seq(1, 2))
    writeBatch(root, "b1a", Seq(2))
    CommitLog.commit(root, 0, added = Seq("b1"))
    CommitLog.commit(root, 1, added = Seq("b1a"), removed = Seq("b1"))
    val e = intercept[IllegalStateException] {
      CommitLogTail.drain(spark, root, ckpt, ignoreDeletes = true) {
        (_, _) => ()
      }
    }
    assert(e.getMessage.contains("double-count"))
    assert(CommitLogTail.lastProcessed(ckpt) == 1,
      "cursor must stop before the rewrite commit")
  }

  test("crash mid-drain replays only the in-flight version; idempotent sink = exactly-once") {
    val root = freshRoot("crash")
    val ckpt = freshRoot("crash_ckpt")
    (1 to 3).foreach { i => writeBatch(root, s"b$i", Seq(i)) }
    var v = 0
    (1 to 3).foreach { i =>
      v = CommitLog.commit(root, v, added = Seq(s"b$i")).version
    }
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Int]
    // the sink dies AFTER handling v2 but BEFORE its cursor advance
    intercept[RuntimeException] {
      CommitLogTail.drain(spark, root, ckpt) { (_, ver) =>
        emitted += ver
        if (ver == 2) throw new RuntimeException("sink crash")
      }
    }
    assert(emitted.toSeq == Seq(1, 2) && CommitLogTail.lastProcessed(ckpt) == 1)
    // resume: v2 replays (at-least-once), v3 emits once — an
    // idempotent version-keyed sink makes the replay invisible
    CommitLogTail.drain(spark, root, ckpt) { (_, ver) => emitted += ver }
    assert(emitted.toSeq == Seq(1, 2, 2, 3))
    assert(CommitLogTail.lastProcessed(ckpt) == 3)
  }

  test("AvailableNow bound: a commit landing mid-drain waits for the next invocation") {
    val root = freshRoot("nowbound")
    val ckpt = freshRoot("nowbound_ckpt")
    writeBatch(root, "b1", Seq(1))
    writeBatch(root, "b2", Seq(2))
    writeBatch(root, "late", Seq(9))
    var v = 0
    Seq("b1", "b2").foreach { b =>
      v = CommitLog.commit(root, v, added = Seq(b)).version
    }
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    CommitLogTail.drain(spark, root, ckpt) { (_, ver) =>
      seen += ver
      // a rival writer publishes while the drain is running
      if (ver == 1) CommitLog.commit(root, 2, added = Seq("late"))
    }
    assert(seen.toSeq == Seq(1, 2), s"drain must stop at its entry snapshot: $seen")
    CommitLogTail.drain(spark, root, ckpt) { (_, ver) => seen += ver }
    assert(seen.toSeq == Seq(1, 2, 3), "the late commit arrives next call")
  }
}
