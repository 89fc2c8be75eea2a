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

  test("chaos: 4 racing committers + a live tail + concurrent vacuums on ONE log = dense history, exactly-once drain, nothing swept") {
    // the composed storm a shared 100 TB table actually sees: writers
    // contending on versions while a downstream tail drains and a
    // maintenance job vacuums. Invariants under fire: the history
    // stays dense and linear, the tail sees every version exactly
    // once with its exact row payload, and vacuum (with the minAge
    // guard that is its concurrency contract) never touches a racing
    // writer's staged-but-unpublished batch.
    val root = freshRoot("chaos")
    val ckpt = freshRoot("chaos_ckpt")
    val writers = 4
    val commitsEach = 5
    // stage ALL parquet up front (Spark writes inside racing threads
    // would serialize on the session); commits then race purely on the
    // log, which is the contention under test
    for (w <- 0 until writers; i <- 0 until commitsEach)
      writeBatch(root, s"w${w}_b$i", Seq(w * 100 + i))
    val swept = new java.util.concurrent.atomic.AtomicInteger(0)
    val vacuumRuns = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val drained = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def spawn(body: => Unit): Thread = {
      val t = new Thread(() =>
        try { start.await(); body } catch { case e: Throwable => failures.add(e) })
      t.start(); t
    }
    val committerThreads = (0 until writers).map { w =>
      spawn {
        (0 until commitsEach).foreach { i =>
          CommitLog.commit(root, CommitLog.latestVersion(root),
            added = Seq(s"w${w}_b$i"))
        }
      }
    }
    val tailThread = spawn {
      while (!done.get()) {
        CommitLogTail.drain(spark, root, ckpt, ignoreDeletes = true) {
          (df, v) =>
            val prev = drained.putIfAbsent(v, java.lang.Long.valueOf(df.count()))
            assert(prev == null, s"tail emitted v$v twice")
        }
      }
    }
    val vacuumThread = spawn {
      while (!done.get()) {
        // keepLast beyond the storm (no expiry — the tail must keep
        // every version readable); minAge is the staged-batch guard
        val st = CommitLog.vacuum(root, keepLast = 1000, minAgeMs = 60000)
        swept.addAndGet(st.sweptBatches.size)
        vacuumRuns.incrementAndGet()
      }
    }
    start.countDown()
    committerThreads.foreach(_.join(120000))
    done.set(true)
    tailThread.join(120000); vacuumThread.join(120000)
    assert(failures.isEmpty, s"thread died: ${failures.peek()}")
    // final catch-up drain for whatever the live tail missed at shutdown
    CommitLogTail.drain(spark, root, ckpt, ignoreDeletes = true) { (df, v) =>
      assert(drained.putIfAbsent(v, java.lang.Long.valueOf(df.count())) == null,
        s"v$v twice")
    }
    val total = writers * commitsEach
    assert(CommitLog.latestVersion(root) == total,
      "every racing commit must land exactly once, versions dense")
    assert(CommitLog.files(root, total).sorted ==
      (for (w <- 0 until writers; i <- 0 until commitsEach)
        yield s"w${w}_b$i").sorted)
    assert(drained.size == total && CommitLogTail.lastProcessed(ckpt) == total,
      s"tail must see all $total versions exactly once, saw ${drained.size}")
    import scala.jdk.CollectionConverters._
    assert(drained.values.asScala.map(_.longValue).sum == total.toLong,
      "each single-row batch drains with its exact payload")
    assert(swept.get() == 0,
      "vacuum must never sweep a racing writer's staged batch")
    assert(vacuumRuns.get() > 0, "vacuum must actually have raced the storm")
    // the checkpoint cadence fired under contention too
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      root, "_log", s"ckpt-v${CommitLog.checkpointInterval}.json")))
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

  test("drain is single-consumer per checkpoint: a concurrent drain fails loudly") {
    val root = freshRoot("lock")
    val ckpt = freshRoot("lock_ckpt")
    writeBatch(root, "b1", Seq(1))
    CommitLog.commit(root, 0, added = Seq("b1"))
    // first drain parks inside the sink while holding the lock
    val inside = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      CommitLogTail.drain(spark, root, ckpt) { (_, _) =>
        inside.countDown()
        release.await()
      })
    holder.start()
    assert(inside.await(30, java.util.concurrent.TimeUnit.SECONDS))
    try {
      val e = intercept[IllegalStateException] {
        CommitLogTail.drain(spark, root, ckpt) { (_, _) =>
          fail("second consumer must never reach the sink")
        }
      }
      assert(e.getMessage.contains("single-consumer"), e.getMessage)
      // a DIFFERENT checkpoint (independent consumer) is unaffected
      val ckpt2 = freshRoot("lock_ckpt2")
      assert(CommitLogTail.drain(spark, root, ckpt2) { (_, _) => () } == 1)
    } finally {
      release.countDown()
      holder.join(30000)
    }
    // the lock releases with the drain: a follow-up drain proceeds
    assert(CommitLogTail.drain(spark, root, ckpt) { (_, _) =>
      fail("nothing new to emit")
    } == 0)
  }
}
