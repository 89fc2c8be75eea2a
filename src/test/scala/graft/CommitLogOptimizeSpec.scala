package graft

import graft.sources.{CommitLog, CommitLogCdf, CommitLogOptimize, CommitLogTail}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** OPTIMIZE over the commit log: layout-only compaction committed with
  * dataChange=false, composing with live tails (skipped, not faulted),
  * the row-level CDF (no churn), time travel, and rival committers. */
class CommitLogOptimizeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clopt_$tag").toString

  private def append(root: String, ids: Seq[Long]): Int = {
    ids.toDF("id").withColumn("x", $"id".cast("double")).repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLog.latestVersion(root)
  }

  private def readIds(root: String): Seq[Long] =
    spark.read.format("commitlog").option("path", root).load()
      .select("id").as[Long].collect().sorted.toSeq

  test("optimize packs small batches into one; rows, snapshot and stats survive") {
    val root = freshRoot("pack")
    append(root, Seq(1L, 2L))
    append(root, Seq(3L))
    append(root, Seq(4L, 5L))
    val before = CommitLog.files(root, CommitLog.latestVersion(root))
    assert(before.size == 3)
    val r = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    assert(r.packed.isDefined && r.sources.toSet == before.toSet)
    val v = CommitLog.latestVersion(root)
    assert(v == 4)
    val after = CommitLog.files(root, v)
    assert(after == Seq(r.packed.get), s"one packed batch: $after")
    assert(readIds(root) == Seq(1L, 2L, 3L, 4L, 5L))
    // layout-only flag recorded; time travel pre-optimize still works
    assert(!CommitLog.isDataChange(root, v))
    assert(spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 2).load().count() == 3L)
    // stats boxes unioned from the sinks' born boxes: id in [1,5]
    val box = CommitLog.statsOf(root, v)(r.packed.get)("id")
    assert(box == (1.0, 5.0), s"unioned box: $box")
    // pruning still effective through the connector
    val pruned = spark.read.format("commitlog").option("path", root).load()
      .filter($"id" >= 100.0)
    assert(pruned.count() == 0L)
  }

  test("optimize is a no-op below two small candidates") {
    val root = freshRoot("noop")
    append(root, Seq(1L, 2L))
    val r = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    assert(r.packed.isEmpty && CommitLog.latestVersion(root) == 1)
  }

  test("a live streaming tail skips the optimize commit: no fault, no double rows") {
    val root = freshRoot("tail")
    val ckpt = freshRoot("tail_ckpt")
    val out = freshRoot("tail_out")
    append(root, Seq(1L))
    append(root, Seq(2L))
    def drain(): Unit = {
      val q = spark.readStream.format("commitlog").option("path", root).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() == 2L)
    // optimize lands BETWEEN the two drains, then another append
    CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    append(root, Seq(3L))
    drain()
    // the second drain emits ONLY the new append — the rewrite version
    // was skipped (pre-dataChange, a COW commit hard-failed the stream)
    assert(spark.read.parquet(out).select("id").as[Long].collect()
      .sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("CommitLogTail.drain advances past optimize without emitting") {
    val root = freshRoot("drain")
    val ckpt = freshRoot("drain_ckpt")
    append(root, Seq(1L))
    append(root, Seq(2L))
    CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    append(root, Seq(3L))
    var versions = Seq.empty[Int]
    val emitted = CommitLogTail.drain(spark, root, ckpt) { (df, v) =>
      versions = versions :+ v
      df.count()
    }
    assert(emitted == 3 && versions == Seq(1, 2, 4),
      s"v3 (optimize) must be skipped: emitted=$emitted versions=$versions")
    assert(CommitLogTail.lastProcessed(ckpt) == 4)
  }

  test("the row-level CDF emits zero churn for an optimize commit") {
    val root = freshRoot("cdf")
    append(root, Seq(1L))
    append(root, Seq(2L))
    CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    val feed = CommitLogCdf.changeFeed(spark, root, 0, 3, keyCols = Seq("id"))
    // versions 1 and 2 insert; version 3 contributes nothing
    assert(feed.groupBy(col(CommitLogCdf.CommitVersionCol)).count()
      .as[(Int, Long)].collect().toMap == Map(1 -> 1L, 2 -> 1L))
  }

  test("a rival rewrite of the same smalls aborts exactly one optimizer") {
    val root = freshRoot("rival")
    append(root, Seq(1L))
    append(root, Seq(2L))
    // rival COW-rewrites batch set first (simulated: remove+add)
    val v = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, v)
    Seq(1L, 2L).toDF("id").withColumn("x", $"id".cast("double"))
      .write.parquet(s"$root/rewrite1")
    CommitLog.commit(root, v, added = Seq("rewrite1"), removed = live)
    // the optimizer staged against the OLD snapshot: its remove set is
    // gone — the optimistic protocol must abort it
    intercept[java.util.ConcurrentModificationException] {
      // stage a pack against stale state by bypassing the fresh read:
      // simplest faithful reproduction is a direct stale commit
      CommitLog.commit(root, v, added = Seq("stalepack"), removed = live,
        dataChange = false)
    }
    // the real operator re-reads latest and sees one batch -> no-op
    val r = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    assert(r.packed.isEmpty)
  }

  private def plannedParts(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum

  test("optimizeClustered: z-curve re-layout makes 2-D range predicates prune from the manifest") {
    val root = freshRoot("zorder")
    // two scattered appends: each spans the FULL (a, b) range, so
    // before clustering no box can prune anything
    def scatter(parity: Int): Unit =
      spark.range(0, 256).filter($"id" % 2 === parity)
        .select($"id", ($"id" % 16).as("a"), floor($"id" / 16).as("b"))
        .repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    scatter(0); scatter(1)
    val pre = spark.read.format("commitlog").option("path", root).load()
      .filter($"a" <= 3 && $"b" <= 3)
    assert(plannedParts(pre) == 2, "scattered layout reads every batch")

    val r = graft.sources.CommitLogOptimize.optimizeClustered(
      spark, root, zorderBy = Seq("a", "b"), buckets = 4)
    assert(r.packed.size == 4 && r.sources.size == 2)
    val v = CommitLog.latestVersion(root)
    assert(!CommitLog.isDataChange(root, v))

    val all = spark.read.format("commitlog").option("path", root).load()
    assert(all.count() == 256L, "re-layout must preserve every row")
    assert(all.agg(sum($"id")).as[Long].head() == 255L * 256 / 2)
    // the z-quadrant predicate now plans ONE of four buckets
    val post = all.filter($"a" <= 3 && $"b" <= 3)
    assert(plannedParts(post) == 1,
      s"clustered boxes must prune to one bucket:\n${post.queryExecution.executedPlan}")
    assert(post.count() == 16L) // (a,b) pairs are unique over 0..255
    // one-dimensional ranges prune too (half the buckets)
    assert(plannedParts(all.filter($"a" >= 8)) == 2)
    // a live tail skips the clustering commit like any optimize
    val ckpt = freshRoot("zorder_ckpt")
    var emitted = Seq.empty[Int]
    CommitLogTail.drain(spark, root, ckpt) { (_, ver) => emitted = emitted :+ ver }
    assert(emitted == Seq(1, 2), s"the rewrite version must be skipped: $emitted")
  }

  test("dataChange=false is rejected on appends, deletes and schema changes") {
    val root = freshRoot("guard")
    append(root, Seq(1L))
    append(root, Seq(2L))
    val v = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, v)
    intercept[IllegalArgumentException] {
      CommitLog.commit(root, v, added = Seq("sneakyadd"), dataChange = false)
    }
    intercept[IllegalArgumentException] {
      CommitLog.commit(root, v, added = Nil, removed = live, dataChange = false)
    }
    intercept[IllegalArgumentException] {
      CommitLog.commit(root, v, added = Seq("p"), removed = live,
        schema = Some("id BIGINT"), dataChange = false)
    }
  }
}
