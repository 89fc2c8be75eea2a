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
    val st = CommitLog.statsOf(root, v)(r.packed.get)("id")
    assert(st.box.contains((1.0, 5.0)), s"unioned box: $st")
    assert(st.nulls.contains(0L), s"null counts must merge through the pack: $st")
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

  test("optimize unions the sources' blooms: point lookups stay prunable after packing") {
    val root = freshRoot("bloomunion")
    def append(kind: String): Unit =
      Seq((1L, kind)).toDF("id", "kind").repartition(1)
        .write.format("commitlog").option("path", root)
        .option("bloomColumns", "kind").mode("append").save()
    append("alpha"); append("beta")
    // a third batch WITHOUT bloom alongside — must veto the pack bloom
    val r1 = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    val v1 = CommitLog.latestVersion(root)
    val packBloom = CommitLog.bloomsOf(root, v1)(r1.packed.get)
    assert(packBloom.contains("kind"), "pack must carry the unioned bloom")
    assert(graft.sources.CommitLogBloom.mightContain(packBloom("kind"), "alpha"))
    assert(graft.sources.CommitLogBloom.mightContain(packBloom("kind"), "beta"))
    // and the union still prunes through the connector: a value in no
    // source is definitely absent from the pack
    val none = spark.read.format("commitlog").option("path", root).load()
      .filter($"kind" === "gamma")
    assert(none.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum == 0)
    // bloomless source poisons the union: pack carries no bloom
    Seq((9L, "nofilter")).toDF("id", "kind").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val r2 = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    val v2 = CommitLog.latestVersion(root)
    assert(!CommitLog.bloomsOf(root, v2).contains(r2.packed.get),
      "a bloomless source must leave the pack bloomless (unknown = keep)")
  }

  test("optimize folds mixed auto-sized bloom widths to the smallest (r16)") {
    import spark.implicits._
    val root = freshRoot("bloomfold")
    // auto sizing makes widths a function of batch size: a 1-row and
    // a 3000-row source differ (4096 vs 2^15 bits) — the pack must
    // fold to the common power-of-two width instead of dropping
    Seq((0L, "needle")).toDF("id", "kind").repartition(1)
      .write.format("commitlog").option("path", root)
      .option("bloomColumns", "kind").mode("append").save()
    spark.range(1, 3001).select($"id", concat(lit("k"), $"id").as("kind"))
      .repartition(1)
      .write.format("commitlog").option("path", root)
      .option("bloomColumns", "kind").mode("append").save()
    val widths = CommitLog.bloomsOf(root, CommitLog.latestVersion(root))
      .values.flatMap(_.values).map(_.length * 4).toSeq
    assert(widths.distinct.size == 2, s"fixture needs mixed widths: $widths")
    val r = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    val v = CommitLog.latestVersion(root)
    val packBloom = CommitLog.bloomsOf(root, v)(r.packed.get)
    assert(packBloom.contains("kind"), "mixed widths must fold, not drop")
    assert(packBloom("kind").length * 4 == widths.min)
    assert(graft.sources.CommitLogBloom.mightContain(packBloom("kind"), "needle"))
    assert(graft.sources.CommitLogBloom.mightContain(packBloom("kind"), "k1500"))
    // the folded union still prunes an absent value through the connector
    val none = spark.read.format("commitlog").option("path", root).load()
      .filter($"kind" === "absent-value")
    assert(none.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum == 0)
    assert(none.count() == 0L)
  }

  test("an all-empty streaming epoch still commits: dense versions, advancing watermark") {
    val root = freshRoot("emptyepoch")
    val schema = Seq(1L).toDF("id").schema
    val w = new graft.sources.CommitLogStreamingWrite(root, schema, "appempty")
    // epoch 0 carries data; epoch 1 is all-empty (every task filtered
    // everything out — commit messages name temps that never existed)
    val stage0 = s"$root/${w.stageName(0L)}"
    val dw = new graft.sources.CommitLogDataWriter(
      stage0, schema, "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    dw.write(org.apache.spark.sql.catalyst.InternalRow(1L))
    w.commit(0L, Array(dw.commit()))
    val dwEmpty = new graft.sources.CommitLogDataWriter(
      s"$root/${w.stageName(1L)}",
      schema, "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    w.commit(1L, Array(dwEmpty.commit())) // zero rows written
    assert(CommitLog.latestVersion(root) == 2)
    assert(CommitLog.txnsOf(root, 2) == Map("appempty" -> 1L),
      "the watermark must advance past the empty epoch or restart replays it forever")
    val df = spark.read.format("commitlog").option("path", root).load()
    assert(df.count() == 1L, "the empty batch contributes no rows")
  }

  test("optimizeClustered routes null zorder values to bucket 0") {
    val root = freshRoot("zbnull")
    Seq((1L, Some(5.0)), (2L, None), (3L, Some(9.0)))
      .toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    Seq((4L, Some(1.0))).toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val r = graft.sources.CommitLogOptimize.optimizeClustered(
      spark, root, zorderBy = Seq("x"), buckets = 2)
    assert(r.packed.nonEmpty)
    val all = spark.read.format("commitlog").option("path", root).load()
    assert(all.count() == 4L, "the null row must survive the re-layout")
    assert(all.filter($"x".isNull).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("chaos: sink epochs, a racing optimizer and a live tail interleave on one log") {
    // one table, three actors: a streaming-sink writer landing 12
    // epochs (5 rows each, disjoint id ranges), a maintenance loop
    // running optimize() concurrently (losing races are EXPECTED and
    // caught — the optimistic protocol's job), and a live tail
    // draining throughout. Invariants at the end: the tail emitted
    // every written row EXACTLY once (optimize versions skipped, no
    // loss, no double), the final snapshot holds exactly the written
    // ids, and a closing vacuum leaves the latest version readable.
    val root = freshRoot("chaos")
    val ckpt = freshRoot("chaos_ckpt")
    val schema = Seq(1L).toDF("id").schema
    val w = new graft.sources.CommitLogStreamingWrite(root, schema, "appchaos")
    val epochs = 12
    @volatile var optimizeRuns = 0
    @volatile var optimizeLost = 0
    @volatile var writerDone = false

    val writer = new Thread(() => {
      (0 until epochs).foreach { e =>
        val stage = s"$root/${w.stageName(e.toLong)}"
        val dw = new graft.sources.CommitLogDataWriter(
          stage, schema, "_p00000-t0.parquet.tmp", "part-p00000.parquet")
        (0 until 5).foreach(i =>
          dw.write(org.apache.spark.sql.catalyst.InternalRow(e * 100L + i)))
        w.commit(e.toLong, Array(dw.commit()))
        Thread.sleep(15)
      }
      writerDone = true
    }, "chaos-writer")
    val optimizer = new Thread(() => {
      while (!writerDone) {
        try {
          graft.sources.CommitLogOptimize.optimize(
            spark, root, smallBytes = 1L << 30)
          optimizeRuns += 1
        } catch {
          case _: java.util.ConcurrentModificationException => optimizeLost += 1
          case _: IllegalStateException => optimizeLost += 1 // commit livelock guard
        }
        Thread.sleep(40)
      }
    }, "chaos-optimizer")
    writer.start(); optimizer.start()

    // live tail: drain until the writer is done AND the cursor caught up
    val drained = scala.collection.mutable.ArrayBuffer.empty[Long]
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while ((!writerDone ||
        CommitLogTail.lastProcessed(ckpt) < CommitLog.latestVersion(root)) &&
        System.nanoTime() < deadline) {
      CommitLogTail.drain(spark, root, ckpt) { (df, _) =>
        drained ++= df.select("id").as[Long].collect()
      }
      Thread.sleep(10)
    }
    writer.join(10000); optimizer.join(10000)

    val expected = (0 until epochs).flatMap(e => (0 until 5).map(i => e * 100L + i))
    assert(drained.sorted == expected.sorted,
      s"tail must emit every row exactly once: got ${drained.size} of ${expected.size} " +
        s"(optimize runs=$optimizeRuns lost=$optimizeLost)")
    assert(readIds(root) == expected.sorted,
      "the final snapshot must hold exactly the written rows")
    assert(optimizeRuns + optimizeLost > 0, "the optimizer must have raced at all")
    // closing vacuum: latest stays readable, expired history fails cleanly
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    assert(readIds(root) == expected.sorted)
  }

  test("optimize preserves additively-evolved columns (reads plan with the log's DDL)") {
    val root = freshRoot("evolve")
    // v1 declares (id); v2 evolves additively to (id, extra)
    Seq(1L).toDF("id").write.parquet(s"$root/b1")
    CommitLog.commit(root, 0, added = Seq("b1"), schema = Some("id BIGINT"))
    Seq((2L, "kept")).toDF("id", "extra").write.parquet(s"$root/b2")
    CommitLog.commit(root, 1, added = Seq("b2"),
      schema = Some("id BIGINT, extra STRING"))
    // the pack must carry `extra` — a footer-sampled read could infer
    // from b1's footer and silently drop it from the rewrite
    CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    val df = spark.read.format("commitlog").option("path", root).load()
    assert(df.columns.toSeq == Seq("id", "extra"))
    assert(df.filter($"extra" === "kept").count() == 1L,
      "evolved column values must survive the rewrite")
    assert(df.filter($"id" === 1L).select("extra").head().isNullAt(0),
      "pre-evolution rows null-fill")
  }

  test("a CDF window holding only an optimize commit returns the empty feed, not an error") {
    val root = freshRoot("cdfempty")
    append(root, Seq(1L))
    append(root, Seq(2L))
    CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    // poll window (2, 3] contains ONLY the optimize version
    val feed = CommitLogCdf.changeFeed(spark, root, 2, 3, keyCols = Seq("id"))
    assert(feed.count() == 0L)
    assert(feed.columns.contains(CommitLogCdf.ChangeTypeCol))
  }

  test("the CDF reads through an all-empty epoch's zero-file batch") {
    val root = freshRoot("cdfemptyepoch")
    append(root, Seq(1L))
    val schema = Seq((1L, 1.0)).toDF("id", "x").schema
    val w = new graft.sources.CommitLogStreamingWrite(root, schema, "appcdfe")
    val dwEmpty = new graft.sources.CommitLogDataWriter(
      s"$root/${w.stageName(0L)}", schema,
      "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    w.commit(0L, Array(dwEmpty.commit())) // zero rows → empty batch dir
    val feed = CommitLogCdf.changeFeed(spark, root, 0, 2, keyCols = Seq("id"))
    // v1's insert rides; v2 (empty epoch) contributes nothing — and
    // does not crash schema inference
    assert(feed.count() == 1L)
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
