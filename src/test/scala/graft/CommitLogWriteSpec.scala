package graft

import graft.sources.{CommitLog, CommitLogCommitMessage, CommitLogDml, CommitLogStreamingWrite, CommitLogWrite}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** The commit-log table as a DSv2 SINK (`df.write.format("commitlog")`
  * / `writeStream.format("commitlog")`): append commits, per-epoch txn
  * watermarks for exactly-once under replay, crash-orphan recovery,
  * born-prunable stats, and interop with rival committers through the
  * optimistic protocol. */
class CommitLogWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clw_$tag").toString

  private def readIds(root: String): Seq[Long] =
    spark.read.format("commitlog").option("path", root).load()
      .select("id").as[Long].collect().sorted.toSeq

  test("batch append: each write commits one version; schema is declared; data round-trips") {
    val root = freshRoot("batch")
    Seq(1L, 2L).toDF("id").withColumn("v", $"id" * 10)
      .write.format("commitlog").option("path", root).mode("append").save()
    Seq(3L).toDF("id").withColumn("v", $"id" * 10)
      .write.format("commitlog").option("path", root).mode("append").save()
    assert(CommitLog.latestVersion(root) == 2)
    assert(readIds(root) == Seq(1L, 2L, 3L))
    // first write declared the schema: reads plan off the log's DDL
    assert(CommitLog.schemaOf(root, 2).isDefined)
    // time travel sees only the first append
    val v1 = spark.read.format("commitlog")
      .option("path", root).option("versionAsOf", 1).load()
    assert(v1.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("batch append commits born-prunable stats boxes") {
    val root = freshRoot("stats")
    Seq((1L, 5.0), (2L, 9.0)).toDF("id", "x")
      .write.format("commitlog").option("path", root).mode("append").save()
    Seq((3L, 100.0)).toDF("id", "x")
      .write.format("commitlog").option("path", root).mode("append").save()
    val v = CommitLog.latestVersion(root)
    val stats = CommitLog.statsOf(root, v)
    assert(stats.size == 2, s"both batches should carry boxes: $stats")
    val boxes = stats.values.flatMap(_.get("x").flatMap(_.box)).toSeq.sortBy(_._1)
    assert(boxes == Seq((5.0, 9.0), (100.0, 100.0)))
    // pruning on x in [0, 50] keeps only the first batch
    val pruned = CommitLog.prunedFiles(root, v, "x", 0.0, 50.0)
    assert(pruned.size == 1, s"expected one surviving batch: $pruned")
  }

  test("streaming sink: epochs land as txn batches; replayed epoch commit is a no-op") {
    val root = freshRoot("replay")
    val w = new CommitLogStreamingWrite(
      root, Seq(1L).toDF("id").schema, app = "apprep")
    // drive the driver-side protocol directly: stage a task file the
    // way a writer task would, then commit the epoch twice (Structured
    // Streaming redelivers the last epoch after a crash-restart)
    def stageAndCommit(epoch: Long): Unit = {
      val stage = s"$root/${w.stageName(epoch)}"
      val tmp = "_p00000-t0.parquet.tmp"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
      // content written through the real task writer
      val dw = new graft.sources.CommitLogDataWriter(
        stage, Seq(1L).toDF("id").schema, tmp, "part-p00000.parquet")
      dw.write(org.apache.spark.sql.catalyst.InternalRow(epoch * 10))
      val msg = dw.commit()
      w.commit(epoch, Array(msg))
    }
    stageAndCommit(0L)
    stageAndCommit(1L)
    val vAfter = CommitLog.latestVersion(root)
    assert(vAfter == 2)
    assert(readIds(root) == Seq(0L, 10L))
    // replay epoch 1: watermark detects it, nothing new publishes
    stageAndCommit(1L)
    assert(CommitLog.latestVersion(root) == vAfter, "replay must not commit")
    assert(readIds(root) == Seq(0L, 10L), "replay must not double rows")
    assert(CommitLog.txnsOf(root, vAfter) == Map("apprep" -> 1L))
  }

  test("crash-orphan recovery: a final-named dir with no manifest entry is replaced, not doubled") {
    val root = freshRoot("orphan")
    val schema = Seq(1L).toDF("id").schema
    val w = new CommitLogStreamingWrite(root, schema, app = "apporph")
    val batch = s"txn-apporph-e${CommitLogWrite.pad(0L)}"
    // simulate a crash AFTER the stage→final rename but BEFORE the
    // manifest publish: final-named dir exists, log knows nothing
    val orphan = java.nio.file.Paths.get(s"$root/$batch")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-stale.parquet"), Array[Byte](1))
    // the replayed epoch stages fresh data and publishes
    val stage = s"$root/${w.stageName(0L)}"
    val dw = new graft.sources.CommitLogDataWriter(
      stage, schema, "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    dw.write(org.apache.spark.sql.catalyst.InternalRow(7L))
    w.commit(0L, Array(dw.commit()))
    assert(CommitLog.latestVersion(root) == 1)
    assert(readIds(root) == Seq(7L))
    // the stale orphan file is gone — the batch is exactly the replay's set
    assert(!java.nio.file.Files.exists(orphan.resolve("part-stale.parquet")))
  }

  test("txn watermarks survive checkpoints and vacuum") {
    val root = freshRoot("vac")
    val schema = Seq(1L).toDF("id").schema
    val w = new CommitLogStreamingWrite(root, schema, app = "appvac")
    (0L until 10L).foreach { e =>
      val stage = s"$root/${w.stageName(e)}"
      val dw = new graft.sources.CommitLogDataWriter(
        stage, schema, "_p00000-t0.parquet.tmp", "part-p00000.parquet")
      dw.write(org.apache.spark.sql.catalyst.InternalRow(e))
      w.commit(e, Array(dw.commit()))
    }
    // 10 commits crossed the checkpoint cadence (8); expire history
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.txnsOf(root, v)("appvac") == 9L,
      "the cutoff checkpoint must carry the watermark through retention")
    // a pre-watermark replay after vacuum is still a no-op
    val stage = s"$root/${w.stageName(3L)}"
    val dw = new graft.sources.CommitLogDataWriter(
      stage, schema, "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    dw.write(org.apache.spark.sql.catalyst.InternalRow(999L))
    w.commit(3L, Array(dw.commit()))
    assert(CommitLog.latestVersion(root) == v)
    assert(!readIds(root).contains(999L))
  }

  test("streaming sink end-to-end: readStream → commitlog sink → batch read, exactly once") {
    val root = freshRoot("e2e")
    val tbl = freshRoot("e2e_src")
    val ckpt = freshRoot("e2e_ckpt")
    spark.range(0, 100).select($"id", ($"id" % 7).cast("double").as("x"))
      .write.mode("overwrite").parquet(tbl)
    val schema = spark.read.parquet(tbl).schema
    val q = spark.readStream.schema(schema).parquet(tbl)
      .writeStream.format("commitlog")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .start()
    q.awaitTermination()
    val got = spark.read.format("commitlog").option("path", root).load()
    assert(got.count() == 100L)
    assert(got.agg(sum($"id")).as[Long].head() == 4950L)
    // the epoch landed with its watermark under the query's id
    val v = CommitLog.latestVersion(root)
    val txns = CommitLog.txnsOf(root, v)
    assert(txns.size == 1 && txns.values.head >= 0L, s"txns: $txns")
    // restart on the same checkpoint: nothing new, nothing doubled
    val q2 = spark.readStream.schema(schema).parquet(tbl)
      .writeStream.format("commitlog")
      .option("path", root)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .start()
    q2.awaitTermination()
    assert(spark.read.format("commitlog").option("path", root).load().count() == 100L)
  }

  test("sink commits arbitrate against rival committers via the optimistic protocol") {
    val root = freshRoot("rival")
    val schema = Seq(1L).toDF("id").schema
    // rival appends land between the sink's read of latestVersion and
    // its commit — publish() passes a stale readVersion and the
    // rebase loop must linearize both
    Seq(100L).toDF("id").write.parquet(s"$root/rival1")
    CommitLog.commit(root, 0, added = Seq("rival1"), schema = Some(schema.toDDL))
    val w = new CommitLogStreamingWrite(root, schema, app = "appriv")
    val stage = s"$root/${w.stageName(0L)}"
    val dw = new graft.sources.CommitLogDataWriter(
      stage, schema, "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    dw.write(org.apache.spark.sql.catalyst.InternalRow(1L))
    val msg = dw.commit()
    // interleave: another rival lands right now
    Seq(200L).toDF("id").write.parquet(s"$root/rival2")
    CommitLog.commit(root, 1, added = Seq("rival2"))
    w.commit(0L, Array(msg))
    assert(CommitLog.latestVersion(root) == 3)
    assert(readIds(root) == Seq(1L, 100L, 200L))
  }

  private def plannedParts(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum

  test("connector pushdown prunes batches by manifest stats; residual filter keeps results exact") {
    val root = freshRoot("prune")
    // three sink appends with disjoint x ranges — stats ride along
    // automatically, one part file each (repartition(1))
    Seq((1L, 5.0), (2L, 9.0)).toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    Seq((3L, 50.0)).toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    Seq((4L, 500.0), (5L, 900.0)).toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val all = spark.read.format("commitlog").option("path", root).load()
    assert(plannedParts(all) == 3, "unfiltered read plans every batch")
    // range filter: only the matching batch's file is planned…
    val hi = all.filter($"x" >= 100.0)
    assert(plannedParts(hi) == 1,
      s"manifest boxes must prune to one batch:\n${hi.queryExecution.executedPlan}")
    // …and the answer is the exact one (residual filter still applied)
    assert(hi.select("id").as[Long].collect().sorted.toSeq == Seq(4L, 5L))
    // two-sided box intersects: x in [40, 60] plans one batch
    val mid = all.filter($"x" >= 40.0 && $"x" <= 60.0)
    assert(plannedParts(mid) == 1)
    assert(mid.select("id").as[Long].collect().toSeq == Seq(3L))
    // a boundary predicate never over-prunes: x >= 9 intersects every
    // box ([5,9] at its upper edge) — all batches planned, exact rows
    val edge = all.filter($"x" >= 9.0)
    assert(plannedParts(edge) == 3)
    assert(edge.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L, 5L))
  }

  test("connector column pruning narrows the scan's output schema") {
    val root = freshRoot("colprune")
    Seq((1L, 5.0, "a")).toDF("id", "x", "s").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val df = spark.read.format("commitlog").option("path", root).load()
      .select("id")
    val scanSchemas = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema().fieldNames.toSeq
    }
    assert(scanSchemas == Seq(Seq("id")),
      s"scan must read only the projected column: $scanSchemas")
    assert(df.as[Long].collect().toSeq == Seq(1L))
  }

  test("timestamp, date and decimal columns round-trip and prune by time range") {
    val root = freshRoot("typed")
    def day(d: String) = java.sql.Date.valueOf(d)
    def ts(t: String) = java.sql.Timestamp.valueOf(t)
    Seq(
      (1L, ts("2024-01-01 00:00:00"), day("2024-01-01"), BigDecimal("12.34")),
      (2L, ts("2024-01-02 12:30:45"), day("2024-01-02"), BigDecimal("56.78")))
      .toDF("id", "t", "d", "m")
      .withColumn("m", $"m".cast("decimal(18,2)")).repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    Seq((3L, ts("2025-06-15 08:00:00"), day("2025-06-15"), BigDecimal("99.99")))
      .toDF("id", "t", "d", "m")
      .withColumn("m", $"m".cast("decimal(18,2)")).repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val df = spark.read.format("commitlog").option("path", root).load()
    // values round-trip exactly through the sink's encodings
    val rows = df.orderBy("id")
      .select($"id", $"t".cast("string"), $"d".cast("string"), $"m".cast("string"))
      .as[(Long, String, String, String)].collect().toSeq
    assert(rows == Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-01", "12.34"),
      (2L, "2024-01-02 12:30:45", "2024-01-02", "56.78"),
      (3L, "2025-06-15 08:00:00", "2025-06-15", "99.99")))
    // a time-range filter prunes to the matching batch via its
    // micros box (same for dates via epoch-day boxes)
    val recent = df.filter($"t" >= ts("2025-01-01 00:00:00"))
    assert(plannedParts(recent) == 1, "timestamp box must prune")
    assert(recent.select("id").as[Long].collect().toSeq == Seq(3L))
    val oldDays = df.filter($"d" < day("2024-06-01"))
    assert(plannedParts(oldDays) == 1, "date box must prune")
    assert(oldDays.count() == 2L)
    val cheap = df.filter($"m" < BigDecimal("50.00"))
    assert(plannedParts(cheap) == 1, "decimal box must prune")
    assert(cheap.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("history records verb labels and txn watermarks; vacuum truncates it with time travel") {
    val root = freshRoot("hist")
    Seq(1L).toDF("id").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val w = new CommitLogStreamingWrite(root, Seq(1L).toDF("id").schema, "apphist")
    val stage = s"$root/${w.stageName(0L)}"
    val dw = new graft.sources.CommitLogDataWriter(
      stage, Seq(1L).toDF("id").schema, "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    dw.write(org.apache.spark.sql.catalyst.InternalRow(2L))
    w.commit(0L, Array(dw.commit()))
    val h = CommitLog.history(root)
    assert(h.map(e => (e.version, e.operation)) ==
      Seq((1, Some("WRITE")), (2, Some("STREAMING UPDATE"))))
    assert(h.last.txnApp.contains("apphist") && h.last.txnEpoch.contains(0L))
    assert(h.forall(_.dataChange))
    // six more appends cross the checkpoint cadence, then vacuum
    (0 until 6).foreach { _ =>
      Seq(9L).toDF("id").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    val after = CommitLog.history(root)
    assert(after.map(_.version) == Seq(7, 8),
      s"history must reach exactly as far as time travel: ${after.map(_.version)}")
  }

  test("bloomColumns: string point lookups prune batches from manifest blooms") {
    val root = freshRoot("bloom")
    def append(kind: String, ids: Seq[Long]): Unit =
      ids.map(i => (i, kind)).toDF("id", "kind").repartition(1)
        .write.format("commitlog").option("path", root)
        .option("bloomColumns", "kind").mode("append").save()
    append("alpha", Seq(1L, 2L))
    append("beta", Seq(3L))
    append("gamma", Seq(4L, 5L))
    val all = spark.read.format("commitlog").option("path", root).load()
    assert(plannedParts(all) == 3)
    // equality probe plans only the batch whose bloom admits the value
    val beta = all.filter($"kind" === "beta")
    assert(plannedParts(beta) == 1,
      s"bloom must prune to one batch:\n${beta.queryExecution.executedPlan}")
    assert(beta.select("id").as[Long].collect().toSeq == Seq(3L))
    // IN probe: union of admitted batches
    val two = all.filter($"kind".isin("alpha", "gamma"))
    assert(plannedParts(two) == 2)
    assert(two.count() == 4L)
    // a value in no batch prunes everything — and still answers right
    val none = all.filter($"kind" === "delta")
    assert(plannedParts(none) == 0)
    assert(none.count() == 0L)
    // blooms replay through checkpoints + vacuum like stats: expire
    // the manifest that declared beta's bloom (v2) — the cutoff
    // checkpoint must carry it forward
    (0 until 8).foreach(_ => append("filler", Seq(9L)))
    CommitLog.vacuum(root, keepLast = 3, minAgeMs = 0L)
    val afterVac = spark.read.format("commitlog").option("path", root).load()
      .filter($"kind" === "beta")
    assert(plannedParts(afterVac) == 1, "blooms must survive the cutoff checkpoint")
  }

  test("bloomColumns: BIGINT point lookups prune where overlapping boxes cannot") {
    val root = freshRoot("nbloom")
    // interleaved ids: every batch's (min,max) box spans nearly the
    // full id range, so range pruning keeps all four — the bloom is
    // the only modality that can serve the point lookup (integral
    // values hash their decimal-string canonical form; the probe side
    // derives the same key from the pushed Long literal)
    (0L until 4L).foreach { r =>
      (0L until 400L).filter(i => i % 4 == r && i != 17L).map(i => (i, s"k$i"))
        .toDF("id", "kind").repartition(1)
        .write.format("commitlog").option("path", root)
        .option("bloomColumns", "id").option("bloomBits", "65536")
        .mode("append").save()
    }
    val all = spark.read.format("commitlog").option("path", root).load()
    assert(plannedParts(all) == 4)
    val one = all.filter($"id" === 13L)
    assert(plannedParts(one) == 1,
      s"BIGINT bloom must prune to one batch:\n${one.queryExecution.executedPlan}")
    assert(one.select("kind").as[String].collect().toSeq == Seq("k13"))
    // IN probe spanning two residue classes: union of admitted batches
    val two = all.filter($"id".isin(13L, 14L))
    assert(plannedParts(two) == 2)
    assert(two.count() == 2L)
    // an in-range but ABSENT value (17 was excluded from its batch):
    // every box contains it, so only the blooms can prune — to zero
    val none = all.filter($"id" === 17L)
    assert(plannedParts(none) == 0,
      s"absent id must prune everything:\n${none.queryExecution.executedPlan}")
    assert(none.count() == 0L)
    // a DOUBLE bloom column is refused loudly (no canonical text form)
    val err = intercept[Exception] {
      Seq((1L, 1.5)).toDF("id", "v").repartition(1)
        .write.format("commitlog").option("path", freshRoot("dblbloom"))
        .option("bloomColumns", "v").mode("append").save()
    }
    assert(err.getMessage.contains("STRING or integral"), err.getMessage)
  }

  test("bloom auto-sizing: fold-then-merge equals build-small, bit for bit") {
    import graft.sources.CommitLogBloom
    // the fold soundness claim is exactness, not approximation:
    // positions are h mod 2^a, so folding a big filter in half keeps
    // h mod 2^(a-1) — identical to having built small from the start
    val vals = (0 until 1000).map(i => s"v$i")
    val big = CommitLogBloom.emptyBits(CommitLogBloom.BuildBits)
    vals.foreach(CommitLogBloom.add(big, _))
    val target = CommitLogBloom.sizeFor(1000)
    val small = CommitLogBloom.emptyBits(target)
    vals.foreach(CommitLogBloom.add(small, _))
    assert(CommitLogBloom.toHex(CommitLogBloom.fold(big, target)) ==
      CommitLogBloom.toHex(small))
    // sizing curve: floor at the old default, ~8.5 bits/value, 2^20 cap
    assert(CommitLogBloom.sizeFor(0) == 4096)
    assert(CommitLogBloom.sizeFor(400) == 4096)
    assert(CommitLogBloom.sizeFor(1000) == 16384)
    assert(CommitLogBloom.sizeFor(167000) == (1 << 20))
    assert(CommitLogBloom.sizeFor(10_000_000L) == (1 << 20))
  }

  test("bloom auto-sizing: a 167k-id batch at default settings still prunes") {
    // the r15 failure shape (ROUND15.md §7): fixed-width filters
    // saturate silently as batches grow — at sf1 cardinalities
    // (~167k ids/batch) FP ≈ 0.7 and plans widen toward all batches.
    // Auto mode sizes from the batch's published row count: capped at
    // 2^20 bits here (FP ≈ 5%), a point probe plans ~1 batch of 3.
    val root = freshRoot("autobloom")
    (0L until 3L).foreach { r =>
      spark.range(0, 500001).filter($"id" % 3 === r)
        .select($"id", ($"id" * 2).as("v")).repartition(1)
        .write.format("commitlog").option("path", root)
        .option("bloomColumns", "id").mode("append").save()
    }
    val all = spark.read.format("commitlog").option("path", root).load()
    assert(plannedParts(all) == 3)
    val probe = all.filter($"id" === 300000L)
    assert(plannedParts(probe) <= 2,
      s"auto-sized bloom must keep the point probe narrow at 167k ids: " +
        s"planned ${plannedParts(probe)} of 3")
    assert(probe.count() == 1L)
    // manifest filters sit at the cap (167k ids want 2^21, clamped)
    val blooms = CommitLog.bloomsOf(root, CommitLog.latestVersion(root))
    assert(blooms.values.flatMap(_.values)
      .forall(_.length == (1 << 20) / 4),
      "auto width must clamp at 2^20 bits")
    // a SMALL batch folds to the floor — no manifest bloat for the
    // common case the old default served well
    val tiny = freshRoot("tinybloom")
    Seq((1L, 2L)).toDF("id", "v").repartition(1)
      .write.format("commitlog").option("path", tiny)
      .option("bloomColumns", "id").mode("append").save()
    val tinyHex = CommitLog.bloomsOf(tiny, CommitLog.latestVersion(tiny))
      .values.flatMap(_.values).head
    assert(tinyHex.length == 4096 / 4, s"floor width: ${tinyHex.length * 4}")
    // the explicit dial still pins an exact width (the override path)
    val fixed = freshRoot("fixedbloom")
    Seq((1L, 2L)).toDF("id", "v").repartition(1)
      .write.format("commitlog").option("path", fixed)
      .option("bloomColumns", "id").option("bloomBits", "65536")
      .mode("append").save()
    val fixedHex = CommitLog.bloomsOf(fixed, CommitLog.latestVersion(fixed))
      .values.flatMap(_.values).head
    assert(fixedHex.length == 65536 / 4, s"dial width: ${fixedHex.length * 4}")
  }

  test("a batch written without blooms never prunes on string probes") {
    val root = freshRoot("nobloom")
    Seq((1L, "x")).toDF("id", "kind").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    Seq((2L, "y")).toDF("id", "kind").repartition(1)
      .write.format("commitlog").option("path", root)
      .option("bloomColumns", "kind").mode("append").save()
    val q = spark.read.format("commitlog").option("path", root).load()
      .filter($"kind" === "x")
    // batch 1 has no bloom (always read); batch 2's bloom excludes "x"
    assert(plannedParts(q) == 1)
    assert(q.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("constant-stamped feed windows run the vectorized leg (r15)") {
    // a feed window of appends (and whole-batch deletes) has CONSTANT
    // _change_type/_commit_version per partition — the scan is
    // columnar, stamps riding as constant trailing partition vectors;
    // a DV commit in the window forces per-row work and the row leg
    val root = freshRoot("colfeed")
    (0 until 3).foreach { i =>
      spark.range(i * 50L, (i + 1) * 50L).toDF("id").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    def feed = spark.read.format("commitlog").option("path", root)
      .option("readChangeFeed", "true").option("startingVersion", 0).load()
    val plan = feed.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"append-only window must be columnar:\n$plan")
    val rows = feed.collect()
    assert(rows.length == 150)
    assert(feed.groupBy($"_commit_version").count().count() == 3)
    // DV delete enters the window: per-row position synthesis → row leg
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try CommitLogDml.delete(spark, root, "id = 10", changeFeed = false)
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    val plan2 = feed.queryExecution.executedPlan.toString
    assert(!plan2.contains("ColumnarToRow"),
      s"a DV window needs the row leg:\n$plan2")
    assert(feed.count() == 151) // 150 inserts + 1 synthesized delete
  }

  test("timestampAsOf resolves time travel against commit times") {
    val root = freshRoot("tsasof")
    Seq(1L).toDF("id").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    Seq(2L).toDF("id").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val v1 = spark.read.format("commitlog").option("path", root)
      .option("timestampAsOf", between.toString).load()
    assert(v1.select("id").as[Long].collect().toSeq == Seq(1L))
    // a time before every commit fails loudly, like an expired version
    val err = intercept[Exception] {
      spark.read.format("commitlog").option("path", root)
        .option("timestampAsOf", "2000-01-01").load().collect()
    }
    assert(err.getMessage.contains("no readable version"))
    // startingTimestamp: a stream from `between` emits only v2
    val ckpt = freshRoot("tsasof_ckpt")
    val out = freshRoot("tsasof_out")
    val q = spark.readStream.format("commitlog").option("path", root)
      .option("startingTimestamp", between.toString).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("maxBytesPerTrigger bounds each micro-batch's admitted bytes") {
    val root = freshRoot("maxbytes")
    (1 to 4).foreach { i =>
      Seq(i.toLong).toDF("id").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    val ckpt = freshRoot("maxbytes_ckpt")
    val out = freshRoot("maxbytes_out")
    // 1 byte budget → the soft cap admits exactly one version per batch
    val q = spark.readStream.format("commitlog").option("path", root)
      .option("maxBytesPerTrigger", 1).load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    assert(q.recentProgress.count(_.numInputRows > 0) == 4,
      "each version must drain in its own bounded micro-batch")
  }

  test("a replayed epoch racing a rival's identical batch name surfaces as txn-committed, not duplicate-name") {
    val root = freshRoot("txnorder")
    val schema = Seq(1L).toDF("id").schema
    // rival replay already published the deterministic batch name with
    // its txn watermark
    val batch = s"txn-apptxo-e${CommitLogWrite.pad(0L)}"
    Seq(1L).toDF("id").write.parquet(s"$root/$batch")
    CommitLog.commit(root, 0, added = Seq(batch),
      schema = Some(schema.toDDL), txn = Some(("apptxo", 0L)))
    // our replay commits the SAME name + epoch from a stale base: the
    // idempotence check must win over the duplicate-name require —
    // TxnAlreadyCommittedException is the "already done" signal the
    // sink's publish() treats as a clean no-op
    intercept[CommitLog.TxnAlreadyCommittedException] {
      CommitLog.commit(root, 0, added = Seq(batch), txn = Some(("apptxo", 0L)))
    }
    // and the sink-level replay (fresh attempt, same epoch) is a no-op
    val w = new CommitLogStreamingWrite(root, schema, app = "apptxo")
    val dw = new graft.sources.CommitLogDataWriter(
      s"$root/${w.stageName(0L)}", schema,
      "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    dw.write(org.apache.spark.sql.catalyst.InternalRow(1L))
    w.commit(0L, Array(dw.commit()))
    assert(CommitLog.latestVersion(root) == 1, "replay must not publish")
  }

  test("CHECK constraints: declared against clean data, enforced on every sink publish") {
    val root = freshRoot("check")
    // launder the tuple encoder's NOT NULL on x: the first write's
    // plan schema is what the DDL records, and a declared NOT NULL is
    // a write-time contract of its own (NotNullSpec) — this test is
    // about CHECK semantics, where NULL must PASS
    Seq((1L, 5.0)).toDF("id", "x0")
      .select($"id", when($"x0" > Double.NegativeInfinity, $"x0").as("x"))
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogWrite.addConstraint(spark, root, "x_pos", "x > 0")
    assert(CommitLog.constraintsOf(root, CommitLog.latestVersion(root))
      == Map("x_pos" -> "x > 0"))
    assert(CommitLog.history(root).last.operation.contains("ADD CONSTRAINT"))
    // a clean append passes
    Seq((2L, 7.0)).toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    // a violating append fails loudly and publishes NOTHING
    val before = CommitLog.latestVersion(root)
    val err = intercept[Exception] {
      Seq((3L, -1.0)).toDF("id", "x").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    def chain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(err).contains("x_pos"), chain(err))
    assert(CommitLog.latestVersion(root) == before, "violation must not commit")
    assert(readIds(root) == Seq(1L, 2L))
    // NULL passes (SQL CHECK semantics); a second constraint stacks
    Seq((4L, Option.empty[Double])).toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    assert(readIds(root) == Seq(1L, 2L, 4L))
    CommitLogWrite.addConstraint(spark, root, "id_small", "id < 1000")
    intercept[Exception] {
      Seq((5000L, 1.0)).toDF("id", "x").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    // declaring a constraint EXISTING data violates is rejected
    intercept[CommitLog.ConstraintViolationException] {
      CommitLogWrite.addConstraint(spark, root, "impossible", "id > 100")
    }
    // constraints survive vacuum via the cutoff checkpoint
    (0 until 8).foreach { i =>
      Seq((10L + i, 1.0)).toDF("id", "x").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    assert(CommitLog.constraintsOf(root, CommitLog.latestVersion(root)).keySet
      == Set("x_pos", "id_small"))
    intercept[Exception] {
      Seq((6L, -9.0)).toDF("id", "x").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
  }

  test("a streaming epoch violating a CHECK constraint fails without consuming a version") {
    val root = freshRoot("checkstream")
    val schema = Seq((1L, 1.0)).toDF("id", "x").schema
    Seq((1L, 1.0)).toDF("id", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogWrite.addConstraint(spark, root, "x_pos", "x > 0")
    val w = new CommitLogStreamingWrite(root, schema, "appchk")
    val dw = new graft.sources.CommitLogDataWriter(
      s"$root/${w.stageName(0L)}", schema,
      "_p00000-t0.parquet.tmp", "part-p00000.parquet")
    dw.write(org.apache.spark.sql.catalyst.InternalRow(2L, -5.0))
    val before = CommitLog.latestVersion(root)
    intercept[CommitLog.ConstraintViolationException] {
      w.commit(0L, Array(dw.commit()))
    }
    assert(CommitLog.latestVersion(root) == before)
    assert(CommitLog.txnsOf(root, before).isEmpty,
      "no watermark may advance for a rejected epoch")
  }

  test("sink files are compressed with the session parquet codec") {
    val root = freshRoot("codec")
    spark.range(0, 5000).toDF("id")
      .withColumn("s", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("v"), org.apache.spark.sql.functions.col("id")))
      .write.format("commitlog").option("path", root).mode("append").save()
    val file = CommitLog.files(root, 1)
      .flatMap(graft.sources.CommitLogSource.listParquet(root, _)).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val codec =
      try r.getFooter.getBlocks.get(0).getColumns.get(0).getCodec.toString
      finally r.close()
    // COW rewrites go through Spark's writer (session codec, default
    // snappy) — sink files must not silently land UNCOMPRESSED
    assert(codec == spark.conf
      .get("spark.sql.parquet.compression.codec", "snappy").toUpperCase,
      s"sink wrote $codec")
  }

  test("writer rejects unsupported column types loudly") {
    // arrays/structs/binary/maps landed with the nested-format work
    // (CommitLogNestedSpec) and wide decimals with CommitLogDecimalSpec
    // — intervals (and UDTs) remain the documented refusal, gated
    // BEFORE any byte lands
    // Spark itself refuses INTERVAL in a DSv2 write schema before the
    // sink sees it, so exercise the commit-time SHAPE GATE directly
    val err = intercept[Exception] {
      CommitLogWrite.parquetType(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("iv",
          org.apache.spark.sql.types.CalendarIntervalType))))
    }
    def chain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(err).contains("does not support"))
  }
}
