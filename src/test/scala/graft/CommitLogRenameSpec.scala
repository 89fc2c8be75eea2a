package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge, CommitLogOptimize, CommitLogWrite}
import org.apache.spark.sql.functions._

/** RENAME COLUMN via column mapping: a metadata-only commit chains the
  * new logical name to every name the column ever had; readers resolve
  * per file era, writers write current names, rewrites localize. Pins
  * metadata-only-ness, era mixing, chained renames, collision/
  * constraint guards, time travel, DML over renamed data, checkpoint
  * replay, and manifest pruning through the name chain. */
class CommitLogRenameSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("rename").toString

  /** v1: 1-50 via the sink (declares the DDL `k BIGINT, v BIGINT`). */
  private def baseTable(root: String): Unit =
    (1 to 50).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()

  private def parquetFiles(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
  }

  test("rename is metadata-only; old and new eras read as one table") {
    val root = freshRoot()
    baseTable(root)
    val before = parquetFiles(root)
    val c = CommitLog.renameColumn(root, "v", "amount")
    assert(c.version == 2)
    assert(parquetFiles(root) == before, "rename must rewrite nothing")
    assert(CommitLog.history(root).last.operation.contains("RENAME COLUMN"))
    // post-rename append writes the NEW name
    (51 to 60).map(i => (i.toLong, i * 10L)).toDF("k", "amount")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val rows = spark.read.format("commitlog").option("path", root).load()
      .as[(Long, Long)].collect().toMap
    assert(rows.size == 60 && rows(7L) == 70L && rows(55L) == 550L,
      "old files must answer through the former name")
    // a post-rename append under the OLD name is rejected loudly
    intercept[Exception] {
      (61 to 62).map(i => (i.toLong, i * 10L)).toDF("k", "v")
        .repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
  }

  test("chained renames resolve newest-first; time travel keeps eras") {
    val root = freshRoot()
    baseTable(root)
    CommitLog.renameColumn(root, "v", "amount") // v2
    (51 to 60).map(i => (i.toLong, i * 10L)).toDF("k", "amount")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save() // v3
    CommitLog.renameColumn(root, "amount", "price") // v4
    assert(CommitLog.formerNamesOf(root, 4) ==
      Map("price" -> Seq("amount", "v")))
    val latest = spark.read.format("commitlog").option("path", root).load()
    assert(latest.columns.toSeq == Seq("k", "price"))
    val m = latest.as[(Long, Long)].collect().toMap
    assert(m.size == 60 && m(3L) == 30L && m(53L) == 530L,
      "both eras must resolve through the chain")
    // time travel reads the schema of its era
    val atV1 = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 1).load()
    assert(atV1.columns.toSeq == Seq("k", "v"))
    assert(atV1.count() == 50)
    val atV3 = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 3).load()
    assert(atV3.columns.toSeq == Seq("k", "amount"))
  }

  test("collision, former-name reuse and constraint refs are rejected") {
    val root = freshRoot()
    baseTable(root)
    CommitLog.renameColumn(root, "v", "amount")
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(root, "amount", "k") // live column
    }
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(root, "amount", "v") // still-mapped former
    }
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(root, "nope", "x") // unknown column
    }
    CommitLogWrite.addConstraint(spark, root, "amt_pos", "amount > 0")
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(root, "amount", "total") // CHECK references it
    }
  }

  test("DML and merge resolve renamed columns across eras; COW localizes") {
    val root = freshRoot()
    baseTable(root)
    CommitLog.renameColumn(root, "v", "amount")
    // predicate + assignment on the NEW name against OLD-era files
    val u = CommitLogDml.update(spark, root, "amount = 70",
      Seq("amount" -> "amount + 1"))
    assert(u.affected == 1, u)
    val d = CommitLogDml.delete(spark, root, "k > 20") // 30/50 → COW
    assert(d.leg == "cow")
    val snap = spark.read.format("commitlog").option("path", root).load()
      .as[(Long, Long)].collect().toMap
    assert(snap.size == 20 && snap(7L) == 71L && snap(8L) == 80L)
    // the rewrite localized the rename: a fresh footer carries 'amount'
    val rewritten = CommitLog.files(root, CommitLog.latestVersion(root))
    val footer = spark.read.parquet(
      graft.sources.CommitLogSource.listParquet(root, rewritten.head): _*)
    assert(footer.columns.contains("amount") && !footer.columns.contains("v"))
    // merge on the renamed table
    val st = CommitLogMerge.merge(spark, root,
      Seq((1L, 1000L, "U"), (99L, 990L, "U")).toDF("k", "amount", "_op"),
      keyCols = Seq("k"))
    val after = CommitLogMerge.snapshot(spark, root).as[(Long, Long)]
      .collect().toMap
    assert(after(1L) == 1000L && after(99L) == 990L, st)
  }

  test("column map rides checkpoints and survives vacuum") {
    val root = freshRoot()
    baseTable(root)
    CommitLog.renameColumn(root, "v", "amount") // v2
    // push past the checkpoint interval so replay starts at a ckpt
    (1 to 9).foreach { i =>
      Seq((1000L + i, i.toLong)).toDF("k", "amount").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    val latest = CommitLog.latestVersion(root)
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    assert(CommitLog.formerNamesOf(root, latest) == Map("amount" -> Seq("v")),
      "colmap must replay from the checkpoint after vacuum")
    val rows = spark.read.format("commitlog").option("path", root).load()
      .as[(Long, Long)].collect().toMap
    assert(rows.size == 59 && rows(7L) == 70L)
  }

  test("optimize compacts across the rename and unions era boxes") {
    val root = freshRoot()
    baseTable(root) // v1 (sink writes stats boxes)
    CommitLog.renameColumn(root, "v", "amount") // v2
    (51 to 60).map(i => (i.toLong, i * 10L)).toDF("k", "amount")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save() // v3
    val r = CommitLogOptimize.optimize(spark, root,
      smallBytes = 1L << 30, targetPartitions = 1)
    assert(r.packed.nonEmpty, r)
    val rows = spark.read.format("commitlog").option("path", root).load()
      .as[(Long, Long)].collect().toMap
    assert(rows.size == 60 && rows(3L) == 30L && rows(59L) == 590L)
    // the pack's box landed under the CURRENT name, unioned over eras
    val box = CommitLog.statsOf(root, CommitLog.latestVersion(root))
      .values.headOption.flatMap(_.get("amount")).flatMap(_.box)
    assert(box.contains((10.0, 600.0)), box)
  }

  test("a rename under a live stream fails loudly; a restart resolves it") {
    val root = freshRoot()
    baseTable(root) // v1, schema (k, v)
    val ckpt = java.nio.file.Files.createTempDirectory("ren_ck").toString
    // foreachBatch: the one sink shape that recovers from a checkpoint
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def sinkTo(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val last = df.columns.last
      df.select(col("k"), col(last)).as[(Long, Long)].collect()
        .foreach(seen.add)
    }
    // a LIVE stream analyzed against the pre-rename schema...
    val live = spark.readStream.format("commitlog").option("path", root).load()
      .writeStream.foreachBatch(sinkTo _)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      .start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (seen.size < 50 && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(seen.size == 50)
    // ...must FAIL when a rename + new-era append land under it, not
    // silently null-fill the new files' values
    CommitLog.renameColumn(root, "v", "amount")
    (51 to 60).map(i => (i.toLong, i * 10L)).toDF("k", "amount")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    while (live.exception.isEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    val e = live.exception.getOrElse(fail("stream must fail on the rename"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("renamed or dropped"))), e)
    // a RESTART plans with the current schema: the old era resolves
    // through the column map, the new era natively, and the offsets
    // resume past the already-emitted versions
    val q2 = spark.readStream.format("commitlog").option("path", root).load()
      .writeStream.foreachBatch(sinkTo _)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    import scala.jdk.CollectionConverters._
    val resumed = seen.asScala.toSeq
    assert(resumed.size == 60 && resumed.toMap ==
      (1 to 60).map(i => i.toLong -> i * 10L).toMap,
      s"the restart must emit exactly the post-checkpoint versions " +
        s"(got ${resumed.size})")
  }

  test("manifest pruning probes the whole name chain") {
    val root = freshRoot()
    baseTable(root) // box for 'v' recorded at write time
    CommitLog.renameColumn(root, "v", "amount")
    (51 to 60).map(i => (i.toLong, i * 100000L)).toDF("k", "amount")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    // filter on the NEW name far above the old era's box: the old
    // batch must prune from its 'v'-keyed box (1 planned file, not 2)
    val planned = spark.read.format("commitlog").option("path", root).load()
      .filter($"amount" > 1000000L)
    assert(planned.rdd.getNumPartitions == 1,
      s"expected the pre-rename batch pruned, got " +
        s"${planned.rdd.getNumPartitions} partitions")
    assert(planned.count() == 10, "only the post-rename batch qualifies")
  }
}
