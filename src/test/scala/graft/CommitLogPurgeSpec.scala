package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge, CommitLogOptimize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** REORG … APPLY PURGE (SURVEY S75): deletion-vector compaction.
  * Rewrites every vector-referenced batch with its deletions APPLIED
  * and drops the vectors in one dataChange=false commit — restoring
  * the vectorized read leg and OPTIMIZE eligibility that one dv-
  * batch disqualifies, without moving untouched batches. */
class CommitLogPurgeSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clprg_$tag").toString

  private def dvDelete(root: String, cond: String): Unit = {
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try CommitLogDml.delete(spark, root, cond)
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
  }

  private def snap(root: String) =
    spark.read.format("commitlog").option("path", root).load()

  private def dvCount(root: String): Int =
    CommitLog.files(root, CommitLog.latestVersion(root))
      .count(_.startsWith(CommitLogMerge.DvPrefix))

  test("purge applies the vectors, drops them, and restores columnar + optimize") {
    val root = freshRoot("basic")
    (0 until 2).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).toDF("id")
        .withColumn("x", $"id".cast("double")).repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    dvDelete(root, "id % 10 = 3") // 20 rows under vectors, both batches
    assert(dvCount(root) > 0)
    val before = snap(root).select("id").as[Long].collect().sorted.toSeq
    assert(before.size == 180)
    // one dv- batch disqualifies the vectorized leg and OPTIMIZE
    assert(!snap(root).queryExecution.executedPlan.toString
      .contains("ColumnarToRow"))
    intercept[Exception] {
      CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    }
    val r = CommitLogOptimize.purge(spark, root)
    assert(r.purged.size == 2 && r.dropped.nonEmpty)
    assert(dvCount(root) == 0)
    // live rows are IDENTICAL — purge is layout-only
    assert(snap(root).select("id").as[Long].collect().sorted.toSeq == before)
    // vectorized service restored
    assert(snap(root).queryExecution.executedPlan.toString
      .contains("ColumnarToRow"),
      s"purged snapshot must serve columnar:\n${snap(root).queryExecution.executedPlan}")
    // OPTIMIZE unblocked
    val opt = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    assert(opt.packed.isDefined)
    assert(snap(root).select("id").as[Long].collect().sorted.toSeq == before)
    // exact row counts restated: metadata COUNT(*) still zero-read-able
    val purgeV = r.version
    assert(CommitLog.rowsOf(root, purgeV).values.sum == 180L)
    // the purge version is dataChange=false: the CDF serves an empty
    // window over it and time travel still reconciles the OLD version
    // through its vectors
    assert(!CommitLog.isDataChange(root, purgeV))
    val feed = spark.read.format("commitlog").option("path", root)
      .option("readChangeFeed", true)
      .option("startingVersion", purgeV - 1)
      .option("endingVersion", purgeV).load()
    assert(feed.count() == 0L)
    val prePurge = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", purgeV - 1).load()
    assert(prePurge.select("id").as[Long].collect().sorted.toSeq == before)
  }

  test("a live tail streams across a purge without faulting or double rows") {
    val root = freshRoot("tail")
    val ckpt = freshRoot("tail_ckpt")
    val out = freshRoot("tail_out")
    spark.range(0, 50).toDF("id").withColumn("x", $"id".cast("double"))
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    // the file sink resumes a checkpoint exactly-once (the memory sink
    // cannot recover one), so the second drain is a true RESTART of the
    // same tail, not a replay
    def drain(skipChanges: Boolean): Long = {
      val rd = spark.readStream.format("commitlog").option("path", root)
      val q = (if (skipChanges) rd.option("skipChangeCommits", true) else rd)
        .load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(drain(skipChanges = false) == 50L)
    dvDelete(root, "id = 7") // a DV commit: a change commit this tail
    // must skip (skipChangeCommits) — purge across it is the point:
    CommitLogOptimize.purge(spark, root)
    // dataChange=false: the resumed drain admits the purge version and
    // emits 0 rows (the DV version is skipped by skipChangeCommits)
    assert(drain(skipChanges = true) == 50L,
      "purge must add zero rows to a live tail")
  }

  test("purge keeps partition tuples, carried stats and blooms prunable") {
    val root = freshRoot("parts")
    val wh = freshRoot("parts_wh")
    spark.conf.set("spark.sql.catalog.prg", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.prg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS prg.db")
    spark.sql("CREATE TABLE prg.db.t (k BIGINT, name STRING, m BIGINT) " +
      "PARTITIONED BY (m)")
    spark.sql("INSERT INTO prg.db.t " +
      "SELECT id, printf('n%05d', id), id % 4 FROM range(0, 4000)")
    val tRoot = s"$wh/db/t"
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try spark.sql("DELETE FROM prg.db.t WHERE k % 29 = 1")
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    assert(dvCount(tRoot) > 0)
    val before = spark.sql("SELECT sum(k), count(*) FROM prg.db.t")
      .as[(Long, Long)].head()
    // the SQL surface: CALL <cat>.system.reorg = REORG … APPLY (PURGE)
    val call = spark.sql("CALL prg.system.reorg(tbl => 'db.t')")
      .as[(Int, Int, Int)].head()
    assert(call._2 > 0 && call._3 > 0,
      s"reorg must report purged batches and dropped vectors: $call")
    val r = CommitLogOptimize.PurgeResult(
      call._1,
      CommitLog.files(tRoot, call._1).filter(_.startsWith("prg")),
      Nil)
    assert(dvCount(tRoot) == 0)
    assert(spark.sql("SELECT sum(k), count(*) FROM prg.db.t")
      .as[(Long, Long)].head() == before)
    // partition tuples carried: a partition-pruned read plans 1 of 4
    def planned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.length
      }.sum
    val one = spark.sql("SELECT * FROM prg.db.t WHERE m = 2")
    assert(planned(one) >= 1 &&
      planned(one) < planned(spark.sql("SELECT * FROM prg.db.t")),
      "carried tuples must keep partition pruning live")
    // carried string bounds still prune a range probe to a subset
    val parts = CommitLog.partsOf(tRoot, CommitLog.latestVersion(tRoot))
    assert(r.purged.forall(parts.contains),
      "every purged batch must carry its source's tuple")
  }

  test("purge preserves row-tracking ids and is a no-op without vectors") {
    val root = freshRoot("rid")
    val wh = freshRoot("rid_wh")
    spark.conf.set("spark.sql.catalog.prgr", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.prgr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS prgr.db")
    spark.sql("CREATE TABLE prgr.db.t (k BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO prgr.db.t SELECT id FROM range(0, 100)")
    val tRoot = s"$wh/db/t"
    // no vectors: purge is a version-less no-op
    val v0 = CommitLog.latestVersion(tRoot)
    val r0 = CommitLogOptimize.purge(spark, tRoot)
    assert(r0.version == v0 && r0.purged.isEmpty)
    val idsBefore = spark.sql(
      "SELECT k, _graft_row_id FROM prgr.db.t WHERE k % 7 != 1")
      .as[(Long, Long)].collect().toMap
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try spark.sql("DELETE FROM prgr.db.t WHERE k % 7 = 1")
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    assert(dvCount(tRoot) > 0)
    CommitLogOptimize.purge(spark, tRoot)
    assert(dvCount(tRoot) == 0)
    val idsAfter = spark.sql("SELECT k, _graft_row_id FROM prgr.db.t")
      .as[(Long, Long)].collect().toMap
    assert(idsAfter == idsBefore,
      "purge must carry every surviving row's identity unchanged")
  }

  test("purge is the escape hatch past the DV planning cap") {
    val root = freshRoot("cap")
    spark.range(0, 2000).toDF("id").withColumn("x", $"id".cast("double"))
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    dvDelete(root, "id % 4 = 0") // 500/2000 = 25% < the 0.3 DV dial
    spark.conf.set(CommitLogMerge.DvCapConf, "10")
    try {
      val err = intercept[Exception] { snap(root).collect() }
      assert(err.getMessage.contains("purge"),
        s"the cap's guidance must point at purge: ${err.getMessage}")
      // purge itself never plans positions on the driver — it works
      // exactly where the read path refuses
      CommitLogOptimize.purge(spark, root)
      assert(snap(root).count() == 1500L)
    } finally spark.conf.unset(CommitLogMerge.DvCapConf)
  }
}
