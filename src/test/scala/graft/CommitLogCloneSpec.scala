package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge, CommitLogOptimize, CommitLogWrite}
import org.apache.spark.sql.functions._

/** Shallow clone: a metadata-sized commit referencing the source's
  * files. Pins zero-copy creation, two-way independence, carried
  * stats/constraints, DV-source refusal, vacuum never touching source
  * data, incremental localization via COW verbs, and cloning an older
  * version (the s34 decl hash-checks the relational composition). */
class CommitLogCloneSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("clone").toString

  private def parquetFilesUnder(root: String): Seq[String] = {
    val base = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.isDirectory(base)) return Nil
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(base).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
  }

  private def baseTable(root: String): Unit = {
    (1 to 50).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$root/b1")
    (51 to 100).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$root/b2")
    CommitLog.commit(root, 0, added = Seq("b1"))
    CommitLog.commit(root, 1, added = Seq("b2"))
  }

  test("clone is metadata-only and reads the source snapshot") {
    val (src, tgt) = (freshRoot(), freshRoot())
    baseTable(src)
    val c = CommitLog.cloneTable(src, tgt)
    assert(c.version == 1)
    assert(parquetFilesUnder(tgt).isEmpty, "a shallow clone copies no data")
    val rows = spark.read.format("commitlog").option("path", tgt).load()
      .as[(Long, Long)].collect().toMap
    assert(rows.size == 100 && rows(7L) == 70L)
    assert(CommitLog.history(tgt).last.operation.contains("CLONE"))
  }

  test("clone and source are independent in both directions") {
    val (src, tgt) = (freshRoot(), freshRoot())
    baseTable(src)
    CommitLog.cloneTable(src, tgt)
    // source gains rows — clone must not see them
    (101 to 110).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$src/b3")
    CommitLog.commit(src, 2, added = Seq("b3"))
    // clone loses rows — source must not change
    val d = CommitLogDml.delete(spark, tgt, "k <= 90")
    assert(d.leg == "cow", d)
    val srcN = spark.read.format("commitlog").option("path", src).load().count()
    val tgtN = spark.read.format("commitlog").option("path", tgt).load().count()
    assert(srcN == 110 && tgtN == 10, s"src=$srcN tgt=$tgtN")
    // the COW rewrite LOCALIZED the clone: no external refs remain,
    // and every source file still exists
    assert(!CommitLog.files(tgt, CommitLog.latestVersion(tgt))
      .exists(_.startsWith("@")))
    assert(parquetFilesUnder(s"$src/b1").nonEmpty &&
      parquetFilesUnder(s"$src/b2").nonEmpty)
  }

  test("stats and constraints carry; clone-side vacuum spares source") {
    val (src, tgt) = (freshRoot(), freshRoot())
    (1 to 50).map(i => (i.toLong, i * 10L)).toDF("k", "v")
      .repartition(1).write.parquet(s"$src/b1")
    CommitLog.commit(src, 0, added = Seq("b1"),
      stats = Map("b1" -> Map("k" -> CommitLog.ColStat(1.0, 50.0))))
    CommitLogWrite.addConstraint(spark, src, "v_pos", "v > 0")
    CommitLog.cloneTable(src, tgt)
    val snap = CommitLog.snapshotAt(tgt, 1)
    assert(snap.stats.values.toSeq ==
      Seq(Map("k" -> CommitLog.ColStat(1.0, 50.0))), snap.stats)
    assert(CommitLog.constraintsOf(tgt, 1) == Map("v_pos" -> "v > 0"))
    // stats prune from the clone's own manifest
    val pruned = CommitLog.prunedFiles(tgt, 1, "k", 200.0, 300.0)
    assert(pruned.isEmpty, s"box excludes everything, got $pruned")
    // localize (COW) then vacuum the clone: the dropped external ref
    // must never be deleted — it is the source's data
    CommitLogDml.update(spark, tgt, "k <= 50", Seq("v" -> "v + 1"))
    val vs = CommitLog.vacuum(tgt, keepLast = 1, minAgeMs = 0L)
    assert(!vs.sweptBatches.exists(_.contains(src)), vs)
    assert(parquetFilesUnder(s"$src/b1").nonEmpty,
      "clone vacuum must never sweep source data")
  }

  test("cloning refuses DV sources and non-empty targets; pins version") {
    val (src, tgt) = (freshRoot(), freshRoot())
    baseTable(src)
    // v3: sparse delete → outstanding DV
    val d = CommitLogDml.delete(spark, src, "k = 3")
    assert(d.leg == "dv")
    intercept[IllegalArgumentException] {
      CommitLog.cloneTable(src, tgt)
    }
    // cloning the PRE-DV version works: time-travel clone
    val c = CommitLog.cloneTable(src, tgt, version = 2)
    assert(c.version == 1)
    val rows = spark.read.format("commitlog").option("path", tgt).load()
      .as[(Long, Long)].collect().toMap
    assert(rows.size == 100 && rows.contains(3L), "v2 predates the delete")
    intercept[IllegalArgumentException] {
      CommitLog.cloneTable(src, tgt, version = 2) // target not empty now
    }
  }

  test("merge on a clone touches only clone metadata; clone of clone") {
    val (src, t1, t2) = (freshRoot(), freshRoot(), freshRoot())
    baseTable(src)
    CommitLog.cloneTable(src, t1)
    // a DV merge on the clone: positions reference the SOURCE's files
    // (external dirs) but land as clone-local dv batches
    val st = CommitLogMerge.merge(spark, t1,
      Seq((7L, 700L, "U"), (200L, 2000L, "U")).toDF("k", "v", "_op"),
      keyCols = Seq("k"))
    assert(st.leg == "dv", st)
    val snap = CommitLogMerge.snapshot(spark, t1).as[(Long, Long)]
      .collect().toMap
    assert(snap(7L) == 700L && snap(200L) == 2000L && snap.size == 101)
    assert(spark.read.format("commitlog").option("path", src).load()
      .count() == 100, "source untouched by clone merge")
    // clone-of-clone: compact t1 first (DV outstanding), then re-clone;
    // kept refs must resolve (not chain through t1's root)
    val cw = CommitLogMerge.merge(spark, t1,
      (1 to 60).map(i => (i.toLong, 0L, "D")).toDF("k", "v", "_op"),
      keyCols = Seq("k"))
    assert(cw.leg == "cow")
    CommitLog.cloneTable(t1, t2)
    val n2 = spark.read.format("commitlog").option("path", t2).load().count()
    assert(n2 == 41, s"60 deleted of 101, got $n2") // 61..100 + insert 200
  }

  test("streaming tail of a clone drains its external initial snapshot") {
    val (src, tgt) = (freshRoot(), freshRoot())
    baseTable(src)
    CommitLog.cloneTable(src, tgt)
    val ckpt = java.nio.file.Files.createTempDirectory("clone_ck").toString
    val sink = s"clone_tail_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("commitlog").option("path", tgt).load()
      .groupBy().agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("complete").start()
    q.awaitTermination()
    val r = spark.table(sink).head()
    assert(r.getLong(0) == 100 && r.getLong(1) == (1 to 100).map(_ * 10L).sum)
  }
}
