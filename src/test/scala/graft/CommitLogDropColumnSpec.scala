package graft

import graft.sources.{CommitLog, CommitLogOptimize, CommitLogWrite}
import org.apache.spark.sql.functions._

/** DROP COLUMN under column mapping: metadata-only narrow, the name
  * chain reserved forever (re-declaring would resurrect zombie data
  * from old files), time travel keeps the era's schema, and OPTIMIZE
  * physically purges the dead bytes as a side effect. */
class CommitLogDropColumnSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("dropcol").toString

  private def baseTable(root: String): Unit =
    (1 to 50).map(i => (i.toLong, i * 10L, s"s$i")).toDF("k", "v", "tag")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()

  private def parquetFiles(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
  }

  test("drop is metadata-only; readers narrow; old eras time travel") {
    val root = freshRoot()
    baseTable(root)
    val before = parquetFiles(root)
    val c = CommitLog.dropColumn(root, "tag")
    assert(c.version == 2)
    assert(parquetFiles(root) == before, "drop must rewrite nothing")
    assert(CommitLog.history(root).last.operation.contains("DROP COLUMN"))
    assert(CommitLog.droppedOf(root, 2) == Seq("tag"))
    val latest = spark.read.format("commitlog").option("path", root).load()
    assert(latest.columns.toSeq == Seq("k", "v"))
    assert(latest.count() == 50)
    // post-drop append under the narrowed schema
    (51 to 60).map(i => (i.toLong, i * 10L)).toDF("k", "v").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    assert(spark.read.format("commitlog").option("path", root).load()
      .count() == 60)
    // time travel still sees the column and its data
    val atV1 = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 1).load()
    assert(atV1.columns.toSeq == Seq("k", "v", "tag"))
    assert(atV1.filter($"tag" === "s7").count() == 1)
  }

  test("a dropped name is reserved forever, through its rename chain") {
    val root = freshRoot()
    baseTable(root)
    CommitLog.renameColumn(root, "tag", "label") // v2
    CommitLog.dropColumn(root, "label") // v3: reserves label AND tag
    assert(CommitLog.droppedOf(root, 3).toSet == Set("label", "tag"))
    // an append re-declaring either name is rejected (the sink may
    // wrap the gate's exception — walk the cause chain)
    def rejectsZombie(colName: String): Unit = {
      val e = intercept[Exception] {
        (61 to 62).map(i => (i.toLong, i * 10L, "x")).toDF("k", "v", colName)
          .repartition(1).write.format("commitlog").option("path", root)
          .mode("append").save()
      }
      assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[CommitLog.SchemaChangeException]), e)
    }
    rejectsZombie("tag")
    rejectsZombie("label")
    // renaming a live column ONTO a reserved name is rejected too
    intercept[IllegalArgumentException] {
      CommitLog.renameColumn(root, "v", "tag")
    }
    // a genuinely fresh name still evolves fine
    (61 to 62).map(i => (i.toLong, i * 10L, "x")).toDF("k", "v", "note")
      .repartition(1).write.format("commitlog").option("path", root)
      .mode("append").save()
    assert(spark.read.format("commitlog").option("path", root).load()
      .columns.toSeq == Seq("k", "v", "note"))
  }

  test("guards: CHECK reference, last column, unknown column") {
    val root = freshRoot()
    baseTable(root)
    CommitLogWrite.addConstraint(spark, root, "v_pos", "v > 0")
    intercept[IllegalArgumentException] {
      CommitLog.dropColumn(root, "v") // CHECK references it
    }
    intercept[IllegalArgumentException] {
      CommitLog.dropColumn(root, "nope")
    }
    CommitLog.dropColumn(root, "tag")
    CommitLog.dropColumn(root, "k")
    intercept[IllegalArgumentException] {
      CommitLog.dropColumn(root, "v") // also: last column
    }
  }

  test("optimize purges the dropped bytes; registry rides checkpoints") {
    val root = freshRoot()
    baseTable(root) // v1
    (51 to 60).map(i => (i.toLong, i * 10L, s"s$i")).toDF("k", "v", "tag")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save() // v2
    CommitLog.dropColumn(root, "tag") // v3
    val r = CommitLogOptimize.optimize(spark, root,
      smallBytes = 1L << 30, targetPartitions = 1) // v4
    assert(r.packed.nonEmpty)
    // the rewritten footer no longer carries the dropped column
    val packedFiles = graft.sources.CommitLogSource.listParquet(
      root, r.packed.get)
    assert(spark.read.parquet(packedFiles: _*).columns.toSeq == Seq("k", "v"),
      "optimize must purge dropped bytes")
    // push past the checkpoint interval, vacuum, and replay the registry
    (1 to 6).foreach { i =>
      Seq((100L + i, i.toLong)).toDF("k", "v").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    assert(CommitLog.droppedOf(root, CommitLog.latestVersion(root)) ==
      Seq("tag"), "dropped registry must replay from the checkpoint")
  }

  test("a clone of a renamed-and-dropped table carries both registries") {
    val (src, tgt) = (freshRoot(), freshRoot())
    baseTable(src)
    CommitLog.renameColumn(src, "v", "amount")
    CommitLog.dropColumn(src, "tag")
    CommitLog.cloneTable(src, tgt)
    assert(CommitLog.formerNamesOf(tgt, 1) == Map("amount" -> Seq("v")))
    assert(CommitLog.droppedOf(tgt, 1) == Seq("tag"))
    val rows = spark.read.format("commitlog").option("path", tgt).load()
    assert(rows.columns.toSeq == Seq("k", "amount"))
    assert(rows.as[(Long, Long)].collect().toMap.apply(7L) == 70L,
      "clone must resolve the source's renamed columns in referenced files")
    val e = intercept[Exception] {
      Seq((200L, 1L, "x")).toDF("k", "amount", "tag").repartition(1)
        .write.format("commitlog").option("path", tgt).mode("append").save()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.isInstanceOf[CommitLog.SchemaChangeException]), e)
  }
}
