package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge}
import org.apache.spark.sql.functions._

/** OVERWRITE over the commit log — `mode("overwrite")`, SQL
  * `INSERT OVERWRITE`, and `writeTo(...).overwrite(cond)`
  * (replaceWhere) — each as ONE atomic manifest: readers see the old
  * region or the new region, never neither, and a re-run converges
  * (the idempotent-backfill contract). */
class CommitLogOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_ow").toString
  spark.conf.set("spark.sql.catalog.ow", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.ow.warehouse", wh)

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clow_$tag").toString

  private def readIds(root: String): Seq[Long] =
    spark.read.format("commitlog").option("path", root).load()
      .select("id").as[Long].collect().sorted.toSeq

  test("mode(overwrite): full replace in ONE version; time travel keeps the old rows") {
    val root = freshRoot("full")
    Seq(1L, 2L, 3L).toDF("id")
      .write.format("commitlog").option("path", root).mode("append").save()
    val vBefore = CommitLog.latestVersion(root)
    Seq(100L, 200L).toDF("id")
      .write.format("commitlog").option("path", root).mode("overwrite").save()
    // exactly one version: remove-all + add in the same manifest
    assert(CommitLog.latestVersion(root) == vBefore + 1)
    assert(readIds(root) == Seq(100L, 200L))
    val old = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", vBefore).load()
      .select("id").as[Long].collect().sorted.toSeq
    assert(old == Seq(1L, 2L, 3L))
    assert(CommitLog.history(root).last.operation.contains("OVERWRITE"))
    // the new batch is born prunable: stats rode the overwrite commit
    val stats = CommitLog.statsOf(root, CommitLog.latestVersion(root))
    assert(stats.values.flatMap(_.get("id").flatMap(_.box)).toSeq ==
      Seq((100.0, 200.0)))
  }

  test("SQL INSERT OVERWRITE replaces the table content atomically") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ow.db")
    spark.sql("CREATE TABLE ow.db.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO ow.db.t SELECT id, id * 10 FROM range(0, 20)")
    spark.sql("INSERT OVERWRITE ow.db.t SELECT id, id * 100 FROM range(0, 5)")
    val r = spark.sql("SELECT count(*) AS n, sum(v) AS s FROM ow.db.t").head()
    assert(r.getLong(0) == 5 && r.getLong(1) == (0 until 5).map(_ * 100L).sum)
    // CREATE(1) + INSERT(2) + OVERWRITE(3): the replace is one commit
    assert(CommitLog.latestVersion(s"$wh/db/t") == 3)
  }

  test("full overwrite drops outstanding deletion vectors with the data they guard") {
    val root = freshRoot("dv")
    spark.range(0, 100).select($"id", ($"id" % 10).as("m"))
      .write.format("commitlog").option("path", root).mode("append").save()
    // sparse delete → DV batch outstanding
    val st = CommitLogDml.delete(spark, root, "id = 7", dvFraction = 0.5)
    assert(st.leg == "dv")
    assert(CommitLog.files(root, CommitLog.latestVersion(root))
      .exists(_.startsWith(CommitLogMerge.DvPrefix)))
    spark.range(1000, 1003).toDF("id").withColumn("m", lit(0L))
      .write.format("commitlog").option("path", root).mode("overwrite").save()
    val live = CommitLog.files(root, CommitLog.latestVersion(root))
    assert(!live.exists(_.startsWith(CommitLogMerge.DvPrefix)),
      s"overwrite must not leave orphan DVs: $live")
    assert(readIds(root) == Seq(1000L, 1001L, 1002L))
  }

  test("replaceWhere: touched batches rewrite without matching rows; untouched batches survive as-is") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ow.db")
    spark.sql("CREATE TABLE ow.db.rw (id BIGINT, m BIGINT)")
    val root = s"$wh/db/rw"
    // two region batches: m=0 and m=1
    spark.sql("INSERT INTO ow.db.rw SELECT id, 0 FROM range(0, 10)")
    spark.sql("INSERT INTO ow.db.rw SELECT id, 1 FROM range(100, 110)")
    val before = CommitLog.files(root, CommitLog.latestVersion(root))
    val untouched = before.tail // appended second

    // reload region m=0 with fresh rows, one atomic commit
    spark.range(50, 53).select($"id", lit(0L).as("m"))
      .writeTo("ow.db.rw").overwrite(col("m") === 0L)

    val v = CommitLog.latestVersion(root)
    val after = CommitLog.files(root, v)
    // the m=1 batch survives untouched (same manifest name)
    assert(untouched.forall(after.contains),
      s"untouched batch must survive: before=$before after=$after")
    assert(!after.contains(before.head), "touched batch must be replaced")
    val rows = spark.sql("SELECT id FROM ow.db.rw")
      .as[Long].collect().sorted.toSeq
    assert(rows == Seq(50L, 51L, 52L) ++ (100L until 110L))
    assert(CommitLog.history(root).last.operation.exists(_.contains("OVERWRITE")))
  }

  test("replaceWhere containment: rows outside the replaced region are refused, no version consumed") {
    val root = freshRoot("contain")
    spark.range(0, 10).select($"id", ($"id" % 2).as("m"))
      .write.format("commitlog").option("path", root).mode("append").save()
    val v = CommitLog.latestVersion(root)
    val e = intercept[Exception] {
      // claims to reload m=0 but smuggles an m=1 row (path-based
      // spelling: option("replaceWhere") narrows mode("overwrite"))
      Seq((1L, 0L), (2L, 1L)).toDF("id", "m")
        .write.format("commitlog").option("path", root)
        .option("replaceWhere", "m = 0").mode("overwrite").save()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("outside the replaced region"))), s"got: $e")
    assert(CommitLog.latestVersion(root) == v, "failed overwrite must not commit")
    assert(readIds(root) == (0L until 10L), "table content must be untouched")
  }

  test("overwrite validates CHECK constraints in force before publishing") {
    val root = freshRoot("check")
    spark.range(0, 5).select($"id", ($"id" + 100).as("price"))
      .write.format("commitlog").option("path", root).mode("append").save()
    graft.sources.CommitLogWrite.addConstraint(
      spark, root, "price_pos", "price > 0")
    val v = CommitLog.latestVersion(root)
    val e = intercept[Exception] {
      Seq((1L, -5L)).toDF("id", "price")
        .write.format("commitlog").option("path", root).mode("overwrite").save()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(
      _.isInstanceOf[CommitLog.ConstraintViolationException]), s"got: $e")
    assert(CommitLog.latestVersion(root) == v)
    assert(readIds(root) == (0L until 5L))
  }

  test("replaceWhere matching nothing appends the new region (still one commit)") {
    val root = freshRoot("nomatch")
    spark.range(0, 5).select($"id", lit(0L).as("m"))
      .write.format("commitlog").option("path", root).mode("append").save()
    val before = CommitLog.files(root, CommitLog.latestVersion(root))
    spark.range(900, 902).select($"id", lit(7L).as("m"))
      .write.format("commitlog").option("path", root)
      .option("replaceWhere", "m = 7").mode("overwrite").save()
    val after = CommitLog.files(root, CommitLog.latestVersion(root))
    assert(before.forall(after.contains), "no batch matched: none replaced")
    assert(readIds(root) == Seq(0L, 1L, 2L, 3L, 4L, 900L, 901L))
  }
}
