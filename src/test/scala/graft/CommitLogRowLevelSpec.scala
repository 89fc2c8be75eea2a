package graft

import graft.sources.{CommitLog, CommitLogDml}

/** Row-level SQL over the commit log: UPDATE, expression DELETE and
  * MERGE INTO arrive through SupportsRowLevelOperations as group-based
  * copy-on-write rewrites — full SQL DML against the same log. */
class CommitLogRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_rl").toString
  spark.conf.set("spark.sql.catalog.rl", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.rl.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS rl.db")

  private var n = 0
  private def freshTable(rows: Int = 100): String = {
    n += 1
    val t = s"rl.db.t$n"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM range(0, $rows)")
    t
  }
  private def rootOf(t: String): String = s"$wh/db/${t.split('.').last}"

  test("SQL UPDATE rewrites through the row-level operation") {
    val t = freshTable()
    spark.sql(s"UPDATE $t SET v = v + 5 WHERE k % 7 = 0")
    val got = spark.sql(s"SELECT k, v FROM $t").as[(Long, Long)]
      .collect().toMap
    assert(got.size == 100)
    (0 until 100).foreach { k =>
      val want = k * 10L + (if (k % 7 == 0) 5 else 0)
      assert(got(k.toLong) == want, s"k=$k")
    }
    val root = rootOf(t)
    assert(CommitLog.history(root).last.operation.contains("UPDATE"))
    // the rewrite is one fresh batch replacing the old snapshot
    assert(CommitLog.files(root, CommitLog.latestVersion(root)).size == 1)
  }

  test("SQL MERGE INTO: update, delete and insert branches in one verb") {
    val t = freshTable(50)
    spark.range(0, 60).selectExpr("id AS k", "id * 100 AS nv")
      .createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING merge_src AS src ON tgt.k = src.k
         |WHEN MATCHED AND src.k % 10 = 3 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.nv
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (src.k, src.nv)
         |""".stripMargin)
    val got = spark.sql(s"SELECT k, v FROM $t").as[(Long, Long)]
      .collect().toMap
    // 0..49 matched: %10==3 deleted (3,13,23,33,43), rest updated to
    // k*100; 50..59 inserted at k*100
    assert(got.size == 55, s"got ${got.size}")
    assert(!got.contains(13L) && got(7L) == 700L && got(55L) == 5500L)
    assert(CommitLog.history(rootOf(t)).last.operation.contains("MERGE"))
  }

  test("a row-level rewrite compacts outstanding deletion vectors") {
    val t = freshTable()
    val root = rootOf(t)
    val d = CommitLogDml.delete(spark, root, "k = 7") // DV leg
    assert(d.leg == "dv")
    spark.sql(s"UPDATE $t SET v = 0 WHERE k = 50")
    val files = CommitLog.files(root, CommitLog.latestVersion(root))
    assert(!files.exists(_.startsWith("dv-")),
      "the full rewrite must absorb the DV batch")
    val got = spark.sql(s"SELECT k, v FROM $t").as[(Long, Long)]
      .collect().toMap
    assert(got.size == 99 && !got.contains(7L) && got(50L) == 0L)
  }

  test("CHECKs in force gate SQL UPDATE; violations publish nothing") {
    val t = freshTable(10)
    val root = rootOf(t)
    graft.sources.CommitLogWrite.addConstraint(spark, root, "v_min", "v >= 0")
    val v0 = CommitLog.latestVersion(root)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $t SET v = -1 WHERE k < 3")
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.isInstanceOf[CommitLog.ConstraintViolationException]), e)
    assert(CommitLog.latestVersion(root) == v0, "nothing may publish")
    assert(spark.sql(s"SELECT sum(v) FROM $t").head().getLong(0) ==
      (0 until 10).map(_ * 10L).sum)
  }

  test("the runtime group filter narrows the rewrite to touched batches") {
    n += 1
    val t = s"rl.db.t$n"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT)")
    // three separate batches with disjoint key ranges
    (0 until 3).foreach { b =>
      spark.sql(s"INSERT INTO $t SELECT id, id * 10 FROM " +
        s"range(${b * 100}, ${b * 100 + 100})")
    }
    val root = rootOf(t)
    val before = CommitLog.files(root, CommitLog.latestVersion(root))
    assert(before.size == 3)
    // the statement matches rows of the MIDDLE batch only
    spark.sql(s"UPDATE $t SET v = 0 WHERE k >= 150 AND k < 160")
    val after = CommitLog.files(root, CommitLog.latestVersion(root))
    val kept = before.filter(after.contains)
    assert(kept.size == 2,
      s"untouched batches must survive the rewrite: before=$before after=$after")
    val got = spark.sql(s"SELECT k, v FROM $t").as[(Long, Long)]
      .collect().toMap
    assert(got.size == 300 && got(155L) == 0L && got(149L) == 1490L &&
      got(42L) == 420L && got(250L) == 2500L)
    // a statement matching NOTHING publishes no version
    val v0 = CommitLog.latestVersion(root)
    spark.sql(s"UPDATE $t SET v = 1 WHERE k >= 5000")
    assert(CommitLog.latestVersion(root) == v0,
      "a zero-group statement must be a no-op")
  }

  test("an all-deleting expression DELETE leaves an empty, dense table") {
    val t = freshTable(10)
    spark.sql(s"DELETE FROM $t WHERE k % 1 = 0") // untranslatable, matches all
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 0)
    // history stayed append-only: the pre-delete version time travels
    val root = rootOf(t)
    val prev = CommitLog.latestVersion(root) - 1
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF $prev")
      .head().getLong(0) == 10)
  }
}
