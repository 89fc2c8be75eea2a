package graft

import graft.sources.{CommitLog, CommitLogMerge}
import org.apache.spark.sql.functions._

/** DELTA-BASED (merge-on-read) row-level SQL: with
  * `spark.graft.rowLevel.mode = delta`, UPDATE / MERGE INTO /
  * expression DELETE write ONLY the changed rows — deleted positions
  * as a `dv-` batch + postimages/inserts as a data batch — and the
  * touched batches SURVIVE unrewritten (the S23 write amplification
  * behind plain SQL). */
class CommitLogDeltaSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_dl").toString
  spark.conf.set("spark.sql.catalog.dl", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.dl.warehouse", wh)

  private def withDelta[T](body: => T): T = {
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try body finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
  }

  private def mk(name: String, n: Int = 100): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dl.db")
    spark.sql(s"CREATE TABLE dl.db.$name (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO dl.db.$name SELECT id, CAST(id AS DOUBLE) " +
      s"FROM range(0, $n)")
    s"$wh/db/$name"
  }

  test("delta-written DVs reconcile in path-API COW verbs (spelling-normalized)") {
    // the delta writer records scheme-stripped file paths (the row
    // leg's stamp); CommitLogDml joins `_metadata.file_path`, which
    // carries the file: scheme — the reconcile must normalize BOTH
    // sides or the COW rewrite resurrects every delta-deleted row
    val root = mk("nrm", 100)
    withDelta {
      spark.sql("UPDATE dl.db.nrm SET v = -1 WHERE k % 10 = 3") // DV leg
    }
    assert(spark.sql("SELECT count(*) FROM dl.db.nrm").head().getLong(0) == 100)
    // dense path-API delete -> COW rewrite of the touched batches
    graft.sources.CommitLogDml.delete(spark, root, "k % 2 = 0",
      changeFeed = false)
    val rows = spark.sql("SELECT k, v FROM dl.db.nrm").collect()
    assert(rows.length == 50, s"expected 50 odd survivors, got ${rows.length}")
    assert(rows.map(_.getLong(0)).distinct.length == 50,
      "preimages of the delta update must not resurrect in the rewrite")
    rows.foreach(r => assert(
      if (r.getLong(0) % 10 == 3) r.getDouble(1) == -1.0
      else r.getDouble(1) == r.getLong(0).toDouble))
  }

  test("delta UPDATE: positions + postimages land; the touched batch survives unrewritten") {
    val root = mk("u1")
    val before = CommitLog.files(root, CommitLog.latestVersion(root))
    withDelta {
      spark.sql("UPDATE dl.db.u1 SET v = v + 1000 WHERE k % 10 = 3")
    }
    val v = CommitLog.latestVersion(root)
    val after = CommitLog.files(root, v)
    assert(before.forall(after.contains),
      s"delta UPDATE must NOT rewrite the touched batch: $after")
    assert(after.exists(_.startsWith(CommitLogMerge.DvPrefix)),
      "deleted preimage positions must land as a dv- batch")
    assert(after.exists(_.startsWith("dl")), "postimages must land")
    assert(CommitLog.history(root).last.operation.contains("UPDATE"))
    val r = spark.sql("SELECT count(*) AS n, sum(v) AS s FROM dl.db.u1").head()
    assert(r.getLong(0) == 100)
    assert(r.getDouble(1) == (0 until 100).map(_.toDouble).sum + 10 * 1000.0)
  }

  test("delta expression DELETE: only positions land; rows disappear on read") {
    val root = mk("d1")
    val before = CommitLog.files(root, CommitLog.latestVersion(root))
    withDelta {
      spark.sql("DELETE FROM dl.db.d1 WHERE k % 10 = 7")
    }
    val after = CommitLog.files(root, CommitLog.latestVersion(root))
    assert(before.forall(after.contains))
    assert(after.exists(_.startsWith(CommitLogMerge.DvPrefix)))
    assert(!after.exists(_.startsWith("dl")),
      s"a pure DELETE stages no data batch: $after")
    assert(spark.sql("SELECT count(*) FROM dl.db.d1").head().getLong(0) == 90)
    assert(spark.sql("SELECT count(*) FROM dl.db.d1 WHERE k % 10 = 7")
      .head().getLong(0) == 0)
  }

  test("delta MERGE INTO: update/insert/delete in one statement, one commit") {
    val root = mk("m1")
    val v0 = CommitLog.latestVersion(root)
    withDelta {
      spark.sql("""MERGE INTO dl.db.m1 AS t USING (
        SELECT id AS k, CAST(id AS DOUBLE) AS nv FROM range(0, 110)
        WHERE id % 3 = 0) AS s ON t.k = s.k
        WHEN MATCHED AND t.k % 2 = 1 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.nv + 500
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, -1.0)""")
    }
    assert(CommitLog.latestVersion(root) == v0 + 1, "one commit")
    // relational restatement: keys %3=0 in [0,100): odd → deleted,
    // even → v+500; %3=0 in [100,110) → inserted at -1
    val expectN = 100 -
      (0 until 100).count(k => k % 3 == 0 && k % 2 == 1) +
      (100 until 110).count(_ % 3 == 0)
    val r = spark.sql("SELECT count(*) AS n, sum(v) AS s FROM dl.db.m1").head()
    assert(r.getLong(0) == expectN, s"got ${r.getLong(0)} want $expectN")
    val expectSum =
      (0 until 100).filter(k => !(k % 3 == 0 && k % 2 == 1)).map { k =>
        if (k % 3 == 0) k + 500.0 else k.toDouble
      }.sum + (100 until 110).filter(_ % 3 == 0).map(_ => -1.0).sum
    assert(math.abs(r.getDouble(1) - expectSum) < 1e-6)
  }

  test("delta UPDATE postimages violating a CHECK abort with no version") {
    val root = mk("c1")
    graft.sources.CommitLogWrite.addConstraint(spark, root, "v_pos", "v >= 0")
    val v = CommitLog.latestVersion(root)
    val e = intercept[Exception] {
      withDelta {
        spark.sql("UPDATE dl.db.c1 SET v = -5 WHERE k = 3")
      }
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(
      _.isInstanceOf[CommitLog.ConstraintViolationException]), s"got: $e")
    assert(CommitLog.latestVersion(root) == v)
    assert(spark.sql("SELECT v FROM dl.db.c1 WHERE k = 3")
      .head().getDouble(0) == 3.0)
  }

  test("delta statement matching nothing is a clean no-op") {
    val root = mk("n1")
    val v = CommitLog.latestVersion(root)
    withDelta {
      spark.sql("UPDATE dl.db.n1 SET v = 0 WHERE k % 7 = 0 AND k < 0")
    }
    assert(CommitLog.latestVersion(root) == v, "no version consumed")
  }

  test("cow mode (default) still rewrites; the two modes agree on content") {
    val root = mk("x1")
    val before = CommitLog.files(root, CommitLog.latestVersion(root))
    // default session mode = cow: the touched batch is REPLACED
    spark.sql("UPDATE dl.db.x1 SET v = v + 1 WHERE k % 10 = 0")
    val after = CommitLog.files(root, CommitLog.latestVersion(root))
    assert(!before.forall(after.contains), "cow must rewrite the batch")
    assert(!after.exists(_.startsWith(CommitLogMerge.DvPrefix)))
    val r = spark.sql("SELECT sum(v) FROM dl.db.x1").head().getDouble(0)
    assert(r == (0 until 100).map(_.toDouble).sum + 10)
  }
}
