package graft

import org.apache.spark.sql.functions._

/** The `.changes` METADATA TABLE: `SELECT * FROM <cat>.<ns>.<t>.changes`
  * serves the row-granularity change feed (`_change_type` /
  * `_commit_version`) as a distributed scan — the SQL spelling of the
  * DataFrame `readChangeFeed` option. `VERSION AS OF v` sets the
  * STARTING version (changes since v); a real table named `changes`
  * still shadows the metadata table; the view is read-only. */
class ChangesTableSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_cht").toString
  spark.conf.set("spark.sql.catalog.cht", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.cht.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS cht.db")

  private def mk(name: String): Unit = {
    spark.sql(s"CREATE TABLE cht.db.$name (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO cht.db.$name SELECT id, id * 10 FROM range(0, 100)")
    spark.sql(s"DELETE FROM cht.db.$name WHERE id % 10 = 3") // v3
    spark.sql(s"INSERT INTO cht.db.$name VALUES (1000, 1)")  // v4
  }

  test("full feed: inserts and deletes with commit versions, via SQL only") {
    mk("t1")
    val ch = spark.sql(
      "SELECT _change_type, _commit_version, count(*) AS n " +
        "FROM cht.db.t1.changes GROUP BY 1, 2 ORDER BY 2, 1")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(ch.contains(("insert", 2, 100L)), s"got ${ch.toSeq}")
    assert(ch.contains(("delete", 3, 10L)), s"got ${ch.toSeq}")
    assert(ch.contains(("insert", 4, 1L)), s"got ${ch.toSeq}")
  }

  test("VERSION AS OF sets the starting version: changes since v") {
    mk("t2")
    val since = spark.sql(
      "SELECT _change_type, count(*) AS n FROM cht.db.t2.changes " +
        "VERSION AS OF 3 GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(since.toSeq == Seq(("delete", 10L), ("insert", 1L)),
      s"got ${since.toSeq}")
  }

  test("the metadata table is read-only; a real `changes` table shadows it") {
    mk("t3")
    val e = intercept[Exception] {
      spark.sql("DELETE FROM cht.db.t3.changes WHERE _commit_version = 3")
    }
    assert(e.getMessage.contains("read-only") ||
      Option(e.getCause).exists(_.getMessage.contains("read-only")))
    // a genuine table named `changes` under a table-shaped namespace
    // is served as itself, not as the metadata view
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cht.db2")
    spark.sql("CREATE TABLE cht.db2.changes (x BIGINT)")
    spark.sql("INSERT INTO cht.db2.changes VALUES (7)")
    assert(spark.sql("SELECT x FROM cht.db2.changes").head().getLong(0) == 7)
  }

  test("the feed scan is distributed (a real BatchScan, no driver collect)") {
    mk("t4")
    val df = spark.sql("SELECT * FROM cht.db.t4.changes")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected the CDF to plan as a BatchScan")
    assert(df.count() == 111) // 100 inserts + 10 deletes + 1 insert
  }
}
