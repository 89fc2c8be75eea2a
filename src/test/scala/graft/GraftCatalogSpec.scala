package graft

import graft.sources.CommitLog

/** The SQL surface: a DSv2 TableCatalog over a warehouse of commitlog
  * tables. Every test drives real `spark.sql` statements — CREATE /
  * INSERT / SELECT / time travel / ALTER (rename, add, drop column) /
  * RENAME TO / DROP TABLE — against the same log the path-addressed
  * API uses. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
  spark.conf.set("spark.sql.catalog.gt", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gt.warehouse", wh)

  test("CREATE TABLE / INSERT INTO / SELECT round-trip, SHOW TABLES") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db1")
    spark.sql("CREATE TABLE gt.db1.t1 (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gt.db1.t1 SELECT id AS k, id * 10 AS v FROM range(1, 51)")
    val n = spark.sql("SELECT count(*) AS n, sum(v) AS s FROM gt.db1.t1").head()
    assert(n.getLong(0) == 50 && n.getLong(1) == (1 to 50).map(_ * 10L).sum)
    val tables = spark.sql("SHOW TABLES IN gt.db1")
      .select("tableName").as[String].collect().toSet
    assert(tables.contains("t1"))
    // the table IS a commit log: version 1 = CREATE, 2 = the INSERT
    val root = s"$wh/db1/t1"
    assert(CommitLog.latestVersion(root) == 2)
    assert(CommitLog.history(root).head.operation.contains("CREATE TABLE"))
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db2")
    spark.sql("CREATE TABLE gt.db2.tt (k BIGINT)")
    spark.sql("INSERT INTO gt.db2.tt SELECT id FROM range(0, 10)") // v2
    spark.sql("INSERT INTO gt.db2.tt SELECT id FROM range(10, 30)") // v3
    assert(spark.sql("SELECT count(*) FROM gt.db2.tt").head().getLong(0) == 30)
    assert(spark.sql("SELECT count(*) FROM gt.db2.tt VERSION AS OF 2")
      .head().getLong(0) == 10)
    val t2 = CommitLog.history(s"$wh/db2/tt")
      .find(_.version == 2).get.timestampMs
    val ts = new java.sql.Timestamp(t2).toString
    assert(spark.sql(s"SELECT count(*) FROM gt.db2.tt TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 10)
  }

  test("ALTER TABLE: rename / add / drop column as SQL, era-mixed reads") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db3")
    spark.sql("CREATE TABLE gt.db3.a (k BIGINT, v BIGINT, tag STRING)")
    spark.sql(
      "INSERT INTO gt.db3.a SELECT id, id * 10, concat('s', id) FROM range(1, 11)")
    spark.sql("ALTER TABLE gt.db3.a RENAME COLUMN v TO amount")
    spark.sql(
      "INSERT INTO gt.db3.a SELECT id, id * 10, concat('s', id) FROM range(11, 21)")
    // one logical column over both eras
    val s = spark.sql("SELECT sum(amount) FROM gt.db3.a").head().getLong(0)
    assert(s == (1 to 20).map(_ * 10L).sum)
    spark.sql("ALTER TABLE gt.db3.a ADD COLUMN note STRING")
    assert(spark.sql("SELECT * FROM gt.db3.a").columns.toSeq ==
      Seq("k", "amount", "tag", "note"))
    spark.sql("ALTER TABLE gt.db3.a DROP COLUMN tag")
    assert(spark.sql("SELECT * FROM gt.db3.a").columns.toSeq ==
      Seq("k", "amount", "note"))
    // the log audited every verb
    val ops = CommitLog.history(s"$wh/db3/a").flatMap(_.operation)
    assert(ops.count(_ == "RENAME COLUMN") == 1 &&
      ops.count(_ == "DROP COLUMN") == 1 && ops.count(_ == "ADD COLUMN") == 1)
    // time travel across the DDL history keeps era schemas
    assert(spark.sql("SELECT * FROM gt.db3.a VERSION AS OF 2").columns.toSeq ==
      Seq("k", "v", "tag"))
  }

  test("RENAME TO moves the table; DROP TABLE removes it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db4")
    spark.sql("CREATE TABLE gt.db4.old (k BIGINT)")
    spark.sql("INSERT INTO gt.db4.old SELECT id FROM range(0, 5)")
    spark.sql("ALTER TABLE gt.db4.old RENAME TO db4.fresh")
    assert(spark.sql("SELECT count(*) FROM gt.db4.fresh").head().getLong(0) == 5)
    intercept[Exception] { spark.sql("SELECT * FROM gt.db4.old").collect() }
    spark.sql("DROP TABLE gt.db4.fresh")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$wh/db4/fresh")))
  }

  test("catalog reads prune from manifest stats like path reads") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db5")
    spark.sql("CREATE TABLE gt.db5.p (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gt.db5.p SELECT id, id FROM range(0, 100)")
    spark.sql("INSERT INTO gt.db5.p SELECT id, id FROM range(1000, 1100)")
    val root = s"$wh/db5/p"
    val v = CommitLog.latestVersion(root)
    val fileCount = CommitLog.files(root, v).map(b =>
      graft.sources.CommitLogSource.listParquet(root, b).size).toSeq
    val total = fileCount.sum
    // only the second batch's box ([1000,1099]) admits v > 500: the
    // scan must plan exactly that batch's files
    val keep = graft.sources.CommitLogSource.listParquet(
      root, CommitLog.files(root, v).maxBy(b =>
        CommitLog.statsOf(root, v)(b)("v").lo)).size
    val planned = spark.sql("SELECT * FROM gt.db5.p WHERE v > 500")
    assert(planned.rdd.getNumPartitions == keep && keep < total,
      s"manifest-stat pruning must reach catalog scans: planned " +
        s"${planned.rdd.getNumPartitions}, batches=$fileCount")
    assert(planned.count() == 100)
  }

  test("SQL DELETE runs the leg-dialed verb; SELECT reconciles the DVs") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db6")
    spark.sql("CREATE TABLE gt.db6.d (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO gt.db6.d SELECT id, id * 10 FROM range(0, 100)")
    val root = s"$wh/db6/d"
    // a sparse SQL delete lands the DV leg...
    spark.sql("DELETE FROM gt.db6.d WHERE k IN (3, 97)")
    assert(CommitLog.files(root, CommitLog.latestVersion(root))
      .exists(_.startsWith("dv-")), "sparse delete should take the DV leg")
    assert(CommitLog.history(root).last.operation.contains("DELETE"))
    // ...and plain SQL reads reconcile it in the record reader
    val left = spark.sql("SELECT k FROM gt.db6.d").as[Long].collect().toSet
    assert(left.size == 98 && !left.contains(3L) && !left.contains(97L))
    assert(spark.sql("SELECT sum(v) FROM gt.db6.d").head().getLong(0) ==
      (0 until 100).filterNot(Set(3, 97)).map(_ * 10L).sum)
    // a dense delete COW-rewrites and compacts the DV away: remaining
    // rows are 90..99 minus the already-deleted 97 — nine rows
    spark.sql("DELETE FROM gt.db6.d WHERE k < 90")
    assert(!CommitLog.files(root, CommitLog.latestVersion(root))
      .exists(_.startsWith("dv-")))
    assert(spark.sql("SELECT count(*) FROM gt.db6.d").head().getLong(0) == 9)
    // an untranslatable predicate falls through to the row-level
    // rewrite (CommitLogRowLevelSpec) instead of failing: of 90..99
    // minus 97, k % 7 = 0 hits 91 and 98
    spark.sql("DELETE FROM gt.db6.d WHERE k % 7 = 0")
    assert(spark.sql("SELECT count(*) FROM gt.db6.d").head().getLong(0) == 7)
  }

  test("TRUNCATE TABLE drops all rows as one metadata commit") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db7")
    spark.sql("CREATE TABLE gt.db7.t (k BIGINT)")
    spark.sql("INSERT INTO gt.db7.t SELECT id FROM range(0, 50)")
    spark.sql("TRUNCATE TABLE gt.db7.t")
    assert(spark.sql("SELECT count(*) FROM gt.db7.t").head().getLong(0) == 0)
    val root = s"$wh/db7/t"
    assert(CommitLog.history(root).last.operation.contains("TRUNCATE"))
    // the truncated-away version still time travels until vacuum
    assert(spark.sql(
      s"SELECT count(*) FROM gt.db7.t VERSION AS OF 2").head().getLong(0) == 50)
  }

  test("RENAME TO refuses a table with outstanding deletion vectors") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db8")
    spark.sql("CREATE TABLE gt.db8.r (k BIGINT)")
    spark.sql("INSERT INTO gt.db8.r SELECT id FROM range(0, 100)")
    spark.sql("DELETE FROM gt.db8.r WHERE k IN (7)") // DV leg
    val root = s"$wh/db8/r"
    assert(CommitLog.files(root, CommitLog.latestVersion(root))
      .exists(_.startsWith("dv-")))
    // the DV records the table's ABSOLUTE path — moving the directory
    // would orphan it and resurrect row 7
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gt.db8.r RENAME TO db8.moved")
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage != null) &&
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .exists(t => Option(t.getMessage).exists(_.contains("deletion vectors"))), e)
    // the SQL DV delete materialized its change rows: a streaming
    // change-feed consumer survives the version
    val dvVersion = CommitLog.history(root)
      .find(_.operation.contains("DELETE")).get.version
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
      root, "_changes", s"v$dvVersion")),
      "SQL DELETE must materialize CDC rows")
    // a COW rewrite clears the DVs and the rename then lands
    spark.sql("UPDATE gt.db8.r SET k = k WHERE k < 1000")
    spark.sql("ALTER TABLE gt.db8.r RENAME TO db8.moved")
    assert(spark.sql("SELECT count(*) FROM gt.db8.moved")
      .head().getLong(0) == 99)
  }

  test("identifier hygiene: traversal-shaped names are rejected") {
    intercept[Exception] {
      spark.sql("CREATE TABLE gt.db1.`..` (k BIGINT)")
    }
  }

  test("CTAS: CREATE TABLE AS SELECT declares schema and loads in one statement") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db9")
    spark.sql(
      "CREATE TABLE gt.db9.c AS SELECT id AS k, id * 3 AS v FROM range(0, 40)")
    val r = spark.sql("SELECT count(*) AS n, sum(v) AS s FROM gt.db9.c").head()
    assert(r.getLong(0) == 40 && r.getLong(1) == (0 until 40).map(_ * 3L).sum)
    val root = s"$wh/db9/c"
    // CREATE(1) + the insert(2): the statement is create + one append
    assert(CommitLog.latestVersion(root) == 2)
    val declared = org.apache.spark.sql.types.StructType.fromDDL(
      CommitLog.schemaOf(root, 2).get)
    assert(declared.fieldNames.toSeq == Seq("k", "v"))
  }

  test("REPLACE TABLE AS SELECT swaps content and schema") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gt.db9")
    spark.sql("CREATE TABLE gt.db9.r2 AS SELECT id AS k FROM range(0, 10)")
    spark.sql(
      "REPLACE TABLE gt.db9.r2 AS SELECT id AS a, id + 1 AS b FROM range(0, 7)")
    val df = spark.sql("SELECT * FROM gt.db9.r2")
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.count() == 7)
  }
}
