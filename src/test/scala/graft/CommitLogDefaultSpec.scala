package graft

import graft.sources.CommitLog

/** SQL column DEFAULT values on commitlog tables: declared at CREATE,
  * persisted as their own manifest facet (the stored DDL stays bare —
  * toDDL's DEFAULT clause would brick fromDDL), re-attached on
  * loadTable so Spark's analyzer fills omitted INSERT columns. */
class CommitLogDefaultSpec extends SparkSpec {

  private val wh = java.nio.file.Files.createTempDirectory("graft_def").toString
  spark.conf.set("spark.sql.catalog.dft", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.dft.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS dft.db")

  test("INSERT fills omitted and DEFAULT-keyword columns from the declared default") {
    spark.sql("CREATE TABLE dft.db.t (k BIGINT, status STRING DEFAULT 'new', " +
      "prio INT DEFAULT 3)")
    spark.sql("INSERT INTO dft.db.t (k) VALUES (1)")
    spark.sql("INSERT INTO dft.db.t (k, status) VALUES (2, 'done')")
    spark.sql("INSERT INTO dft.db.t VALUES (3, DEFAULT, DEFAULT)")
    val rows = spark.sql("SELECT k, status, prio FROM dft.db.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq == Seq((1L, "new", 3), (2L, "done", 3), (3L, "new", 3)),
      rows.mkString(","))
    // the stored DDL stays parseable: the facet carries the defaults
    val root = s"$wh/db/t"
    val v = CommitLog.latestVersion(root)
    assert(!CommitLog.schemaOf(root, v).get.contains("DEFAULT"),
      "defaults must not leak into the stored DDL")
    assert(CommitLog.defaultsOf(root, v).keySet == Set("status", "prio"))
  }

  test("defaults survive checkpoints and vacuum") {
    spark.sql("CREATE TABLE dft.db.ck (k BIGINT, tag STRING DEFAULT 'x')")
    (1 to 9).foreach(i =>
      spark.sql(s"INSERT INTO dft.db.ck (k) VALUES ($i)"))
    val root = s"$wh/db/ck"
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    spark.sql("INSERT INTO dft.db.ck (k) VALUES (100)")
    assert(spark.sql("SELECT count(*) FROM dft.db.ck WHERE tag = 'x'")
      .head().getLong(0) == 10L)
  }

  test("RENAME migrates the default; DROP COLUMN retires it") {
    spark.sql("CREATE TABLE dft.db.mv (k BIGINT, a STRING DEFAULT 'va', " +
      "b STRING DEFAULT 'vb')")
    spark.sql("ALTER TABLE dft.db.mv RENAME COLUMN a TO a2")
    spark.sql("INSERT INTO dft.db.mv (k) VALUES (1)")
    val r = spark.sql("SELECT a2, b FROM dft.db.mv").head()
    assert(r.getString(0) == "va" && r.getString(1) == "vb")
    spark.sql("ALTER TABLE dft.db.mv DROP COLUMN b")
    val root = s"$wh/db/mv"
    val dfs = CommitLog.defaultsOf(root, CommitLog.latestVersion(root))
    assert(dfs.keySet == Set("a2"), dfs.toString)
  }

  test("ADD COLUMN with a DEFAULT is refused (null-fill semantics)") {
    spark.sql("CREATE TABLE dft.db.ac (k BIGINT)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE dft.db.ac ADD COLUMN extra STRING DEFAULT 'zz'")
    }
    assert(e.getMessage.contains("DEFAULT"), e.getMessage)
    spark.sql("ALTER TABLE dft.db.ac ADD COLUMN plain STRING")
    assert(spark.sql("SELECT * FROM dft.db.ac").columns.toSeq == Seq("k", "plain"))
  }

  test("column COMMENTs keep round-tripping through the stored DDL") {
    spark.sql("CREATE TABLE dft.db.cm (k BIGINT COMMENT 'the key', " +
      "v STRING DEFAULT 'd' COMMENT 'the value')")
    spark.sql("INSERT INTO dft.db.cm (k) VALUES (1)") // restates schema
    val described = spark.sql("DESCRIBE TABLE dft.db.cm")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(described.get("k").contains("the key") &&
      described.get("v").contains("the value"),
      s"comments must survive bareDdl scrubbing: $described")
    assert(spark.sql("SELECT v FROM dft.db.cm").head().getString(0) == "d")
  }

  test("REPLACE TABLE swaps the default set with the new definition's") {
    spark.sql("CREATE TABLE dft.db.rp (k BIGINT, s STRING DEFAULT 'old')")
    spark.sql("INSERT INTO dft.db.rp (k) VALUES (1)")
    spark.sql("REPLACE TABLE dft.db.rp (k BIGINT, t STRING DEFAULT 'new') ")
    spark.sql("INSERT INTO dft.db.rp (k) VALUES (2)")
    val r = spark.sql("SELECT k, t FROM dft.db.rp").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((2L, "new")), r.mkString(","))
    val root = s"$wh/db/rp"
    assert(CommitLog.defaultsOf(root, CommitLog.latestVersion(root))
      .keySet == Set("t"))
  }

  test("RESTORE rolls the defaults facet back with the schema") {
    spark.sql("CREATE TABLE dft.db.rs (k BIGINT, s STRING DEFAULT 'old')")
    spark.sql("INSERT INTO dft.db.rs (k) VALUES (1)") // v2
    spark.sql("REPLACE TABLE dft.db.rs (k BIGINT, s STRING DEFAULT 'new')")
    spark.sql("INSERT INTO dft.db.rs (k) VALUES (2)") // fills 'new'
    val root = s"$wh/db/rs"
    CommitLog.restore(root, 2)
    // an INSERT after restore must fill the RESTORED definition's
    // default — before the fix it silently wrote 'new'
    spark.sql("INSERT INTO dft.db.rs (k) VALUES (3)")
    val r = spark.sql("SELECT k, s FROM dft.db.rs ORDER BY k").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "old"), (3L, "old")), r.mkString(","))
    assert(CommitLog.defaultsOf(root, CommitLog.latestVersion(root))
      .get("s").exists(_._1.contains("old")))
  }

  test("RESTORE across a pure-metadata rename rolls schema and default back") {
    spark.sql("CREATE TABLE dft.db.rn (k BIGINT, s STRING DEFAULT 'a')")
    spark.sql("INSERT INTO dft.db.rn (k) VALUES (1)") // v2
    spark.sql("ALTER TABLE dft.db.rn RENAME COLUMN s TO s2") // v3, no files
    val root = s"$wh/db/rn"
    CommitLog.restore(root, 2) // moves no files — metadata-only restore
    val schema = spark.table("dft.db.rn").schema.fieldNames.toSeq
    assert(schema == Seq("k", "s"), schema.mkString(","))
    spark.sql("INSERT INTO dft.db.rn (k) VALUES (2)")
    assert(spark.sql("SELECT s FROM dft.db.rn WHERE k = 2").head()
      .getString(0) == "a")
  }
}
