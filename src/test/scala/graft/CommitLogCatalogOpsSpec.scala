package graft

import graft.sources.CommitLog
import org.apache.spark.sql.functions._

/** Catalog-level operations added in round 11 session 4:
  *
  *  - SupportsPartitionManagement: SHOW PARTITIONS (pure metadata),
  *    ALTER TABLE DROP PARTITION / TRUNCATE PARTITION as metadata-only
  *    removals that stay time-travelable;
  *  - StagingTableCatalog: ATOMIC CTAS (one directory rename, failed
  *    writes leave nothing) and ATOMIC RTAS/REPLACE TABLE (staged
  *    batches adopted into the target's log as ONE serializable
  *    manifest, old versions readable, old CHECKs tombstoned).
  */
class CommitLogCatalogOpsSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_cat").toString
  spark.conf.set("spark.sql.catalog.cat", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.cat.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.db")

  private def mkPartitioned(name: String): String = {
    spark.sql(s"CREATE TABLE cat.db.$name (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO cat.db.$name SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END " +
      "FROM range(0, 90)")
    s"$wh/db/$name"
  }

  test("SHOW PARTITIONS lists the live tuples from metadata") {
    mkPartitioned("sp")
    val rows = spark.sql("SHOW PARTITIONS cat.db.sp")
      .collect().map(_.getString(0)).sorted
    assert(rows.toSeq == Seq("region=ap", "region=eu", "region=us"), rows.mkString(","))
    val one = spark.sql("SHOW PARTITIONS cat.db.sp PARTITION (region = 'eu')")
      .collect().map(_.getString(0))
    assert(one.toSeq == Seq("region=eu"))
  }

  test("ALTER TABLE DROP PARTITION is a metadata-only, time-travelable removal") {
    val root = mkPartitioned("dp")
    val vBefore = CommitLog.latestVersion(root)
    val filesBefore = CommitLog.files(root, vBefore)
    spark.sql("ALTER TABLE cat.db.dp DROP PARTITION (region = 'eu')")
    val v = CommitLog.latestVersion(root)
    assert(v == vBefore + 1)
    assert(spark.sql("SELECT count(*) FROM cat.db.dp").head().getLong(0) == 60L)
    assert(spark.sql("SELECT DISTINCT region FROM cat.db.dp")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("ap", "us"))
    // metadata-only: the dropped batch's files still exist on disk and
    // the old version still serves them
    val dropped = filesBefore.toSet -- CommitLog.files(root, v).toSet
    assert(dropped.size == 1)
    assert(new java.io.File(CommitLog.batchPath(root, dropped.head)).exists())
    assert(spark.sql(s"SELECT count(*) FROM cat.db.dp VERSION AS OF $vBefore")
      .head().getLong(0) == 90L)
    assert(CommitLog.history(root).exists(_.operation.contains("DROP PARTITION")))
    // dropping it again: nothing matches
    val thrown = intercept[Exception] {
      spark.sql("ALTER TABLE cat.db.dp DROP PARTITION (region = 'eu')")
    }
    assert(thrown.getMessage.toLowerCase.contains("partition"))
  }

  test("CTAS commits atomically through the staged path") {
    spark.sql("CREATE TABLE cat.db.ctas AS SELECT id, id * 2 AS v FROM range(0, 50)")
    assert(spark.sql("SELECT count(*), sum(v) FROM cat.db.ctas").head()
      .getLong(0) == 50L)
    val root = s"$wh/db/ctas"
    // the staged write carried full manifest facets: counts present
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.rowsOf(root, v).values.sum == 50L)
    // no stage debris
    val ns = new java.io.File(s"$wh/db")
    assert(!ns.listFiles().exists(_.getName.startsWith(".stage-")),
      ns.listFiles().map(_.getName).mkString(","))
  }

  test("partitioned CTAS lands tuple batches (SPJ-ready from birth)") {
    spark.sql("CREATE TABLE cat.db.pctas PARTITIONED BY (region) AS " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END AS region " +
      "FROM range(0, 40)")
    val root = s"$wh/db/pctas"
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.partColsOf(root, v) == Seq("region"))
    assert(CommitLog.files(root, v).size == 2, "one batch per tuple")
    assert(CommitLog.partsOf(root, v).size == 2)
  }

  test("a failing CTAS leaves neither table nor stage debris") {
    val boom = udf((x: Long) =>
      if (x > 10) throw new RuntimeException("boom") else x)
    spark.udf.register("boom44", boom)
    intercept[Exception] {
      spark.sql("CREATE TABLE cat.db.failed AS SELECT boom44(id) AS v FROM range(0, 100)")
    }
    assert(!spark.catalog.tableExists("cat.db.failed"))
    intercept[Exception] { spark.sql("SELECT * FROM cat.db.failed").collect() }
    val ns = new java.io.File(s"$wh/db")
    assert(!ns.listFiles().exists(_.getName.startsWith(".stage-")),
      ns.listFiles().map(_.getName).mkString(","))
  }

  test("RTAS replaces in ONE serializable commit; old version stays readable") {
    spark.sql("CREATE TABLE cat.db.rt AS SELECT id, CAST(id AS DOUBLE) AS v " +
      "FROM range(0, 30)")
    val root = s"$wh/db/rt"
    graft.sources.CommitLogWrite.addConstraint(
      spark, root, "v_pos", "v >= 0")
    val vOld = CommitLog.latestVersion(root)
    spark.sql("REPLACE TABLE cat.db.rt AS SELECT id AS k, CAST(-5 AS DOUBLE) AS w " +
      "FROM range(0, 12)")
    val v = CommitLog.latestVersion(root)
    assert(v == vOld + 1, "one commit, no intermediate versions")
    // new definition, new schema, old CHECK gone (w = -5 violates it)
    assert(spark.sql("SELECT count(*), sum(w) FROM cat.db.rt").head().getLong(0) == 12L)
    assert(CommitLog.constraintsOf(root, v).isEmpty,
      "REPLACE tombstones the old definition's constraints")
    assert(CommitLog.history(root).exists(_.operation.contains("REPLACE TABLE")))
    // time travel reads the OLD definition under its OLD schema
    val old = spark.sql(s"SELECT * FROM cat.db.rt VERSION AS OF $vOld")
    assert(old.columns.toSeq == Seq("id", "v") && old.count() == 30L)
    // counts carried: metadata COUNT(*) still works post-replace
    assert(CommitLog.rowsOf(root, v).values.sum == 12L)
  }

  test("CREATE OR REPLACE creates when absent, replaces when present") {
    spark.sql("CREATE OR REPLACE TABLE cat.db.cor AS SELECT id FROM range(0, 5)")
    assert(spark.sql("SELECT count(*) FROM cat.db.cor").head().getLong(0) == 5L)
    spark.sql("CREATE OR REPLACE TABLE cat.db.cor AS SELECT id FROM range(0, 9)")
    assert(spark.sql("SELECT count(*) FROM cat.db.cor").head().getLong(0) == 9L)
  }

  test("DROP PARTITION refuses while untupled batches may hold the partition's rows") {
    val root = mkPartitioned("dpu")
    // delta-mode DML writes postimage batches with NO partition tuple —
    // their rows can belong to any partition
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.cat2", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.cat2.warehouse", wh)
    s2.conf.set("spark.graft.rowLevel.mode", "delta")
    s2.sql("UPDATE cat2.db.dpu SET id = id + 1000 WHERE region = 'eu' AND id < 10")
    val e = intercept[IllegalStateException] {
      spark.sql("ALTER TABLE cat.db.dpu DROP PARTITION (region = 'eu')")
    }
    assert(e.getMessage.contains("tuple") ||
      Option(e.getCause).exists(_.getMessage.contains("tuple")), e.getMessage)
    // the partition's rows are all still served
    assert(spark.sql("SELECT count(*) FROM cat.db.dpu WHERE region = 'eu'")
      .head().getLong(0) == 30L)
  }

  test("REPLACE cannot ADD partitioning either — restore could never undo it") {
    spark.sql("CREATE TABLE cat.db.np AS SELECT id FROM range(0, 10)")
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE cat.db.np PARTITIONED BY (region) AS " +
        "SELECT id, 'us' AS region FROM range(0, 10)")
    }
    assert(e.getMessage.contains("partitioning"), e.getMessage)
  }

  test("DESCRIBE EXTENDED surfaces version, batch and exact row counts") {
    spark.sql("CREATE TABLE cat.db.props AS SELECT id FROM range(0, 42)")
    val props = spark.sql("DESCRIBE TABLE EXTENDED cat.db.props")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val tp = props.getOrElse("Table Properties", "")
    assert(tp.contains("numRows=42"), s"exact count surfaced: $tp")
    assert(tp.contains("version="), tp)
  }

  test("REPLACE refuses repartitioning and renamed/dropped name reuse") {
    spark.sql("CREATE TABLE cat.db.guard (id BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql("INSERT INTO cat.db.guard VALUES (1, 'us')")
    val e1 = intercept[Exception] {
      spark.sql("REPLACE TABLE cat.db.guard AS SELECT id FROM range(0, 3)")
    }
    assert(e1.getMessage.contains("partitioning"), e1.getMessage)
    spark.sql("CREATE TABLE cat.db.guard2 AS SELECT id, id AS old FROM range(0, 3)")
    spark.sql("ALTER TABLE cat.db.guard2 RENAME COLUMN old TO fresh")
    val e2 = intercept[Exception] {
      spark.sql("REPLACE TABLE cat.db.guard2 AS SELECT id AS old FROM range(0, 3)")
    }
    assert(e2.getMessage.contains("old"), e2.getMessage)
  }
}
