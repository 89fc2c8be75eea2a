package graft

import graft.sources.{CommitLog, CommitLogDeltaWriter, CommitLogDml}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-14 advisor findings, each pinned as a regression:
  *
  *  1. `graft.rowTracking` can only be DISABLED (SET 'false' / UNSET)
  *     while the table holds no data — mirroring the enable gate;
  *     otherwise post-flip appends write id-less files and re-enabling
  *     is permanently blocked, a silent irreversible identity loss;
  *  2. [[CommitLog.blindDataAppend]] requires an EXPLICIT append verb
  *     (`exists`, not `forall`): an op-less add-only manifest cannot
  *     prove its rows are new, so a rebase must abort on it;
  *  3. a row-tracked delta UPDATE whose preserved id is missing/null
  *     throws instead of defensively minting a fresh identity
  *     (identity drift would otherwise pass unnoticed);
  *  4. row-level regen of GENERATED columns binds the same ANSI cast
  *     the sink writes with — under lax session cast semantics a
  *     rewrite must refuse a bad value loudly, never null it in. */
class AdviceHardeningSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_whah").toString
  spark.conf.set("spark.sql.catalog.ah", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.ah.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS ah.db")

  test("rowTracking cannot be disabled on a non-empty tracked table") {
    spark.sql("CREATE TABLE ah.db.t1 (k BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO ah.db.t1 SELECT id FROM range(0, 5)")
    val e1 = intercept[Exception] {
      spark.sql(
        "ALTER TABLE ah.db.t1 SET TBLPROPERTIES ('graft.rowTracking'='false')")
    }
    assert(e1.getMessage.contains("DISABLED"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE ah.db.t1 UNSET TBLPROPERTIES ('graft.rowTracking')")
    }
    assert(e2.getMessage.contains("DISABLED"), e2.getMessage)
    // still tracked: ids keep flowing to the feed
    assert(spark.sql("SELECT count(DISTINCT _graft_row_id) FROM ah.db.t1")
      .head().getLong(0) == 5)
    // the empty-table escape hatch stays open
    spark.sql("CREATE TABLE ah.db.t2 (k BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql(
      "ALTER TABLE ah.db.t2 SET TBLPROPERTIES ('graft.rowTracking'='false')")
    spark.sql("CREATE TABLE ah.db.t3 (k BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("ALTER TABLE ah.db.t3 UNSET TBLPROPERTIES ('graft.rowTracking')")
  }

  test("an op-less add-only commit is NOT a blind data append") {
    val root = java.nio.file.Files.createTempDirectory("clah_oa").toString
    spark.range(0, 10).toDF("k")
      .write.format("commitlog").option("path", root).mode("append").save()
    // direct manifest append with NO recorded operation verb — the
    // shape alone (add-only, no DV/schema/props) cannot prove newness
    val c = CommitLog.commit(root, CommitLog.latestVersion(root),
      added = Seq("bx"))
    assert(!CommitLog.blindDataAppend(root, c.version),
      "op-less add-only manifests must abort a rebase, not slide past")
    // ...while the sink's own verb-carrying append still qualifies
    spark.range(10, 20).toDF("k")
      .write.format("commitlog").option("path", root).mode("append").save()
    assert(CommitLog.blindDataAppend(root, CommitLog.latestVersion(root)))
  }

  test("a tracked delta UPDATE without its preserved id throws") {
    val stage = java.nio.file.Files.createTempDirectory("clah_dw").toString
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("_graft_row_id", LongType)))
    val w = new CommitLogDeltaWriter(stage, schema, "t0",
      rowIdOrdinal = 1, baseK = 0L, partitionId = 0, numPartitions = 1)
    val dvId = new GenericInternalRow(
      Array[Any](UTF8String.fromString("f"), 0L))
    val row = new GenericInternalRow(Array[Any](7L, null))
    val e = intercept[IllegalStateException] {
      w.update(new GenericInternalRow(0), dvId, row)
    }
    assert(e.getMessage.contains("preserved row id"), e.getMessage)
    w.abort()
  }

  test("row-level regen refuses a bad generated value under lax session casts") {
    spark.sql(
      """CREATE TABLE ah.db.g (
        |  s STRING, v INT GENERATED ALWAYS AS (CAST(s AS INT)))""".stripMargin)
    spark.sql("INSERT INTO ah.db.g (s) VALUES ('1'), ('2'), ('3')")
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // COW UPDATE: the recompute of v = CAST('oops' AS INT) must
      // refuse (the sink's contract), not write v = NULL
      val e = intercept[Exception] {
        spark.sql("UPDATE ah.db.g SET s = 'oops' WHERE s = '2'")
      }
      assert(e.getMessage != null)
      // path-API MERGE leg binds the same way
      val src = Seq(("oops2", "U")).toDF("s", "_op")
      val e2 = intercept[Exception] {
        graft.sources.CommitLogMerge.merge(
          spark, s"$wh/db/g", src, Seq("s"))
      }
      assert(e2.getMessage != null)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
    // nothing slipped through: table unchanged, no nulls
    assert(spark.sql(
      "SELECT count(*) FROM ah.db.g WHERE v IS NULL OR v <> CAST(s AS INT)")
      .head().getLong(0) == 0)
    assert(spark.sql("SELECT count(*) FROM ah.db.g").head().getLong(0) == 3)
    // DELETE's survivor rewrite under lax casts still succeeds on good
    // values (the ANSI bind is not over-strict)
    spark.sql("DELETE FROM ah.db.g WHERE s = '3'")
    assert(spark.sql("SELECT count(*) FROM ah.db.g").head().getLong(0) == 2)
  }

  test("regen forces ANSI on ANALYSIS-inserted coercions, not just the outer cast") {
    // `s + 1` carries NO explicit cast: the string→double coercion is
    // inserted by the ANALYZER, and a coercion cast built under the
    // session's lax conf silently nulls a bad value — the regen path
    // must analyze the whole expression under forced ANSI (r15 advice:
    // eager GeneratedColumnAnalyzer run, mirroring the sink's own
    // bound generators), so the rewrite refuses exactly like the sink
    spark.sql(
      """CREATE TABLE ah.db.g2 (
        |  s STRING, d DOUBLE GENERATED ALWAYS AS (s + 1))""".stripMargin)
    spark.sql("INSERT INTO ah.db.g2 (s) VALUES ('1'), ('2')")
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e = intercept[Exception] {
        spark.sql("UPDATE ah.db.g2 SET s = 'oops' WHERE s = '2'")
      }
      assert(e.getMessage != null)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
    // nothing slipped through, and good values still regen exactly
    assert(spark.sql(
      "SELECT count(*) FROM ah.db.g2 WHERE d IS NULL OR d <> s + 1")
      .head().getLong(0) == 0)
    spark.sql("UPDATE ah.db.g2 SET s = '7' WHERE s = '2'")
    assert(spark.sql("SELECT d FROM ah.db.g2 ORDER BY d").collect()
      .map(_.getDouble(0)).toSeq == Seq(2.0, 8.0))
  }
}
