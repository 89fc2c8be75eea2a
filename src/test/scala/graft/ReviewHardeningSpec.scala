package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge}
import org.apache.spark.sql.functions._

/** Round-13 review findings, each pinned as a regression:
  *
  *  1. generated-column DERIVATION is gated to temporal sources
  *     (CAST(string AS DATE) is not monotone in the string's binary
  *     order, and a malformed non-null string casts to null);
  *  2. every row-level write RECOMPUTES generated columns (a SET on a
  *     source column must never leave a stale generated value);
  *  3. blindDataAppend checks the recorded OPERATION — an add-only
  *     RESTORE re-adds rows that existed at a rebasing statement's
  *     read version and must abort it, not slide past;
  *  4. `.changes VERSION AS OF 0` means "everything", not a read of
  *     the nonexistent v0 manifest;
  *  5. the DV reconcile's internal join key cannot shadow a user
  *     column. */
class ReviewHardeningSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_whrh").toString
  spark.conf.set("spark.sql.catalog.rh", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.rh.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS rh.db")

  test("string-source generated columns derive no range filters (unsound order)") {
    spark.sql(
      """CREATE TABLE rh.db.sg (
        |  s STRING, day DATE GENERATED ALWAYS AS (CAST(s AS DATE)))
        |PARTITIONED BY (day)""".stripMargin)
    // '2024-1-03' sorts ABOVE '2024-09-05' lexically but casts BELOW
    // it — a range derived onto `day` would prune its partition.
    // (Malformed strings never reach storage: the sink's generation
    // eval is an ANSI cast and refuses them loudly; the IsNotNull
    // gating in GeneratedPruning stays as defense-in-depth.)
    spark.sql("INSERT INTO rh.db.sg (s) VALUES ('2024-1-03'), " +
      "('2024-09-05'), ('2024-12-01')")
    val got = spark.sql(
      "SELECT s FROM rh.db.sg WHERE s > '2024-09-05'")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("2024-1-03", "2024-12-01"),
      s"derived range pruning lost rows: $got")
  }

  test("row-level writes recompute generated columns (all four paths)") {
    def mk(name: String): String = {
      spark.sql(
        s"""CREATE TABLE rh.db.$name (
           |  k BIGINT, ts TIMESTAMP,
           |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))""".stripMargin)
      spark.sql(s"INSERT INTO rh.db.$name (k, ts) SELECT id, " +
        "timestamp'2024-03-01 12:00:00' + make_interval(0,0,0,CAST(id AS INT)) " +
        "FROM range(0, 40)")
      s"$wh/db/$name"
    }
    def daysConsistent(name: String): Unit = {
      val bad = spark.sql(
        s"SELECT count(*) FROM rh.db.$name WHERE day <> CAST(ts AS DATE)")
        .head().getLong(0)
      assert(bad == 0, s"$name holds $bad stale generated values")
    }
    // SQL UPDATE, group-based COW
    val r1 = mk("g1")
    spark.sql("UPDATE rh.db.g1 SET ts = ts + INTERVAL 90 DAYS WHERE k % 3 = 0")
    daysConsistent("g1")
    assert(spark.sql("SELECT count(*) FROM rh.db.g1 " +
      "WHERE day = date'2024-05-30'").head().getLong(0) > 0)
    // SQL UPDATE, merge-on-read delta
    mk("g2")
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try spark.sql(
      "UPDATE rh.db.g2 SET ts = ts + INTERVAL 90 DAYS WHERE k % 3 = 0")
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    daysConsistent("g2")
    // path-API UPDATE recomputes; assigning the generated column refuses
    val r3 = mk("g3")
    CommitLogDml.update(spark, r3, "k % 2 = 0",
      Seq("ts" -> "ts + INTERVAL 90 DAYS"), changeFeed = false)
    daysConsistent("g3")
    val e = intercept[Exception] {
      CommitLogDml.update(spark, r3, "k = 1",
        Seq("day" -> "date'1999-01-01'"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    // path-API MERGE: stale source-supplied generated values are
    // overridden on postimages AND inserts (the sink's
    // ignore-the-writer semantic)
    val r4 = mk("g4")
    val src = spark.range(30, 50).toDF("k")
      .withColumn("ts", expr(
        "timestamp'2024-07-01 12:00:00' + make_interval(0,0,0,CAST(k AS INT))"))
      .withColumn("day", lit(java.sql.Date.valueOf("1999-01-01"))) // stale
      .withColumn("_op", lit("U"))
    CommitLogMerge.merge(spark, r4, src, Seq("k"))
    daysConsistent("g4")
    assert(spark.sql("SELECT count(*) FROM rh.db.g4").head().getLong(0) == 50)
  }

  test("an add-only RESTORE is NOT a blind data append (no rebase across it)") {
    val root = java.nio.file.Files.createTempDirectory("clrh_ra").toString
    spark.range(0, 10).toDF("k")
      .write.format("commitlog").option("path", root).mode("append").save()
    spark.range(10, 20).toDF("k")
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogDml.delete(spark, root, "k >= 10") // v3: drops batch 2
    CommitLog.restore(root, 2) // v4: re-ADDS it, removes nothing
    assert(CommitLog.blindDataAppend(root, 2),
      "a plain append must stay classified as one")
    assert(!CommitLog.blindDataAppend(root, 4),
      "an add-only RESTORE re-adds rows that existed at an earlier " +
        "read version — rebasing across it would break serializability")
  }

  test(".changes VERSION AS OF 0 reads everything instead of crashing") {
    spark.sql("CREATE TABLE rh.db.z (k BIGINT)")
    spark.sql("INSERT INTO rh.db.z SELECT id FROM range(0, 7)")
    assert(spark.sql("SELECT count(*) FROM rh.db.z.changes VERSION AS OF 0")
      .head().getLong(0) == 7)
  }

  test("a user column named _nf survives the DV reconcile in COW verbs") {
    val root = java.nio.file.Files.createTempDirectory("clrh_nf").toString
    spark.range(0, 100).toDF("k").withColumn("_nf", $"k" * 7)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogDml.delete(spark, root, "k = 5") // sparse -> DV
    CommitLogDml.delete(spark, root, "k % 2 = 0") // dense -> COW reconcile
    val rows = spark.read.format("commitlog").option("path", root).load()
      .select($"k", $"_nf").collect()
    assert(rows.length == (0 until 100).count(k => k != 5 && k % 2 != 0))
    rows.foreach(r => assert(r.getLong(1) == r.getLong(0) * 7,
      s"_nf corrupted for k=${r.getLong(0)}"))
  }
}
