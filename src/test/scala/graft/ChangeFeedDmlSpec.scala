package graft

import graft.sources.CommitLogCdf
import org.apache.spark.sql.functions._

/** The CDC COMPLETENESS contract, property-style: EVERY committing SQL
  * verb on a catalog table that a standing `.changes` consumer follows
  * must either SERVE that version's row changes or refuse with a typed
  * error — never a silent miss (the scary class: a feed that quietly
  * drops a version's deletes corrupts every downstream sync).
  *
  * The invariant checked after each verb is the retraction fold:
  * summing `changeSign(_change_type)` per row-value over the whole
  * feed must reconstruct the CURRENT snapshot exactly — labels may
  * legitimately differ by verb (a group-based MERGE lands delete/
  * insert, an UPDATE lands update_preimage/update_postimage), but the
  * SIGNED MULTISET is the consumer contract and it has one right
  * answer. */
class ChangeFeedDmlSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_cfd").toString
  spark.conf.set("spark.sql.catalog.cfd", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.cfd.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS cfd.db")

  /** The standing consumer: fold the full feed with the retraction
    * sign and compare against the live snapshot, value-for-value. */
  private def foldMatchesSnapshot(t: String): Unit = {
    val feed = spark.sql(s"SELECT * FROM cfd.db.$t.changes")
    val folded = feed
      .withColumn("_s", CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)))
      .groupBy("id", "v").agg(sum("_s").as("n"))
      .filter(col("n") =!= 0)
    // every folded multiplicity must be exactly 1 (no dup rows in the
    // fixtures) and the surviving key set must equal the snapshot
    assert(folded.filter(col("n") =!= 1).isEmpty,
      s"non-unit multiplicity: ${folded.filter(col("n") =!= 1).collect().toSeq}")
    val now = spark.sql(s"SELECT id, v FROM cfd.db.$t")
    val lhs = folded.select("id", "v")
    assert(lhs.exceptAll(now).isEmpty && now.exceptAll(lhs).isEmpty,
      s"fold != snapshot: extra=${lhs.exceptAll(now).collect().toSeq} " +
        s"missing=${now.exceptAll(lhs).collect().toSeq}")
  }

  test("every SQL verb serves the standing .changes consumer (fold == snapshot)") {
    spark.sql("CREATE TABLE cfd.db.t (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cfd.db.t SELECT id, id * 10 FROM range(0, 200)")
    foldMatchesSnapshot("t") // plain append

    // DELETE, simple predicate -> the metadata deleteWhere path (DV
    // leg, changeFeed forced on)
    spark.sql("DELETE FROM cfd.db.t WHERE id < 10")
    foldMatchesSnapshot("t")

    // DELETE, arithmetic predicate -> the COW row-level path (the r12
    // silent-miss bug: no materialized changes, feed faulted)
    spark.sql("DELETE FROM cfd.db.t WHERE id % 10 = 3")
    foldMatchesSnapshot("t")

    // UPDATE -> COW rewrite, update_preimage/update_postimage pair
    spark.sql("UPDATE cfd.db.t SET v = v + 1 WHERE id % 7 = 0")
    val feed = spark.sql(s"SELECT * FROM cfd.db.t.changes")
    assert(feed.filter(col(CommitLogCdf.ChangeTypeCol) === "update_preimage")
      .count() > 0, "UPDATE must land preimages in the feed")
    foldMatchesSnapshot("t")

    // MERGE INTO (update + insert + delete clauses) -> COW rewrite;
    // group-based labels are delete/insert, sign-exact
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW cfd_src AS " +
      "SELECT id, id * 100 AS v FROM range(150, 260)")
    spark.sql(
      """MERGE INTO cfd.db.t AS t USING cfd_src AS s ON t.id = s.id
        |WHEN MATCHED AND s.id % 11 = 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    foldMatchesSnapshot("t")

    // INSERT OVERWRITE -> replace semantics: removed rows as deletes,
    // new rows as inserts, no diff needed
    spark.sql("INSERT OVERWRITE cfd.db.t SELECT id, id * 3 FROM range(0, 50)")
    foldMatchesSnapshot("t")

    // UPDATE after the overwrite (rewrite on the fresh state)
    spark.sql("UPDATE cfd.db.t SET v = 0 WHERE id >= 40")
    foldMatchesSnapshot("t")

    // TRUNCATE -> every live row a delete
    spark.sql("TRUNCATE TABLE cfd.db.t")
    foldMatchesSnapshot("t")
    assert(spark.sql("SELECT * FROM cfd.db.t").isEmpty)
  }

  test("DV commits synthesize deletes from positions (delta mode, no materialization)") {
    spark.sql("CREATE TABLE cfd.db.d (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cfd.db.d SELECT id, id FROM range(0, 100)")
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try {
      spark.sql("DELETE FROM cfd.db.d WHERE id % 9 = 1") // DV-only commit
      spark.sql("UPDATE cfd.db.d SET v = -1 WHERE id % 25 = 0") // DV + data
    } finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    val feed = spark.sql("SELECT * FROM cfd.db.d.changes")
    val v3 = feed.filter(col(CommitLogCdf.CommitVersionCol) === 3)
    assert(v3.filter(col(CommitLogCdf.ChangeTypeCol) === "delete")
      .select("id").as[Long].collect().sorted.toSeq ==
      (0L until 100L).filter(_ % 9 == 1), "v3 deletes must be the DV rows")
    foldMatchesSnapshot("d")
    // a whole-batch delete AFTER the DVs must not re-emit DV-dead rows
    spark.sql("TRUNCATE TABLE cfd.db.d")
    foldMatchesSnapshot("d")
  }

  test("VERSION AS OF on .changes is start-inclusive; OPTIMIZE serves an empty window") {
    spark.sql("CREATE TABLE cfd.db.w (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cfd.db.w SELECT id, id FROM range(0, 30)") // v2
    spark.sql("DELETE FROM cfd.db.w WHERE id % 3 = 1")                // v3
    spark.sql("INSERT INTO cfd.db.w VALUES (1000, 1)")                // v4
    spark.sql("CALL cfd.system.optimize(tbl => 'db.w')")              // v5, dataChange=false
    spark.sql("INSERT INTO cfd.db.w VALUES (2000, 2)")                // v6
    val since3 = spark.sql(
      "SELECT _change_type, count(*) AS n FROM cfd.db.w.changes " +
        "VERSION AS OF 3 GROUP BY 1 ORDER BY 1")
      .as[(String, Long)].collect().toSeq
    assert(since3 == Seq(("delete", 10L), ("insert", 2L)), s"got $since3")
    // the OPTIMIZE version alone is a served, EMPTY window — never a fault
    val v5 = spark.sql("SELECT * FROM cfd.db.w.changes VERSION AS OF 5")
      .filter(col(CommitLogCdf.CommitVersionCol) === 5)
    assert(v5.isEmpty)
  }

  test("opt-out (graft.changeFeed=false): typed refusal, never a silent miss") {
    spark.sql("CREATE TABLE cfd.db.o (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.changeFeed' = 'false')")
    spark.sql("INSERT INTO cfd.db.o SELECT id, id FROM range(0, 40)")
    spark.sql("DELETE FROM cfd.db.o WHERE id % 4 = 2") // COW, NOT materialized
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM cfd.db.o.changes").collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("materialized change rows"), chain(e))
  }

  test("variant tables serve COW versions at FILE granularity (r13 refusal)") {
    // EXCEPT ALL cannot row-diff a variant column, so a COW rewrite on
    // this table never materializes change rows — the feed now serves
    // such versions at FILE granularity (every removed row a delete,
    // every added row an insert). Unchanged rows restate as
    // delete+insert churn, but the RETRACTION FOLD still reconstructs
    // the snapshot exactly — the consumer contract, checked here over
    // an append + COW delete + COW update lifecycle on an UNTRACKED
    // variant table (tracked ones route delta and were already served).
    spark.sql("CREATE TABLE cfd.db.vt (id BIGINT, v VARIANT)")
    spark.sql("INSERT INTO cfd.db.vt SELECT id, " +
      "parse_json(format_string('{\"n\":%d}', id)) FROM range(0, 60)")
    spark.sql("DELETE FROM cfd.db.vt WHERE id % 3 = 0") // COW rewrite
    spark.sql(
      """UPDATE cfd.db.vt SET v = parse_json('{"n":-1}') WHERE id % 5 = 1""")
    val feed = spark.sql(
      "SELECT id, variant_get(v, '$.n', 'long') AS n, _change_type " +
        "FROM cfd.db.vt.changes")
    val folded = feed
      .withColumn("_s",
        CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)))
      .groupBy("id", "n").agg(sum("_s").as("m")).filter(col("m") =!= 0)
    assert(folded.filter(col("m") =!= 1).isEmpty)
    val lhs = folded.select("id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rhs = spark.sql(
      "SELECT id, variant_get(v, '$.n', 'long') FROM cfd.db.vt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lhs == rhs, s"fold diverged: ${(lhs -- rhs) ++ (rhs -- lhs)}")
    // the streaming tail serves the same lifecycle
    val ckpt = java.nio.file.Files.createTempDirectory("cfd_vt_ck").toString
    val q = spark.readStream.format("commitlog")
      .option("path", s"$wh/db/vt")
      .option("readChangeFeed", "true").option("startingVersion", 0).load()
      .writeStream.format("memory").queryName("cfd_vt_tail")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val tailFold = spark.table("cfd_vt_tail")
      .withColumn("_s",
        CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)))
      .withColumn("n", expr("variant_get(v, '$.n', 'long')"))
      .groupBy("id", "n").agg(sum("_s").as("m")).filter(col("m") =!= 0)
    val lhs2 = tailFold.select("id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lhs2 == rhs, "streaming tail fold diverged")
  }

  test("tracked variant tables: SQL UPDATE feeds exactly the touched row (delta leg)") {
    // the r14-verdict Done criterion: tracked variant table, UPDATE
    // touching 1 of N rows, feed emits exactly 2 rows of that id —
    // served at row granularity by the DELTA routing (tracked tables
    // always take it): the DV position synthesizes the delete, the
    // postimage file the insert; the 49 untouched rows never appear
    spark.sql("CREATE TABLE cfd.db.tv (id BIGINT, v VARIANT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO cfd.db.tv SELECT id, " +
      "parse_json(format_string('{\"n\":%d}', id)) FROM range(0, 50)")
    spark.sql("""UPDATE cfd.db.tv SET v = parse_json('{"n":-7}') WHERE id = 13""")
    val v = graft.sources.CommitLog.latestVersion(s"$wh/db/tv")
    val rows = spark.sql(
      "SELECT id, variant_get(v, '$.n', 'long') AS n, _change_type " +
        s"FROM cfd.db.tv.changes WHERE _commit_version = $v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set((13L, 13L, "delete"), (13L, -7L, "insert")),
      s"the feed must emit exactly the touched row's pair: $rows")
    foldMatchesSnapshotVariant("tv")
  }

  /** Variant twin of [[foldMatchesSnapshot]] (compares on the
    * extracted `$.n` — variants have no column equality). */
  private def foldMatchesSnapshotVariant(t: String): Unit = {
    val folded = spark.sql(
      s"SELECT id, variant_get(v, '$$.n', 'long') AS n, _change_type " +
        s"FROM cfd.db.$t.changes")
      .withColumn("_s",
        CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)))
      .groupBy("id", "n").agg(sum("_s").as("m")).filter(col("m") =!= 0)
    assert(folded.filter(col("m") =!= 1).isEmpty)
    val lhs = folded.select("id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rhs = spark.sql(
      s"SELECT id, variant_get(v, '$$.n', 'long') FROM cfd.db.$t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lhs == rhs, s"fold diverged: ${(lhs -- rhs) ++ (rhs -- lhs)}")
  }

  test("tracked variant tables: identity-diff of an unmaterialized COW rewrite (r15)") {
    // the one shape that used to have NO row-granularity serving: an
    // API verb forced onto the COW leg with changeFeed=false on a
    // variant table. With row tracking, identity replaces
    // comparability — CommitLogCdf.changeFeed diffs pre/post on the
    // preserved _graft_row_id (JSON-serialization sameness), so the
    // 39 untouched restated rows CANCEL and the feed emits exactly
    // the touched row's update pair.
    import graft.sources.{CommitLog, CommitLogCdf, CommitLogDml}
    spark.sql("CREATE TABLE cfd.db.tvi (id BIGINT, v VARIANT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO cfd.db.tvi SELECT id, " +
      "parse_json(format_string('{\"n\":%d}', id)) FROM range(0, 40)")
    val root = s"$wh/db/tvi"
    CommitLogDml.update(spark, root, "id = 7",
      Seq("v" -> """parse_json('{"n":-9}')"""),
      dvFraction = 0.0, changeFeed = false) // COW, nothing materialized
    val v = CommitLog.latestVersion(root)
    val up = CommitLogCdf.changeFeed(spark, root, v - 1, v, Seq("id"))
      .select(col("id"), expr("variant_get(v, '$.n', 'long')").as("n"),
        col(CommitLogCdf.ChangeTypeCol).as("ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(up == Set((7L, 7L, "update_preimage"), (7L, -9L, "update_postimage")),
      s"identity diff must emit exactly the touched row's pair: $up")
    // COW DELETE: survivors cancel by id, only the deleted rows emit
    CommitLogDml.delete(spark, root, "id >= 35",
      dvFraction = 0.0, changeFeed = false)
    val v2 = CommitLog.latestVersion(root)
    val del = CommitLogCdf.changeFeed(spark, root, v2 - 1, v2, Seq("id"))
      .select(col("id"), col(CommitLogCdf.ChangeTypeCol).as("ct"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(del == (35L until 40L).map(i => (i, "delete")).toSet,
      s"only the deleted rows may emit: $del")
    // the standing consumer still reconstructs the snapshot exactly
    val folded = CommitLogCdf.changeFeed(spark, root, 0, v2, Seq("id"))
      .withColumn("n", expr("variant_get(v, '$.n', 'long')"))
      .withColumn("_s",
        CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)))
      .groupBy("id", "n").agg(sum("_s").as("m")).filter(col("m") =!= 0)
    assert(folded.filter(col("m") =!= 1).isEmpty)
    val lhs = folded.select("id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rhs = spark.sql(
      "SELECT id, variant_get(v, '$.n', 'long') FROM cfd.db.tvi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lhs == rhs, s"fold diverged: ${(lhs -- rhs) ++ (rhs -- lhs)}")
    // an UNTRACKED variant table keeps the typed refusal on this path
    spark.sql("CREATE TABLE cfd.db.uvi (id BIGINT, v VARIANT)")
    spark.sql("INSERT INTO cfd.db.uvi SELECT id, " +
      "parse_json(format_string('{\"n\":%d}', id)) FROM range(0, 10)")
    CommitLogDml.delete(spark, s"$wh/db/uvi", "id = 3",
      dvFraction = 0.0, changeFeed = false)
    val uv = CommitLog.latestVersion(s"$wh/db/uvi")
    val e = intercept[Exception] {
      CommitLogCdf.changeFeed(spark, s"$wh/db/uvi", uv - 1, uv, Seq("id"))
        .collect()
    }
    assert(e.getMessage.contains("without row tracking"), e.getMessage)
  }

  test("map-bearing tables serve COW versions at FILE granularity too") {
    spark.sql("CREATE TABLE cfd.db.mt (id BIGINT, m MAP<STRING, BIGINT>)")
    spark.sql("INSERT INTO cfd.db.mt SELECT id, map('a', id) FROM range(0, 30)")
    spark.sql("DELETE FROM cfd.db.mt WHERE id >= 20") // COW rewrite
    val folded = spark.sql(
      "SELECT id, m['a'] AS a, _change_type FROM cfd.db.mt.changes")
      .withColumn("_s",
        CommitLogCdf.changeSign(col(CommitLogCdf.ChangeTypeCol)))
      .groupBy("id", "a").agg(sum("_s").as("k")).filter(col("k") =!= 0)
    assert(folded.count() == 20)
    assert(folded.filter(col("k") =!= 1).isEmpty)
    // comparable tables keep the refusal when rows were never
    // materialized (opt-out path above) — the relaxation is scoped to
    // non-comparable schemas only
  }
}
