package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogOptimize}
import org.apache.spark.sql.functions._

/** ROW TRACKING — stable per-row identities (`graft.rowTracking`):
  * every data file of a tracked table materializes a hidden BIGINT
  * `_graft_row_id`, allocated at the sink through the identity
  * k-block ladder, hidden from `SELECT *`/DESCRIBE (it is a metadata
  * column), and PRESERVED across OPTIMIZE packing and row-level DML —
  * an UPDATE changes a row's values, never its identity. SQL DML on a
  * tracked table routes through the merge-on-read delta operation
  * (unchanged rows keep their files; postimages carry the id as a
  * metadata attribute; MERGE inserts allocate fresh ids and advance
  * the watermark in the same commit). */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_whrt").toString
  spark.conf.set("spark.sql.catalog.rt", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.rt.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS rt.db")

  private def ids(tbl: String): Set[Long] =
    spark.sql(s"SELECT _graft_row_id FROM $tbl").as[Long].collect().toSet

  test("sink allocates unique hidden ids; schema and SELECT * never show them") {
    spark.sql("CREATE TABLE rt.db.a (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.a SELECT id, id * 10 FROM range(0, 1000)")
    spark.sql("INSERT INTO rt.db.a SELECT id, id * 10 FROM range(1000, 1500)")
    // hidden: not in the table schema, not in star expansion
    assert(spark.table("rt.db.a").schema.fieldNames.toSeq == Seq("k", "v"))
    assert(spark.sql("SELECT * FROM rt.db.a").schema.fieldNames.toSeq ==
      Seq("k", "v"))
    // selectable as a metadata column; unique across BOTH appends
    // (the second allocates past the committed watermark)
    val rows = spark.sql(
      "SELECT _graft_row_id AS rid, k FROM rt.db.a").collect()
    assert(rows.length == 1500)
    assert(rows.map(_.getLong(0)).distinct.length == 1500,
      "row ids must be unique across appends")
  }

  test("OPTIMIZE preserves the exact id set; ids stay attached to their rows") {
    spark.sql("CREATE TABLE rt.db.b (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.b SELECT id, id FROM range(0, 300)")
    spark.sql("INSERT INTO rt.db.b SELECT id, id FROM range(300, 600)")
    val before = spark.sql(
      "SELECT _graft_row_id AS rid, k FROM rt.db.b").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    val root = s"$wh/db/b"
    val res = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    assert(res.packed.nonEmpty, "expected the two appends to pack")
    val after = spark.sql(
      "SELECT _graft_row_id AS rid, k FROM rt.db.b").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(after == before,
      "OPTIMIZE must carry each row's id through the rewrite")
  }

  test("SQL UPDATE preserves ids (delta leg); DELETE survivors keep theirs") {
    spark.sql("CREATE TABLE rt.db.c (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.c SELECT id, id FROM range(0, 500)")
    val before = spark.sql(
      "SELECT _graft_row_id AS rid, k FROM rt.db.c").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    spark.sql("UPDATE rt.db.c SET v = -1 WHERE k % 10 = 3")
    val after = spark.sql(
      "SELECT _graft_row_id AS rid, k, v FROM rt.db.c").collect()
    assert(after.length == 500)
    after.foreach { r =>
      assert(r.getLong(0) == before(r.getLong(1)),
        s"UPDATE changed the id of k=${r.getLong(1)}")
      if (r.getLong(1) % 10 == 3) assert(r.getLong(2) == -1L)
    }
    // arithmetic-predicate DELETE (not metadata-translatable) also
    // routes row-level; survivors keep their ids
    spark.sql("DELETE FROM rt.db.c WHERE k % 7 = 0")
    val surv = spark.sql(
      "SELECT _graft_row_id AS rid, k FROM rt.db.c").collect()
    assert(surv.length == 500 - (0 until 500).count(_ % 7 == 0))
    surv.foreach(r => assert(r.getLong(0) == before(r.getLong(1))))
  }

  test("SQL MERGE: matched rows keep ids, inserted rows get fresh unique ids") {
    spark.sql("CREATE TABLE rt.db.d (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.d SELECT id, id FROM range(0, 200)")
    val before = spark.sql(
      "SELECT _graft_row_id AS rid, k FROM rt.db.d").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    spark.range(150, 260).toDF("k")
      .withColumn("v", $"k" * 100).createOrReplaceTempView("rt_src")
    spark.sql(
      """MERGE INTO rt.db.d t USING rt_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin)
    val after = spark.sql(
      "SELECT _graft_row_id AS rid, k, v FROM rt.db.d").collect()
    assert(after.length == 260)
    assert(after.map(_.getLong(0)).distinct.length == 260,
      "ids must stay unique after MERGE inserts")
    after.foreach { r =>
      val k = r.getLong(1)
      if (k < 200) {
        assert(r.getLong(0) == before(k), s"MERGE changed the id of k=$k")
        if (k >= 150) assert(r.getLong(2) == k * 100)
      } else {
        assert(!before.values.toSet.contains(r.getLong(0)) ||
          !before.contains(k))
        assert(r.getLong(2) == k * 100)
      }
    }
  }

  test("path API: option-enabled first write; DV + COW deletes preserve") {
    val root = java.nio.file.Files.createTempDirectory("clrt_p").toString
    spark.range(0, 400).toDF("k").withColumn("v", $"k" * 2)
      .write.format("commitlog").option("path", root)
      .option("rowTracking", "true").mode("append").save()
    assert(CommitLog.tblPropsOf(root, CommitLog.latestVersion(root))
      .get("graft.rowTracking").contains("true"),
      "first write must record the property")
    val t = spark.read.format("commitlog").option("path", root).load()
    assert(t.schema.fieldNames.toSeq == Seq("k", "v"))
    val before = t.select(col("_graft_row_id").as("rid"), $"k").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(before.size == 400 && before.values.toSet.size == 400)
    // sparse delete → DV leg (no rewrite): ids trivially preserved
    CommitLogDml.delete(spark, root, "k = 7", changeFeed = false)
    // dense delete → COW leg: the rewrite must carry the hidden column
    CommitLogDml.delete(spark, root, "k % 2 = 0", changeFeed = false)
    val surv = spark.read.format("commitlog").option("path", root).load()
      .select(col("_graft_row_id").as("rid"), $"k").collect()
    assert(surv.length == (0 until 400).count(k => k != 7 && k % 2 != 0))
    surv.foreach(r => assert(r.getLong(0) == before(r.getLong(1)),
      s"COW delete changed the id of k=${r.getLong(1)}"))
  }

  test("refusals: late enablement, user column, streaming, path merge") {
    // enabling on a table that already holds data refuses (no backfill)
    val root = java.nio.file.Files.createTempDirectory("clrt_r").toString
    spark.range(0, 10).toDF("k")
      .write.format("commitlog").option("path", root).mode("append").save()
    val e1 = intercept[Exception] {
      spark.range(10, 20).toDF("k")
        .write.format("commitlog").option("path", root)
        .option("rowTracking", "true").mode("append").save()
    }
    assert(e1.getMessage.contains("ENABLED while"))
    spark.sql("CREATE TABLE rt.db.r (k BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.r SELECT id FROM range(0, 5)")
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE rt.db.r2 (k BIGINT) TBLPROPERTIES ('a'='b')")
      spark.sql("INSERT INTO rt.db.r2 SELECT id FROM range(0, 5)")
      spark.sql(
        "ALTER TABLE rt.db.r2 SET TBLPROPERTIES ('graft.rowTracking'='true')")
    }
    assert(e2.getMessage.contains("ENABLED while"))
    // a writer-supplied column under the reserved name refuses
    val e3 = intercept[Exception] {
      val fresh = java.nio.file.Files.createTempDirectory("clrt_u").toString
      spark.range(3).toDF("_graft_row_id")
        .write.format("commitlog").option("path", fresh)
        .option("rowTracking", "true").mode("append").save()
    }
    assert(e3.getMessage.contains("reserved"))
  }

  test("path-API merge: matched rows keep ids, inserts allocate fresh (both legs)") {
    for ((frac, legTag) <- Seq(0.9 -> "dv", 0.0001 -> "cow")) {
      val root = java.nio.file.Files.createTempDirectory(s"clrt_m$legTag")
        .toString
      spark.range(0, 300).toDF("k").withColumn("v", $"k")
        .write.format("commitlog").option("path", root)
        .option("rowTracking", "true").mode("append").save()
      val before = spark.read.format("commitlog").option("path", root).load()
        .select(col("_graft_row_id").as("rid"), $"k").collect()
        .map(r => r.getLong(1) -> r.getLong(0)).toMap
      // U on 150..299 (matched) + 300..349 (inserts), D on 0..9
      val src = spark.range(150, 350).toDF("k").withColumn("v", $"k" * 100)
        .withColumn("_op", lit("U"))
        .unionByName(spark.range(0, 10).toDF("k").withColumn("v", lit(0L))
          .withColumn("_op", lit("D")))
      val st = graft.sources.CommitLogMerge.merge(
        spark, root, src, Seq("k"), dvFraction = frac)
      assert(st.leg == legTag, s"expected the $legTag leg, got ${st.leg}")
      val after = spark.read.format("commitlog").option("path", root).load()
        .select(col("_graft_row_id").as("rid"), $"k", $"v").collect()
      assert(after.length == 290 + 50)
      assert(after.map(_.getLong(0)).distinct.length == after.length,
        s"[$legTag] ids must stay unique through the merge")
      after.foreach { r =>
        val k = r.getLong(1)
        if (k < 300) assert(r.getLong(0) == before(k),
          s"[$legTag] merge changed the id of k=$k")
        if (k >= 150) assert(r.getLong(2) == k * 100)
      }
    }
  }

  test("atomic CTAS with rowTracking mints ids in the staged write") {
    spark.sql("CREATE TABLE rt.db.ct TBLPROPERTIES " +
      "('graft.rowTracking'='true') AS SELECT id AS k FROM range(0, 80)")
    assert(spark.table("rt.db.ct").schema.fieldNames.toSeq == Seq("k"))
    val got = ids("rt.db.ct")
    assert(got.size == 80, "CTAS rows must carry unique row ids")
  }

  test("the change feed serves tracked tables; ZORDER keeps ids") {
    spark.sql("CREATE TABLE rt.db.f (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.f SELECT id, id FROM range(0, 100)")
    spark.sql("UPDATE rt.db.f SET v = -1 WHERE k % 9 = 0")
    // MOR update = DV delete + insert in the feed — sign-exact under
    // the retraction fold, and the extra physical column in the delta
    // batch never surfaces
    val ch = spark.sql(
      "SELECT _change_type, count(*) AS n FROM rt.db.f.changes " +
        "VERSION AS OF 3 GROUP BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val touched = (0 until 100).count(_ % 9 == 0)
    assert(ch.get("delete").contains(touched.toLong), ch)
    assert(ch.get("insert").contains(touched.toLong), ch)
    // the feed CARRIES the row id: the update reads as delete+insert
    // with the SAME id per row — foldable by identity, no key needed
    val byId = spark.sql(
      "SELECT _graft_row_id AS rid, _change_type AS ct " +
        "FROM rt.db.f.changes VERSION AS OF 3").collect()
      .groupBy(_.getLong(0)).map { case (rid, rs) =>
        rid -> rs.map(_.getString(1)).sorted.toSeq }
    assert(byId.size == touched,
      s"expected $touched distinct updated ids, got ${byId.size}")
    byId.foreach { case (rid, cts) =>
      assert(cts == Seq("delete", "insert"),
        s"id $rid must retract and re-insert, got $cts")
    }
    // ZORDER re-layout carries every id (fresh DV-free table — the
    // clustered rewrite refuses outstanding deletion vectors)
    spark.sql("CREATE TABLE rt.db.fz (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.fz SELECT id, id FROM range(0, 100)")
    spark.sql("INSERT INTO rt.db.fz SELECT id, id FROM range(100, 200)")
    val before = spark.sql(
      "SELECT _graft_row_id AS rid, k FROM rt.db.fz").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    CommitLogOptimize.optimizeClustered(
      spark, s"$wh/db/fz", Seq("k"), buckets = 2)
    val after = spark.sql(
      "SELECT _graft_row_id AS rid, k FROM rt.db.fz").collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(after == before, "ZORDER must carry ids through the re-layout")
  }

  test("the property dominates the write option; DDL reserves the name") {
    // option("rowTracking","false") must not smuggle id-less files
    // into a tracked table
    spark.sql("CREATE TABLE rt.db.dom (k BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    val root = s"$wh/db/dom"
    spark.range(0, 30).toDF("k")
      .write.format("commitlog").option("path", root)
      .option("rowTracking", "false").mode("append").save()
    assert(ids("rt.db.dom").size == 30,
      "a tracked table's writes always carry ids, option or not")
    // RENAME/ADD COLUMN cannot squat the reserved name
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE rt.db.dom RENAME COLUMN k TO _graft_row_id")
    }
    assert(e1.getMessage.contains("reserved"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE rt.db.dom ADD COLUMN _graft_row_id BIGINT")
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("the STREAMING change feed carries row ids across an update") {
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE TABLE rt.db.sf (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.sf SELECT id, id FROM range(0, 60)")
    spark.sql("UPDATE rt.db.sf SET v = -1 WHERE k % 6 = 0") // delta leg
    val ckpt = java.nio.file.Files.createTempDirectory("clrt_sck").toString
    val q = spark.readStream.format("commitlog")
      .option("path", s"$wh/db/sf")
      .option("readChangeFeed", true).option("startingVersion", 1)
      .load()
      .writeStream.format("memory").queryName("rt_sf_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("rt_sf_sink")
      .select($"_graft_row_id".as("rid"), $"k", $"_change_type").collect()
    assert(rows.forall(!_.isNullAt(0)), "every feed row must carry its id")
    // an updated id shows three feed rows (v2 insert, v3 delete +
    // re-insert), an untouched one exactly its v2 insert — folding the
    // feed BY IDENTITY reconstructs the table
    val byId = rows.groupBy(_.getLong(0))
    assert(byId.size == 60, s"expected 60 distinct ids, got ${byId.size}")
    val (tri, mono) = byId.partition(_._2.length == 3)
    assert(tri.size == 10 && mono.forall(_._2.length == 1),
      byId.view.mapValues(_.length).toMap.toString)
    tri.values.foreach(rs => assert(
      rs.map(_.getString(2)).sorted.toSeq == Seq("delete", "insert", "insert")))
  }

  test("a TRACKED table with a VARIANT column serves the feed (delta routing)") {
    // untracked variant tables refuse COW feed versions (variant is
    // not comparable, the EXCEPT-ALL diff cannot run) — but a TRACKED
    // table routes row-level DML through the delta leg, whose feed
    // synthesizes from DV positions + insert files with NO diff join:
    // variant + row tracking compose into a fully servable feed
    spark.sql("CREATE TABLE rt.db.v (k BIGINT, v VARIANT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.v SELECT id, " +
      "parse_json(format_string('{\"n\":%d}', id)) FROM range(0, 40)")
    spark.sql(
      """UPDATE rt.db.v SET v = parse_json('{"n":-1}') WHERE k % 8 = 0""")
    val ch = spark.sql(
      "SELECT _graft_row_id AS rid, _change_type AS ct, " +
        "variant_get(v, '$.n', 'long') AS n " +
        "FROM rt.db.v.changes VERSION AS OF 3").collect()
    assert(ch.length == 10) // 5 deletes + 5 re-inserts
    assert(ch.forall(!_.isNullAt(0)))
    ch.foreach { r =>
      if (r.getString(1) == "insert") assert(r.getLong(2) == -1L)
      else assert(r.getLong(2) % 8 == 0)
    }
  }

  test("RESTORE rolls the watermark back with the rows it covers") {
    spark.sql("CREATE TABLE rt.db.e (k BIGINT) " +
      "TBLPROPERTIES ('graft.rowTracking'='true')")
    spark.sql("INSERT INTO rt.db.e SELECT id FROM range(0, 100)") // v2
    val root = s"$wh/db/e"
    val hwmAtV2 = CommitLog.tblPropsOf(root, 2)
      .get("graft.identityHwm._graft_row_id").map(_.toLong)
    assert(hwmAtV2.nonEmpty && hwmAtV2.get >= 99L)
    spark.sql("INSERT INTO rt.db.e SELECT id FROM range(100, 200)") // v3
    CommitLog.restore(root, 2) // v4 = the v2 content again
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.tblPropsOf(root, v)
      .get("graft.identityHwm._graft_row_id").map(_.toLong) == hwmAtV2,
      "restore must roll the row-id watermark back with the rows")
    // and new appends continue uniquely from the rolled-back watermark
    spark.sql("INSERT INTO rt.db.e SELECT id FROM range(200, 250)")
    assert(ids("rt.db.e").size == 150)
  }
}
