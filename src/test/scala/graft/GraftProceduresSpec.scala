package graft

import graft.sources.CommitLog
import org.apache.spark.sql.functions._

/** The maintenance verbs as SQL (`CALL <cat>.system.<verb>` — Spark 4
  * DSv2 stored procedures via GraftCatalog+GraftProcedures): history,
  * optimize (both legs), vacuum (real sweep), restore, clone, and the
  * unknown-procedure refusal. The s51 decl oracle-checks the full
  * lifecycle; this suite pins the verbs individually. */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("proc_wh").toString
    spark.conf.set("spark.sql.catalog.gtp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtp.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtp.db")
    d
  }

  private def mkTable(name: String, inserts: Int = 3): String = {
    val warehouse = wh // force catalog registration first
    spark.sql(s"CREATE TABLE gtp.db.$name (k BIGINT, v DOUBLE)")
    (1 to inserts).foreach { i =>
      spark.sql(s"INSERT INTO gtp.db.$name " +
        s"SELECT id, id * 1.5 FROM range(${i * 10}, ${i * 10 + 5})")
    }
    s"$warehouse/db/$name"
  }

  test("history returns the audit trail; optimize compacts and is dataChange=false") {
    mkTable("t1")
    val opt = spark.sql("CALL gtp.system.optimize(tbl => 'db.t1', " +
      "small_bytes => 1073741824)").head()
    assert(opt.getInt(1) == 3) // three insert batches packed
    val h = spark.sql("CALL gtp.system.history(tbl => 'db.t1')")
      .select("version", "operation", "n_added", "n_removed", "data_change")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getBoolean(4)))
    assert(h.toSeq == Seq(
      (1, "CREATE TABLE", 0, 0, true),
      (2, "WRITE", 1, 0, true), (3, "WRITE", 1, 0, true),
      (4, "WRITE", 1, 0, true), (5, "OPTIMIZE", 1, 3, false)))
    assert(spark.table("gtp.db.t1").count() == 15)
  }

  test("optimize with zorder_by takes the clustered leg") {
    mkTable("t2")
    val r = spark.sql("CALL gtp.system.optimize(tbl => 'db.t2', " +
      "zorder_by => 'k,v', buckets => 2)").head()
    assert(r.getInt(1) == 3) // all three batches re-clustered
    assert(spark.table("gtp.db.t2").count() == 15)
    assert(spark.table("gtp.db.t2").agg(sum($"k")).head().getLong(0) ==
      (10 to 14).sum + (20 to 24).sum + (30 to 34).sum)
  }

  test("restore rolls back; vacuum (real) then expires the undone history") {
    val root = mkTable("t3")
    spark.sql("CALL gtp.system.restore(tbl => 'db.t3', version => 3)")
    assert(spark.table("gtp.db.t3").count() == 10) // first two inserts
    // real sweep: keep the last 2 versions, min age 0 — the v4 insert
    // batch is now referenced by no retained manifest and is swept
    val vac = spark.sql("CALL gtp.system.vacuum(tbl => 'db.t3', " +
      "keep_last => 2, min_age_ms => 0)").head()
    assert(vac.getInt(0) > 0, "expected expired manifests")
    assert(spark.table("gtp.db.t3").count() == 10)
    // expired versions are gone from history (time travel parity)
    val minV = spark.sql("CALL gtp.system.history(tbl => 'db.t3')")
      .agg(min($"version")).head().getInt(0)
    assert(minV == CommitLog.latestVersion(root) - 1)
  }

  test("clone creates a zero-copy table readable at the cloned version") {
    mkTable("t4", inserts = 2)
    val c = spark.sql("CALL gtp.system.clone(tbl => 'db.t4', " +
      "target => 'db.t4c')").head()
    assert(c.getInt(0) == 1)
    assert(spark.table("gtp.db.t4c").count() == 10)
    // clone is independent: appends to the source don't leak in
    spark.sql("INSERT INTO gtp.db.t4 SELECT id, 0.0 FROM range(5)")
    assert(spark.table("gtp.db.t4c").count() == 10)
  }

  test("unknown procedures are refused with the available list") {
    mkTable("t5", inserts = 1)
    val e = intercept[Exception] {
      spark.sql("CALL gtp.system.zap(tbl => 'db.t5')").collect()
    }
    assert(e.getMessage.contains("optimize") ||
      Option(e.getCause).exists(_.getMessage.contains("optimize")))
  }

  test("detail returns the metadata-sized table summary") {
    val root = mkTable("t7")
    spark.sql("ALTER TABLE gtp.db.t7 SET TBLPROPERTIES(" +
      s"'${graft.sources.CommitLogWrite.SortOrderProp}'='k', 'team'='x')")
    val d = spark.sql("CALL gtp.system.detail(tbl => 'db.t7')").head()
    assert(d.getAs[String]("format") == "commitlog")
    assert(d.getAs[String]("location") == root)
    assert(d.getAs[Int]("num_batches") == 3)
    assert(d.getAs[Long]("num_rows") == 15L)
    assert(d.getAs[Long]("size_bytes") > 0L)
    assert(d.getAs[String]("partition_columns") == "")
    assert(d.getAs[String]("sort_order") == "k")
    assert(d.getAs[Int]("num_properties") == 2)
    assert(d.getAs[Int]("num_constraints") == 0)
  }

  test("optimize defaults its clustering to the declared write sort order") {
    val warehouse = wh
    spark.sql("CREATE TABLE gtp.db.t6 (k BIGINT, v DOUBLE) TBLPROPERTIES(" +
      s"'${graft.sources.CommitLogWrite.SortOrderProp}'='k')")
    // three overlapping UNSORTED inserts (plain INSERT order, full key
    // range each) — each batch's k box spans everything
    (0 until 3).foreach { i =>
      spark.sql("INSERT INTO gtp.db.t6 " +
        s"SELECT id * 7919 % 3000, id * 1.5 FROM range(${i * 1000}, ${i * 1000 + 1000})")
    }
    val root = s"$warehouse/db/t6"
    // bare optimize (no zorder_by) must take the CLUSTERED leg on the
    // declared sort column, not collapse to one all-spanning pack
    spark.sql("CALL gtp.system.optimize(tbl => 'db.t6', buckets => 4)")
      .collect()
    val v = CommitLog.latestVersion(root)
    val batches = CommitLog.files(root, v)
    assert(batches.length > 1, s"expected a clustered rewrite, got $batches")
    val boxes = CommitLog.statsOf(root, v).values
      .flatMap(_.get("k").flatMap(_.box)).toSeq.sortBy(_._1)
    assert(boxes.length == batches.length)
    boxes.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"optimize left overlapping k boxes: $boxes")
      case _ => ()
    }
    assert(spark.table("gtp.db.t6").count() == 3000)
  }
}
