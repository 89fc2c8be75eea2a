package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.sources.{CommitLog, CommitLogDml, CommitLogWrite}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** NOT NULL lifecycle (SURVEY S78): `ALTER COLUMN … SET/DROP NOT
  * NULL`. SET proves existing data first — zero-read when the
  * manifest's exact per-column null counts carry the proof, one
  * filtered scan otherwise — and from then on the declaration is a
  * write-time contract every publish gate enforces (path appends,
  * streaming epochs, DML postimages, MERGE legs), which is what makes
  * the planner's notNullProven fast paths (top-N, IS NULL pruning,
  * metadata COUNT) sound against writers that bypass the catalog. */
class NotNullSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"notnull_$tag").toString

  private def snap(root: String): DataFrame =
    spark.read.format("commitlog").option("path", root).load()

  private def nullableOf(root: String, col: String): Boolean =
    snap(root).schema(col).nullable

  // v2 write aborts arrive wrapped (SparkException -> cause chain)
  private def chainHas(e: Throwable, needle: String): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains(needle)))

  // launder spark.range's NOT NULL so the recorded DDL starts nullable
  // (the condition must not be foldable — `when(lit(true), c)` would
  // constant-fold back to the non-nullable input)
  private def nullableLong(c: org.apache.spark.sql.Column) =
    when(c >= Long.MinValue, c)

  test("SET NOT NULL is zero-read when exact null counts prove it") {
    val root = freshRoot("zeroread")
    (0 until 3).foreach { b =>
      spark.range(b * 100, (b + 1) * 100)
        .select(nullableLong($"id").as("k"), nullableLong($"id" * 2).as("v"))
        .repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    assert(nullableOf(root, "k"), "fixture must start nullable")
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      CommitLogWrite.setNotNull(spark, root, "k")
      // listener delivery is async — drain before asserting
      Thread.sleep(1500)
      assert(jobs.get() == 0,
        s"exact null counts must discharge the proof with ZERO Spark " +
          s"jobs, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(!nullableOf(root, "k"))
    assert(CommitLog.history(root).last.operation.contains("SET NOT NULL"))
    // idempotent no-op
    val v = CommitLog.latestVersion(root)
    CommitLogWrite.setNotNull(spark, root, "k")
    assert(CommitLog.latestVersion(root) == v)
  }

  test("SET NOT NULL refuses when nulls exist; evolution null-fills refuse") {
    val root = freshRoot("refuse")
    Seq((1L, Some("a")), (2L, None), (3L, Some("c"))).toDF("k", "s")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val e = intercept[CommitLog.ConstraintViolationException] {
      CommitLogWrite.setNotNull(spark, root, "s")
    }
    assert(e.getMessage.contains("NOT NULL (s)"))
    // a column added by evolution is null-filled in pre-evolution
    // files: no stats fact exists for it there, so the fallback scan
    // runs and correctly refuses
    Seq((4L, Some("d"), 7L)).toDF("k", "s", "extra")
      .write.format("commitlog").option("path", root).mode("append").save()
    intercept[CommitLog.ConstraintViolationException] {
      CommitLogWrite.setNotNull(spark, root, "extra")
    }
    // but deleting the offending rows makes both provable (DV-exact
    // through the reader; the stats fast path cannot see deletes)
    CommitLogDml.delete(spark, root, "s IS NULL OR extra IS NULL")
    CommitLogWrite.setNotNull(spark, root, "s")
    CommitLogWrite.setNotNull(spark, root, "extra")
    assert(!nullableOf(root, "s") && !nullableOf(root, "extra"))
  }

  test("the publish gate enforces the declaration on path appends") {
    val root = freshRoot("gate")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogWrite.setNotNull(spark, root, "s")
    // a bare path write (no catalog, no analyzer) carrying a null must
    // refuse at publish — nothing staged survives, no version consumed
    val v = CommitLog.latestVersion(root)
    val e = intercept[Exception] {
      Seq((3L, null: String)).toDF("k", "s")
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    assert(chainHas(e, "NOT NULL (s)"), s"expected the NOT NULL gate, got: $e")
    assert(CommitLog.latestVersion(root) == v, "no version consumed")
    assert(snap(root).count() == 2)
    // valid rows still publish (their exact null counts discharge the
    // gate without a scan)
    Seq((3L, "c")).toDF("k", "s")
      .write.format("commitlog").option("path", root).mode("append").save()
    assert(snap(root).count() == 3)
  }

  test("DML postimages respect the declaration; DROP NOT NULL lifts it") {
    val root = freshRoot("dml")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogWrite.setNotNull(spark, root, "s")
    intercept[CommitLog.ConstraintViolationException] {
      CommitLogDml.update(spark, root, "k = 1",
        Seq("s" -> "CAST(NULL AS STRING)"))
    }
    assert(snap(root).filter($"s".isNull).count() == 0)
    CommitLogWrite.dropNotNull(root, "s")
    assert(nullableOf(root, "s"))
    assert(CommitLog.history(root).last.operation.contains("DROP NOT NULL"))
    CommitLogDml.update(spark, root, "k = 1",
      Seq("s" -> "CAST(NULL AS STRING)"))
    assert(snap(root).filter($"s".isNull).count() == 1)
  }

  test("partition tuples discharge the gate for partition columns") {
    val wh = freshRoot("wh_part")
    spark.conf.set("spark.sql.catalog.nn_part", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.nn_part.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS nn_part.db")
    spark.sql("CREATE TABLE nn_part.db.t (k BIGINT, m BIGINT NOT NULL) " +
      "PARTITIONED BY (m)")
    // non-null partition values publish (tuple tokens prove the gate;
    // partition columns may carry no per-file stats entry)
    spark.sql("INSERT INTO nn_part.db.t SELECT id, id % 2 FROM range(0, 20)")
    assert(spark.table("nn_part.db.t").count() == 20)
  }

  test("SQL surface: set_not_null procedure + ALTER COLUMN DROP NOT NULL") {
    val wh = freshRoot("wh_sql")
    spark.conf.set("spark.sql.catalog.nn_sql", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.nn_sql.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS nn_sql.db")
    spark.sql("CREATE TABLE nn_sql.db.t (k BIGINT, s STRING)")
    spark.sql("INSERT INTO nn_sql.db.t VALUES (1, 'a'), (2, 'b')")
    // Spark's own CheckAnalysis refuses `ALTER COLUMN … SET NOT NULL`
    // on every v2 table (it cannot validate data) — tightening rides
    // the procedure, whose verb proves the data itself
    spark.sql(
      "CALL nn_sql.system.set_not_null(tbl => 'db.t', col => 's')")
    assert(!spark.table("nn_sql.db.t").schema("s").nullable)
    // inserting a null now refuses — at analysis (Spark's v2 output
    // resolver) or at the publish gate; either stops the row
    intercept[Exception] {
      spark.sql("INSERT INTO nn_sql.db.t VALUES (3, CAST(NULL AS STRING))")
    }
    assert(spark.table("nn_sql.db.t").count() == 2)
    spark.sql("ALTER TABLE nn_sql.db.t ALTER COLUMN s DROP NOT NULL")
    assert(spark.table("nn_sql.db.t").schema("s").nullable)
    spark.sql("INSERT INTO nn_sql.db.t VALUES (3, CAST(NULL AS STRING))")
    assert(spark.table("nn_sql.db.t").count() == 3)
    // a nullable declaration cannot be tightened by a plain write: the
    // recorded DDL still owns nullability after appends
    spark.sql("INSERT INTO nn_sql.db.t SELECT id, 'x' FROM range(10, 12)")
    assert(spark.table("nn_sql.db.t").schema("s").nullable)
  }

  test("time travel serves the era's nullability; widening composes") {
    val root = freshRoot("tt")
    // launder the tuple encoder's NOT NULL: the first write's plan
    // schema is what the v1 DDL records, and the era must START
    // nullable for SET NOT NULL to be the thing under test
    Seq((1, "a"), (2, "b")).toDF("k0", "s")
      .select(when($"k0" >= 0, $"k0".cast("int")).as("k"), $"s")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogWrite.setNotNull(spark, root, "k") // v2
    CommitLog.widenColumn(root, "k", LongType) // v3 — flag survives
    assert(!nullableOf(root, "k") &&
      snap(root).schema("k").dataType == LongType)
    val old = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 1).load()
    assert(old.schema("k").nullable, "pre-SET era must read nullable")
    // the gate holds under the widened type too
    intercept[Exception] {
      Seq((Option.empty[Long], "c")).toDF("k", "s")
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    assert(snap(root).count() == 2)
  }
}
