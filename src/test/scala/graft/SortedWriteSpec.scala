package graft

import graft.queries.Qh
import graft.sources.{CommitLog, CommitLogDml, CommitLogWrite}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Declared WRITE SORT ORDER (`option("sortOrder", …)` or the
  * `graft.write.sortOrder` table property): the sink requests an
  * ordered (range) distribution and publishes one batch per task file
  * in ONE atomic commit, so the log's per-batch stats boxes — its
  * pruning granularity — are born mutually DISJOINT on the sort key.
  * A point/range filter then plans only the files that can hold it,
  * with zero read-path changes: data lands pre-clustered instead of
  * needing a post-hoc OPTIMIZE ZORDER pass. */
class SortedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clsort_$tag").toString

  private def planned(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    Qh.flattenPlan(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum
  }

  // shuffled keys: without the requested range distribution every
  // task would see the full key range and every box would overlap
  private def shuffled(n: Int) =
    spark.range(0, n).toDF("id")
      .withColumn("k", pmod(($"id" * 2654435761L), lit(n.toLong)))
      .withColumn("v", $"k" * 1.5)
      .repartition(8)

  test("sorted write publishes range-disjoint batches in one commit") {
    val root = freshRoot("disjoint")
    shuffled(100000).write.format("commitlog").option("path", root)
      .option("sortOrder", "k").option("sortBuckets", "8")
      .mode("append").save()
    // one COMMIT (atomicity), several batches (pruning granularity)
    assert(CommitLog.latestVersion(root) == 1)
    val batches = CommitLog.files(root, 1)
    assert(batches.length == 8, s"expected 8 sorted batches, got $batches")
    // the k boxes are pairwise disjoint — the write was range-clustered
    val boxes = CommitLog.statsOf(root, 1).toSeq
      .flatMap { case (b, cols) => cols.get("k").flatMap(_.box).map(b -> _) }
      .sortBy(_._2._1)
    assert(boxes.length == batches.length, "every batch carries a k box")
    boxes.sliding(2).foreach {
      case Seq((b1, (_, hi1)), (b2, (lo2, _))) =>
        assert(hi1 <= lo2, s"boxes overlap: $b1 hi=$hi1 vs $b2 lo=$lo2")
      case _ => ()
    }
    // full read-back is value-complete
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.agg(sum($"k")).head().getLong(0)
      == (0L until 100000L).sum)
    // a point filter plans exactly ONE file of the many
    val one = spark.read.format("commitlog").option("path", root).load()
      .filter($"k" === 37L)
    assert(planned(one) == 1,
      s"point filter planned ${planned(one)} of ${batches.length} files")
    // and a range filter plans a strict subset
    val range = spark.read.format("commitlog").option("path", root).load()
      .filter($"k" >= 0L && $"k" < (100000L / 16))
    assert(planned(range) < batches.length)
  }

  test("graft.write.sortOrder table property drives every writer") {
    val wh = freshRoot("prop_wh")
    spark.conf.set("spark.sql.catalog.sw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sw.db")
    spark.sql("CREATE TABLE sw.db.t (id BIGINT, k BIGINT, v DOUBLE) " +
      s"TBLPROPERTIES('${CommitLogWrite.SortOrderProp}'='k', " +
      s"'${CommitLogWrite.SortBucketsProp}'='6')")
    shuffled(40000).select($"id", $"k", $"v")
      .writeTo("sw.db.t").append()
    val root = s"$wh/db/t"
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.files(root, v).length == 6,
      "property-declared sort order must split the publish")
    val boxes = CommitLog.statsOf(root, v).values
      .flatMap(_.get("k").flatMap(_.box)).toSeq.sortBy(_._1)
    boxes.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
    // SQL readers prune through the same boxes
    val one = spark.sql("SELECT v FROM sw.db.t WHERE k = 123")
    assert(planned(one) == 1)
    assert(spark.sql("SELECT sum(k) FROM sw.db.t").head().getLong(0)
      == (0L until 40000L).sum)
  }

  test("DML and OPTIMIZE compose with a sorted multi-batch table") {
    val root = freshRoot("dml")
    shuffled(20000).write.format("commitlog").option("path", root)
      .option("sortOrder", "k").option("sortBuckets", "5")
      .mode("append").save()
    assert(CommitLog.files(root, 1).length == 5)
    // OPTIMIZE treats the sorted batches like any small batches: one
    // layout-only pack (a sorted LAYOUT is a pruning hint, not a
    // contract the packer must preserve)
    val res = graft.sources.CommitLogOptimize.optimize(
      spark, root, smallBytes = Long.MaxValue)
    assert(res.packed.isDefined && res.sources.length == 5,
      s"expected the 5 sorted batches to pack, got $res")
    val packed = spark.read.format("commitlog").option("path", root).load()
    assert(packed.count() == 20000)
    // sparse delete → DV leg; dense delete → COW — both legs read back
    CommitLogDml.delete(spark, root, "k % 100 = 0", changeFeed = false)
    assert(spark.read.format("commitlog").option("path", root).load()
      .count() == 20000 - 200)
    CommitLogDml.delete(spark, root, "k % 2 = 1", changeFeed = false)
    val after = spark.read.format("commitlog").option("path", root).load()
    assert(after.count() ==
      (0L until 20000L).count(k => k % 100 != 0 && k % 2 == 0))
  }

  test("unknown sortOrder column is refused before any byte lands") {
    val root = freshRoot("reject")
    val e = intercept[Exception] {
      shuffled(100).write.format("commitlog").option("path", root)
        .option("sortOrder", "nope").mode("append").save()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("sortOrder"))
    assert(!new java.io.File(root).exists() ||
      CommitLog.latestVersion(root) == 0)
  }

  test("a plain write stays single-batch (no behavior change)") {
    val root = freshRoot("plain")
    shuffled(20000).write.format("commitlog").option("path", root)
      .mode("append").save()
    assert(CommitLog.files(root, 1).length == 1)
  }

  test("INSERT OVERWRITE keeps the declared range-disjoint layout") {
    val root = freshRoot("ovr")
    shuffled(30000).write.format("commitlog").option("path", root)
      .option("sortOrder", "k").option("sortBuckets", "4")
      .mode("append").save()
    assert(CommitLog.files(root, 1).length == 4)
    // rebuild the table: the overwrite leg must split too, not
    // collapse the layout back to one all-spanning box
    shuffled(30000).withColumn("v", $"v" * 2)
      .write.format("commitlog").option("path", root)
      .option("sortOrder", "k").option("sortBuckets", "4")
      .mode("overwrite").save()
    val v = CommitLog.latestVersion(root)
    val batches = CommitLog.files(root, v)
    assert(batches.length == 4, s"overwrite collapsed the layout: $batches")
    val boxes = CommitLog.statsOf(root, v).values
      .flatMap(_.get("k").flatMap(_.box)).toSeq.sortBy(_._1)
    boxes.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
    val one = spark.read.format("commitlog").option("path", root).load()
      .filter($"k" === 41L)
    assert(planned(one) == 1)
    assert(spark.read.format("commitlog").option("path", root).load()
      .count() == 30000)
  }

  test("sortBuckets on a partitioned table is refused loudly") {
    val wh = freshRoot("pb_wh")
    spark.conf.set("spark.sql.catalog.swp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.swp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS swp.db")
    spark.sql("CREATE TABLE swp.db.p (id BIGINT, k BIGINT, region STRING) " +
      "PARTITIONED BY (region) " +
      s"TBLPROPERTIES('${CommitLogWrite.SortOrderProp}'='k', " +
      s"'${CommitLogWrite.SortBucketsProp}'='8')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO swp.db.p VALUES (1, 1, 'eu')")
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("unpartitioned"))
  }

  test("a streaming sink into a sort-ordered table still works (sorted files, one epoch batch)") {
    val root = freshRoot("stream")
    // declare the layout first (empty table with the property) via a
    // seed write — the property rides the log
    spark.range(0, 1).toDF("id").withColumn("k", $"id").withColumn("v", $"id" * 1.0)
      .write.format("commitlog").option("path", root)
      .option("sortOrder", "k").mode("append").save()
    // the table property leg for streams: set it through the log API
    // is catalog-only, so pass the option on the stream instead
    val src = freshRoot("stream_src")
    shuffled(5000).write.mode("overwrite").parquet(src)
    val ckpt = freshRoot("stream_ckpt")
    val q = spark.readStream.schema(
      spark.read.parquet(src).schema).parquet(src)
      .writeStream.format("commitlog").option("path", root)
      .option("sortOrder", "k")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.count() == 5001)
    assert(back.agg(sum($"k")).head().getLong(0) == (0L until 5000L).sum)
    // the epoch still publishes as ONE txn batch (replay contract)
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.files(root, v).count(_.startsWith("txn-")) == 1)
  }

  test("rival sorted writes linearize through the optimistic commit loop") {
    val root = freshRoot("race")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (0 until 3).map { i =>
      Future {
        spark.range(i * 10000, (i + 1) * 10000).toDF("id")
          .withColumn("k", pmod($"id" * 2654435761L, lit(30000L)))
          .withColumn("v", $"k" * 1.5)
          .repartition(4)
          .write.format("commitlog").option("path", root)
          .option("sortOrder", "k").option("sortBuckets", "3")
          .mode("append").save()
      }
    }
    writes.foreach(Await.result(_, 120.seconds))
    // three commits, dense versions, every row exactly once
    assert(CommitLog.latestVersion(root) == 3)
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.count() == 30000)
    assert(back.select(countDistinct($"id")).head().getLong(0) == 30000)
    // 9 batches total (3 per write), each with a k box
    assert(CommitLog.files(root, 3).length == 9)
    assert(CommitLog.statsOf(root, 3).values.count(_.contains("k")) == 9)
  }

  test("an empty sortOrder option falls through to the table property") {
    val wh = freshRoot("empty_wh")
    spark.conf.set("spark.sql.catalog.swe", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.swe.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS swe.db")
    spark.sql("CREATE TABLE swe.db.t (id BIGINT, k BIGINT, v DOUBLE) " +
      s"TBLPROPERTIES('${CommitLogWrite.SortOrderProp}'='k', " +
      s"'${CommitLogWrite.SortBucketsProp}'='3')")
    // a framework passing an unset config as "" must not mask the
    // table's declared layout
    shuffled(9000).select($"id", $"k", $"v")
      .writeTo("swe.db.t").option("sortOrder", "").append()
    val root = s"$wh/db/t"
    assert(CommitLog.files(root, CommitLog.latestVersion(root)).length == 3)
  }
}
