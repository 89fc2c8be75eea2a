package graft

import graft.sources.{CommitLog, CommitLogAggScan, CommitLogDml,
  CommitLogOptimize, CommitLogScan, CommitLogWrite}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** EXACT SUM facet (SURVEY S79): the sink records the exact non-null
  * sum of every integral column per batch (stats-grammar field 9), so
  * unfiltered `SUM(col)` / `AVG(col)` — global or grouped by partition
  * columns — answer from the manifest with zero data reads, riding the
  * same DSv2 complete aggregate pushdown as COUNT/MIN/MAX. Soundness
  * discipline: the facet is exact-or-absent (long overflow at write,
  * at the task union, at the OPTIMIZE pack or at plan-time merge drops
  * it — never wraps), SQL NULL-ness comes from the null counts (sum
  * alone cannot distinguish all-null from zero-sum), and every path
  * that invalidates it (DVs, purge rewrites, pre-S79 batches) falls
  * back to the ordinary scan.
  */
class SumStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_sum").toString

  private def snap(root: String) =
    spark.read.format("commitlog").option("path", root).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): Seq[BatchScanExec] =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }

  private def metadataServed(df: org.apache.spark.sql.DataFrame): Boolean = {
    val s = scanOf(df)
    s.nonEmpty && s.forall(_.scan.isInstanceOf[CommitLogAggScan])
  }

  test("SUM and AVG answer from the manifest: metadata scan, exact values") {
    val root = tmp()
    (0 until 3).foreach { b =>
      spark.range(b * 100, (b + 1) * 100)
        .select($"id".as("k"), ($"id" % 7).cast("int").as("v"))
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    val agg = snap(root).agg(
      sum($"k").as("sk"), sum($"v").as("sv"), avg($"k").as("ak"))
    assert(metadataServed(agg), agg.queryExecution.executedPlan.toString)
    val r = agg.head()
    assert(r.getLong(0) == (0L until 300L).sum)
    assert(r.getLong(1) == (0L until 300L).map(_ % 7).sum)
    assert(r.getDouble(2) == (0L until 300L).sum.toDouble / 300.0)
  }

  test("GROUP BY partition columns composes; nulls settle SQL semantics") {
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.sum_p", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sum_p.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sum_p.db")
    spark.sql("CREATE TABLE sum_p.db.t (k BIGINT, v BIGINT, p STRING) " +
      "PARTITIONED BY (p)")
    // partition 'b' holds ONLY nulls in v: its SUM must be NULL, not 0
    spark.sql("INSERT INTO sum_p.db.t VALUES " +
      "(1, 10, 'a'), (2, 20, 'a'), (3, NULL, 'a'), " +
      "(4, NULL, 'b'), (5, NULL, 'b')")
    val byPart = spark.sql(
      "SELECT p, sum(v) AS sv, avg(v) AS av FROM sum_p.db.t GROUP BY p")
    assert(metadataServed(byPart), byPart.queryExecution.executedPlan.toString)
    val rows = byPart.collect().map(r =>
      (r.getString(0), if (r.isNullAt(1)) null else Long.box(r.getLong(1)),
        if (r.isNullAt(2)) null else Double.box(r.getDouble(2))))
      .sortBy(_._1).toSeq
    assert(rows == Seq(("a", Long.box(30L), Double.box(15.0)),
      ("b", null, null)), rows.mkString(","))
  }

  test("non-integral columns and filtered queries decline to a data scan") {
    val root = tmp()
    Seq((1L, 1.5, BigDecimal(2)), (2L, 2.5, BigDecimal(3)))
      .toDF("k", "d", "dec")
      .write.format("commitlog").option("path", root).mode("append").save()
    // double and decimal sums have no facet — ordinary scan, same answer
    val dbl = snap(root).agg(sum($"d"))
    assert(scanOf(dbl).forall(_.scan.isInstanceOf[CommitLogScan]),
      "double SUM must not claim the metadata path")
    assert(dbl.head().getDouble(0) == 4.0)
    val filtered = snap(root).filter($"k" > 1).agg(sum($"k"))
    assert(scanOf(filtered).forall(_.scan.isInstanceOf[CommitLogScan]),
      "a WHERE clause must decline the metadata path")
    assert(filtered.head().getLong(0) == 2L)
  }

  test("write-time overflow drops the facet; the scan still answers") {
    val root = tmp()
    // two maximal longs overflow the per-file accumulator mid-batch
    Seq(Long.MaxValue, Long.MaxValue, -4L).toDF("k").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val st = CommitLog.statsOf(root, CommitLog.latestVersion(root))
    assert(st.values.flatMap(_.get("k")).forall(_.sum.isEmpty),
      "an overflowed sum must be ABSENT, never wrapped")
    // plan-only check: executing this SUM is Spark's own ANSI overflow
    // business — the point here is the metadata path must not claim it
    val agg = snap(root).agg(sum($"k"))
    assert(scanOf(agg).forall(_.scan.isInstanceOf[CommitLogScan]))
    assert(snap(root).count() == 3L)

    // merge-time overflow: each batch's sum is fine, the TOTAL is not —
    // plan-time merge must decline, not wrap
    val root2 = tmp()
    Seq(Long.MaxValue - 10L).toDF("k").repartition(1)
      .write.format("commitlog").option("path", root2).mode("append").save()
    Seq(Long.MaxValue - 20L).toDF("k").repartition(1)
      .write.format("commitlog").option("path", root2).mode("append").save()
    val st2 = CommitLog.statsOf(root2, CommitLog.latestVersion(root2))
    assert(st2.values.flatMap(_.get("k")).forall(_.sum.isDefined),
      "per-batch sums are individually exact")
    val agg2 = snap(root2).agg(sum($"k"))
    assert(scanOf(agg2).forall(_.scan.isInstanceOf[CommitLogScan]),
      "an overflowing merged total must decline the metadata path")
  }

  test("task-union sums add; OPTIMIZE pack carries; purge drops") {
    val root = tmp()
    // one batch from 4 parallel tasks: parts' sums union by addition
    spark.range(0, 1000).select($"id".as("k")).repartition(4)
      .write.format("commitlog").option("path", root).mode("append").save()
    val v1 = CommitLog.latestVersion(root)
    val b1 = CommitLog.files(root, v1).head
    assert(CommitLog.statsOf(root, v1)(b1)("k").sum.contains((0L until 1000L).sum))
    // second batch, then pack: sums add across sources
    spark.range(1000, 1200).select($"id".as("k")).repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    val vp = CommitLog.latestVersion(root)
    val packed = CommitLog.files(root, vp)
    assert(packed.size == 1)
    assert(CommitLog.statsOf(root, vp)(packed.head)("k").sum
      .contains((0L until 1200L).sum), "the pack must carry the added sums")
    assert(metadataServed(snap(root).agg(sum($"k"))))
    // a DV delete declines (outstanding vectors); purge then rewrites
    // the batch and the facet DROPS on it (subset sums would lie)
    CommitLogDml.delete(spark, root, "k < 100")
    val dv = snap(root).agg(sum($"k"))
    assert(scanOf(dv).forall(_.scan.isInstanceOf[CommitLogScan]),
      "outstanding DVs must decline the metadata path")
    assert(dv.head().getLong(0) == (100L until 1200L).sum)
    CommitLogOptimize.purge(spark, root)
    val vq = CommitLog.latestVersion(root)
    assert(CommitLog.statsOf(root, vq).values.flatMap(_.get("k"))
      .forall(_.sum.isEmpty), "purge must drop the rewritten batch's sum")
    val post = snap(root).agg(sum($"k"))
    assert(scanOf(post).forall(_.scan.isInstanceOf[CommitLogScan]))
    assert(post.head().getLong(0) == (100L until 1200L).sum)
  }

  test("the facet round-trips the grammar and survives type widening") {
    val root = tmp()
    Seq(1, 2, 3).toDF("k0").select(when($"k0" > 0, $"k0").as("k"))
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val v1 = CommitLog.latestVersion(root)
    val b = CommitLog.files(root, v1).head
    val st = CommitLog.statsOf(root, v1)(b)("k")
    assert(st.sum.contains(6L) && st.nulls.contains(0L))
    // int -> bigint: the sum domain is identical, the facet carries
    CommitLog.widenColumn(root, "k", LongType)
    val agg = snap(root).agg(sum($"k"), avg($"k"))
    assert(metadataServed(agg), agg.queryExecution.executedPlan.toString)
    val r = agg.head()
    assert(r.getLong(0) == 6L && r.getDouble(1) == 2.0)
    // checkpoint replay preserves field 9
    CommitLog.writeCheckpoint(root, CommitLog.latestVersion(root))
    assert(CommitLog.statsOf(root, CommitLog.latestVersion(root))(b)("k")
      .sum.contains(6L))
  }
}
