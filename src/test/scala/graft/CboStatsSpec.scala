package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge, CommitLogOptimize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._

/** CBO COLUMN STATISTICS from the manifest (SURVEY S76): the scan
  * reports per-column min/max/nullCount through DSv2
  * `Statistics.columnStats()` — zero data reads, filter-aware (pruning
  * tightens them), folded by Spark's `transformV2Stats` into the
  * relation's `attributeStats` so `FilterEstimation` range-estimates
  * filters over commitlog tables like it does over ANALYZEd ones. */
class CboStatsSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clcbo_$tag").toString

  private def snap(root: String): DataFrame =
    spark.read.format("commitlog").option("path", root).load()

  private def scanStats(df: DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec =>
        b.scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    }.get

  private def colStat(df: DataFrame, col: String) = {
    val cs = scanStats(df).columnStats()
    import scala.jdk.CollectionConverters._
    cs.asScala.collectFirst {
      case (ref, st) if ref.fieldNames().sameElements(Array(col)) => st
    }
  }

  test("full-table scan reports exact min/max/nullCount per column") {
    val root = freshRoot("basic")
    spark.range(0, 1000).toDF("id")
      .select(
        $"id",
        when($"id" % 7 === 0, lit(null)).otherwise($"id" * 2.5).as("v"))
      .repartition(3)
      .write.format("commitlog").option("path", root).mode("append").save()
    val idSt = colStat(snap(root), "id").get
    assert(idSt.min().get() == 0L && idSt.max().get() == 999L)
    assert(idSt.nullCount().getAsLong == 0L)
    // the 64-register HLL: ±13% typical, clamped by the exact non-null
    // count — 1000 distinct ids must land in the right decade
    val ndv = idSt.distinctCount().getAsLong
    assert(ndv >= 500L && ndv <= 1000L, s"ndv estimate off: $ndv")
    val vSt = colStat(snap(root), "v").get
    assert(vSt.min().get() == 2.5d && vSt.max().get() == 999L * 2.5d)
    assert(vSt.nullCount().getAsLong == 143L) // ids 0,7,…,994
  }

  test("ndv tracks low cardinality nearly exactly (linear counting)") {
    val root = freshRoot("lowcard")
    spark.range(0, 3000).toDF("id")
      .select(($"id" % 3).cast("long").as("k"))
      .repartition(4)
      .write.format("commitlog").option("path", root).mode("append").save()
    val ndv = colStat(snap(root), "k").get.distinctCount().getAsLong
    assert(ndv >= 2L && ndv <= 4L, s"3 distinct values must read ~3: $ndv")
  }

  test("stats are filter-aware: pruning tightens the reported range") {
    val root = freshRoot("prune")
    (0 until 4).foreach { i =>
      spark.range(i * 100L, (i + 1) * 100L).toDF("id").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    val full = colStat(snap(root), "id").get
    assert(full.min().get() == 0L && full.max().get() == 399L)
    val pruned = colStat(snap(root).filter($"id" >= 250), "id").get
    // the two surviving batches' merged box: [200, 399]
    assert(pruned.min().get() == 200L && pruned.max().get() == 399L,
      s"box pruning must tighten column stats: " +
        s"[${pruned.min()}, ${pruned.max()}]")
  }

  test("attributeStats reach the optimizer and drive FilterEstimation") {
    val root = freshRoot("cbo")
    spark.range(0, 1000).toDF("id").repartition(2)
      .write.format("commitlog").option("path", root).mode("append").save()
    val leafStats = snap(root).queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation => r.computeStats()
    }.get
    val attr = leafStats.attributeStats.toSeq
      .collectFirst { case (a, st) if a.name == "id" => st }
    assert(attr.isDefined, s"attributeStats must carry id: $leafStats")
    assert(attr.get.min.contains(0L) && attr.get.max.contains(999L) &&
      attr.get.nullCount.contains(BigInt(0)))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // range selectivity: id <= 99 over [0, 999] ⇒ ~10% of 1000 rows.
      // The filter does NOT prune batches (both boxes span it), so the
      // estimate is pure FilterEstimation over the reported range.
      val est = snap(root).filter($"id" <= 99)
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined && est.get >= BigInt(50) && est.get <= BigInt(200),
        s"CBO must range-estimate the filter: $est")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("an all-null batch is ignorable for min/max and counted for nulls") {
    val root = freshRoot("allnull")
    spark.range(0, 100).toDF("id")
      .select($"id", when(lit(true), lit(null)).otherwise(lit(1.0)).cast("double").as("v"))
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    spark.range(100, 200).toDF("id")
      .select($"id", when($"id" < 0, lit(null)).otherwise($"id".cast("double")).as("v"))
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val vSt = colStat(snap(root), "v").get
    assert(vSt.min().get() == 100.0d && vSt.max().get() == 199.0d,
      s"all-null batch must not poison the range: [${vSt.min()}, ${vSt.max()}]")
    assert(vSt.nullCount().getAsLong == 100L)
  }

  test("NaN-marked boxes decline min/max but keep nullCount") {
    val root = freshRoot("nan")
    Seq(1.0, Double.NaN, 3.0).toDF("v").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val vSt = colStat(snap(root), "v").get
    assert(!vSt.max().isPresent,
      "a NaN presence marker (hi=+Inf) is not a CBO bound")
    assert(vSt.nullCount().getAsLong == 0L)
  }

  test("outstanding DVs drop column stats; purge restores them") {
    val root = freshRoot("dv")
    spark.range(0, 1000).toDF("id").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    assert(colStat(snap(root), "id").isDefined)
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try CommitLogDml.delete(spark, root, "id % 10 = 3")
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    assert(CommitLog.files(root, CommitLog.latestVersion(root))
      .exists(_.startsWith(CommitLogMerge.DvPrefix)))
    assert(colStat(snap(root), "id").isEmpty,
      "deleted rows would inflate the stats — decline under DVs")
    CommitLogOptimize.purge(spark, root)
    val restored = colStat(snap(root), "id")
    // purge carries the subset-sound box (may be the original width)
    // and drops exact null counts; min/max must be back
    assert(restored.isDefined && restored.get.min().isPresent)
  }

  test("stats recorded before a RENAME answer under the new name") {
    val root = freshRoot("rename")
    spark.range(0, 500).toDF("k").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLog.renameColumn(root, "k", "key")
    val st = colStat(snap(root), "key").get
    assert(st.min().get() == 0L && st.max().get() == 499L &&
      st.nullCount().getAsLong == 0L)
  }
}
