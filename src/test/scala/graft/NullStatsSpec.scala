package graft

import graft.sources.CommitLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** PER-COLUMN NULL COUNTS in manifest stats (r15) — the third planning
  * facet next to boxes and blooms. The sink counts nulls for every
  * column in the same pass the boxes ride (an unboxable column —
  * string, composite, all-null — carries the count on an UNBOXED
  * entry); three consumers answer from it:
  *
  *  - `IS NULL` prunes batches with a proven-zero null count, and
  *    `IS NOT NULL` (pushed implicitly for nearly every filter and
  *    join key) prunes provably all-null batches;
  *  - metadata COUNT(col) = Σ (rows − nulls), zero data reads;
  *  - the top-N cut bounds NULLABLE sort columns without a NOT NULL
  *    proof (TopNPushdownSpec pins that side).
  */
class NullStatsSpec extends SparkSpec {
  import spark.implicits._

  private def planned(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum

  /** Three one-file batches: all-null v, mixed v, null-free v. */
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    def app(df: DataFrame): Unit =
      df.repartition(1).write.format("commitlog")
        .option("path", r).mode("append").save()
    app(spark.range(0, 50).select($"id", lit(null).cast("double").as("v"),
      lit(null).cast("string").as("s")))
    app(spark.range(50, 80).select($"id",
      when($"id" % 3 === 0, $"id".cast("double")).as("v"),
      when($"id" % 2 === 0, concat(lit("k"), $"id")).as("s")))
    app(spark.range(80, 100).select($"id", $"id".cast("double").as("v"),
      concat(lit("k"), $"id").as("s")))
    r
  }

  private def tbl = spark.read.format("commitlog").option("path", root).load()

  test("IS NULL prunes proven-null-free batches; IS NOT NULL prunes all-null ones") {
    val isNull = tbl.filter($"v".isNull)
    assert(planned(isNull) == 2,
      s"batch 3 has zero nulls in v — IS NULL must prune it: ${planned(isNull)}")
    assert(isNull.count() == 50 + 20)
    val notNull = tbl.filter($"v".isNotNull)
    assert(planned(notNull) == 2,
      s"batch 1 is all-null in v — IS NOT NULL must prune it: ${planned(notNull)}")
    assert(notNull.count() == 10 + 20)
    // string column: null counts ride UNBOXED entries
    val sNotNull = tbl.filter($"s".isNotNull)
    assert(planned(sNotNull) == 2,
      "all-null string batch must prune on IS NOT NULL")
    assert(sNotNull.count() == 15 + 20)
  }

  test("metadata COUNT(col) answers from rows minus nulls, zero data reads") {
    val r = tbl.agg(count($"v").as("nv"), count($"s").as("ns"),
      count(lit(1)).as("n")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((30L, 35L, 100L)))
    // the aggregate is served from the manifest: the scan is the
    // metadata-agg local scan, not a parquet read
    val plan = tbl.agg(count($"v")).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("parquet"),
      s"COUNT(col) should answer from metadata:\n$plan")
    // grouped by partition tuple it composes with the existing
    // tuple-keyed metadata aggregate machinery (global here)
    assert(tbl.filter($"id" >= 0).agg(count($"v")).head().getLong(0) == 30L,
      "filtered aggregates fall back to data reads, exactly")
  }

  test("nulls-first top-N keeps null-bearing batches and prunes the rest") {
    // ASC default = NULLS FIRST: the 50-row all-null batch alone
    // covers k=3, so only null-bearing batches survive the cut
    val q = tbl.orderBy($"v".asc).limit(3)
    assert(planned(q) == 2,
      s"all-null + mixed batches compete; null-free prunes: ${planned(q)}")
    assert(q.select($"v").collect().forall(_.isNullAt(0)))
    // ASC NULLS LAST: bound over non-null counts — smallest values
    // live in the mixed batch (51.0 at id=51? — v = id where id%3==0:
    // 51, 54, ...), so the cut keeps batches whose box reaches the
    // bound; the all-null batch is prunable (its rows sort last)
    val nl = tbl.orderBy($"v".asc_nulls_last).limit(3)
    assert(planned(nl) <= 2 && planned(nl) >= 1,
      s"all-null batch must prune under NULLS LAST: ${planned(nl)}")
    assert(nl.select($"v").as[Double].collect().toSeq ==
      Seq(51.0, 54.0, 57.0))
  }

  test("null counts survive OPTIMIZE packing and COW restatement") {
    val r2 = java.nio.file.Files.createTempDirectory("graft_nopt").toString
    (0 until 4).foreach { i =>
      spark.range(i * 10L, i * 10L + 10L)
        .select($"id", when($"id" % 5 === 0, $"id".cast("double")).as("v"))
        .repartition(1).write.format("commitlog")
        .option("path", r2).mode("append").save()
    }
    def cnt = spark.read.format("commitlog").option("path", r2).load()
      .agg(count($"v")).head().getLong(0)
    assert(cnt == 8L)
    graft.sources.CommitLogOptimize.optimize(spark, r2, smallBytes = 1L << 30)
    // the packed batch's merged entry must still answer COUNT exactly
    assert(cnt == 8L, "null counts must merge through the OPTIMIZE pack")
    val plan = spark.read.format("commitlog").option("path", r2).load()
      .agg(count($"v")).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("parquet"),
      s"post-OPTIMIZE COUNT(col) should stay metadata-served:\n$plan")
  }
}
