package graft

import graft.sources.{CommitLog, CommitLogWrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** NaN SOUNDNESS of the manifest stats boxes. Spark's total order
  * puts NaN ABOVE every value including +Infinity (`NaN > 1e308` is
  * TRUE, `NaN = NaN` is TRUE), so a box that silently dropped NaN
  * would let range pruning, top-N pruning and metadata MAX skip or
  * misreport NaN rows. The writer therefore marks a NaN-bearing
  * batch with hi = +Inf ([[CommitLogWrite]] box()); read-side
  * consumers treat an infinite bound conservatively:
  *
  *  - range pruning keeps the batch for any upward probe
  *    (`bHi >= lo` with bHi = +Inf always holds);
  *  - a NaN LITERAL in a pushed filter gets NO box at all (NaN
  *    poisons Java min/max compares — every batch would prune);
  *  - metadata MIN/MAX decline on an infinite float/double bound
  *    (a genuine ±Inf value and the NaN marker are indistinguishable)
  *    and the scan reads data;
  *  - the top-N cut never prunes an infinite-hi batch in DESC, and in
  *    ASC only counts finite-hi (provably NaN-free) batches toward
  *    its bound.
  */
class NaNStatsSpec extends SparkSpec {
  import spark.implicits._

  private def planned(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum

  /** Four one-file batches: two finite, one ALL-NaN, one mixed. */
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_nan").toString
    def app(df: DataFrame): Unit =
      df.repartition(1).write.format("commitlog")
        .option("path", r).mode("append").save()
    app(spark.range(0, 100).select($"id", $"id".cast("double").as("v")))
    app(spark.range(100, 200).select($"id", $"id".cast("double").as("v")))
    app(spark.range(200, 205).select($"id", lit(Double.NaN).as("v")))
    app(spark.range(300, 311).select($"id",
      when($"id" === 300, lit(Double.NaN))
        .otherwise($"id".cast("double")).as("v")))
    r
  }

  private def tbl = spark.read.format("commitlog").option("path", root).load()

  test("upward range probe above every finite box finds the NaN rows") {
    // NaN > 1000 is TRUE in Spark; only the two NaN-marked batches may
    // serve it, and both must survive the box prune
    val q = tbl.filter($"v" > 1000.0)
    assert(planned(q) == 2,
      s"only the all-NaN and mixed batches can serve v > 1000: ${planned(q)}")
    val got = q.select($"id").as[Long].collect().sorted.toSeq
    assert(got == (200L to 204L) :+ 300L, s"NaN rows lost: $got")
  }

  test("NaN equality literal gets no box: all batches kept, rows exact") {
    val q = tbl.filter($"v" === lit(Double.NaN))
    assert(planned(q) == 4, "a NaN literal must not prune any batch")
    assert(q.count() == 6)
  }

  test("downward probe prunes NaN batches (NaN fails every <)") {
    val q = tbl.filter($"v" < 50.0)
    assert(planned(q) == 1, s"only batch 1 holds v < 50: ${planned(q)}")
    assert(q.count() == 50)
  }

  test("metadata MAX declines the infinite bound and reads the true NaN") {
    val mx = tbl.agg(max($"v")).head().getDouble(0)
    assert(mx.isNaN, s"MAX over a NaN-bearing column is NaN, got $mx")
    // MIN is provable from the finite los (NaN is never the min here)
    assert(tbl.agg(min($"v")).head().getDouble(0) == 0.0)
  }

  test("a NaN probe on a double-PARTITIONED table plans and answers exactly") {
    // the partition-tuple evaluator compares stored tokens against
    // pushed literals through BigDecimal — NaN/Infinity literals have
    // no BigDecimal form and used to CRASH planning; now they read as
    // three-valued UNKNOWN (keep the partition, residual decides)
    val wh = java.nio.file.Files.createTempDirectory("graft_nanpart").toString
    spark.conf.set("spark.sql.catalog.nanp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.nanp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS nanp.db")
    spark.sql("CREATE TABLE nanp.db.t (id BIGINT, p DOUBLE) " +
      "PARTITIONED BY (p)")
    spark.sql("INSERT INTO nanp.db.t SELECT id, " +
      "CASE WHEN id < 5 THEN 1.5 ELSE double('NaN') END FROM range(0, 10)")
    val nan = spark.sql("SELECT id FROM nanp.db.t WHERE p = double('NaN')")
    assert(nan.collect().map(_.getLong(0)).sorted.toSeq == (5L until 10L),
      "NaN = NaN is TRUE in Spark — the NaN partition's rows must answer")
    assert(spark.sql(
      "SELECT count(*) FROM nanp.db.t WHERE p > 100.0").head().getLong(0) == 5,
      "NaN sorts above every double — it satisfies p > 100")
    assert(spark.sql(
      "SELECT count(*) FROM nanp.db.t WHERE p = 1.5").head().getLong(0) == 5)
  }

  test("top-N DESC keeps exactly the NaN-marked batches; ASC prunes them") {
    CommitLogWrite.addConstraint(spark, root, "v_nn", "v IS NOT NULL")
    val top = tbl.orderBy($"v".desc).limit(3)
    assert(planned(top) == 2,
      s"top-3 DESC lives in the two NaN batches: ${planned(top)}")
    assert(top.select($"v").as[Double].collect().forall(_.isNaN),
      "the global top-3 under Spark's order is all NaN")
    val bottom = tbl.orderBy($"v".asc).limit(3)
    assert(planned(bottom) == 1,
      s"bottom-3 is finite; NaN batches prune: ${planned(bottom)}")
    assert(bottom.select($"v").as[Double].collect().toSeq ==
      Seq(0.0, 1.0, 2.0))
  }
}
