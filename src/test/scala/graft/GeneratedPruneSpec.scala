package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Generated-column FILTER DERIVATION (Delta's generated-partition
  * pruning): a query filtering only the SOURCE column of a generated
  * partition column must prune partitions — the user never names the
  * partition column. Conservative by construction: pruning acts only
  * on provably-false tuples, so every result below is also checked
  * value-exact against an unpruned recompute. */
class GeneratedPruneSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_gp").toString
  spark.conf.set("spark.sql.catalog.gp", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.gp.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gp.db")

  private def planned(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum

  test("ts-range filter prunes a table partitioned by day = CAST(ts AS DATE)") {
    spark.sql(
      """CREATE TABLE gp.db.e (
        |  ts TIMESTAMP, v BIGINT,
        |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
        |PARTITIONED BY (day)""".stripMargin)
    // 10 days x 20 rows -> 10 day-partitions (one batch per tuple)
    spark.sql(
      """INSERT INTO gp.db.e (ts, v)
        |SELECT timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,
        |  CAST(id / 20 AS INT), 0, CAST(id % 20 AS INT), 0), id
        |FROM range(0, 200)""".stripMargin)
    val all = spark.sql("SELECT * FROM gp.db.e")
    assert(planned(all) == 10, s"10 day batches, got ${planned(all)}")

    // the query names ONLY ts — day pruning must be derived
    val q = spark.sql(
      "SELECT count(*) AS n, sum(v) AS s FROM gp.db.e " +
        "WHERE ts >= timestamp'2024-03-04 00:00:00' " +
        "AND ts < timestamp'2024-03-07 00:00:00'")
    // count(*) under a filter doesn't take the metadata-agg path; the
    // scan plans only the 3 matching day partitions
    val scan = spark.sql(
      "SELECT v FROM gp.db.e WHERE ts >= timestamp'2024-03-04 00:00:00' " +
        "AND ts < timestamp'2024-03-07 00:00:00'")
    // conservative bound: ts < Y derives day <= floor(Y), so the empty
    // boundary day (03-07) plans too and filters residually — 4 of 10
    assert(planned(scan) == 4,
      s"expected 4 of 10 day partitions planned, got ${planned(scan)}")
    // and the answer is exact (days 3,4,5 -> ids 60..119)
    assert(q.as[(Long, Long)].head() == ((60L, (60L until 120L).sum)))

    // equality on ts prunes to one day
    val one = spark.sql(
      "SELECT v FROM gp.db.e WHERE ts = timestamp'2024-03-09 00:05:00'")
    assert(planned(one) == 1, s"got ${planned(one)}")
    assert(one.as[Long].collect().toSeq == Seq(165L))
  }

  test("year() generated partition prunes from a date filter; month() does not derive") {
    spark.sql(
      """CREATE TABLE gp.db.y (
        |  d DATE, v BIGINT,
        |  yr INT GENERATED ALWAYS AS (year(d)),
        |  mo INT GENERATED ALWAYS AS (month(d)))
        |PARTITIONED BY (yr)""".stripMargin)
    spark.sql(
      """INSERT INTO gp.db.y (d, v)
        |SELECT date_add(date'2020-06-15', CAST(id * 100 AS INT)), id
        |FROM range(0, 12)""".stripMargin) // ~2020-06 .. 2023-07, 4 years
    val all = spark.sql("SELECT * FROM gp.db.y")
    val total = planned(all)
    assert(total >= 4, s"expected >=4 year partitions, got $total")
    val q = spark.sql("SELECT v FROM gp.db.y WHERE d >= date'2023-01-01'")
    assert(planned(q) < total, s"derived year bound must prune: ${planned(q)}/$total")
    // month() is NOT monotonic: no derivation, but results stay exact
    val m = spark.sql("SELECT count(*) FROM gp.db.y WHERE d < date'2021-01-01'")
    assert(m.head().getLong(0) ==
      (0 until 12).count(i => i * 100 < 200)) // 2020-06-15 + 200d = 2021-01-01
  }

  test("substring prefix partition derives equality only") {
    spark.sql(
      """CREATE TABLE gp.db.s (
        |  id STRING, v BIGINT,
        |  pfx STRING GENERATED ALWAYS AS (substring(id, 1, 2)))
        |PARTITIONED BY (pfx)""".stripMargin)
    Seq("aa1", "aa2", "bb1", "bb2", "cc1", "cc2", "dd1", "dd2")
      .zipWithIndex.map { case (s, i) => (s, i.toLong) }.toDF("id", "v")
      .createOrReplaceTempView("gp_src")
    spark.sql("INSERT INTO gp.db.s (id, v) SELECT id, v FROM gp_src")
    val all = planned(spark.sql("SELECT * FROM gp.db.s"))
    assert(all == 4, s"4 prefix partitions, got $all")
    val eq = spark.sql("SELECT v FROM gp.db.s WHERE id = 'bb2'")
    assert(planned(eq) == 1, s"got ${planned(eq)}")
    assert(eq.as[Long].head() == 3L)
    val in = spark.sql("SELECT v FROM gp.db.s WHERE id IN ('aa1', 'cc9')")
    assert(planned(in) == 2, s"got ${planned(in)}")
    // RANGE on a string source must NOT derive (order mismatch class):
    // correct answer, no assertion on pruning
    val r = spark.sql("SELECT count(*) FROM gp.db.s WHERE id > 'bb'")
    assert(r.head().getLong(0) == 6)
  }

  test("derivation survives DML: pruning after a COW rewrite stays exact") {
    spark.sql(
      """CREATE TABLE gp.db.m (
        |  ts TIMESTAMP, v BIGINT,
        |  day DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
        |PARTITIONED BY (day)""".stripMargin)
    spark.sql(
      """INSERT INTO gp.db.m (ts, v)
        |SELECT timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,
        |  CAST(id / 10 AS INT), 0, CAST(id AS INT), 0), id
        |FROM range(0, 50)""".stripMargin)
    spark.sql("DELETE FROM gp.db.m WHERE v % 2 = 1")
    val q = spark.sql(
      "SELECT v FROM gp.db.m WHERE ts >= timestamp'2024-03-03 00:00:00' " +
        "AND ts < timestamp'2024-03-04 00:00:00'")
    assert(q.as[Long].collect().sorted.toSeq ==
      (20L until 30L).filter(_ % 2 == 0))
  }
}
