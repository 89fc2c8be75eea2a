package graft

import graft.sources.{CommitLog, CommitLogMonotone}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** MONOTONE partition transforms (SURVEY S82): `PARTITIONED BY
  * (days(ts))` / `hours` / `months` / `years` / `truncate(W, col)` —
  * Iceberg's hidden partitioning. Order-preserving, so RANGE
  * predicates on the SOURCE column prune through the transform: the
  * query never mentions a partition column, yet `ts >= X` opens only
  * the days at or past day(X). String truncate cuts at W CODEPOINTS
  * (a fixed codepoint count is monotone in byte-lex order; a
  * variable-length byte cut is not — the soundness note in
  * [[CommitLogMonotone.truncChars]]).
  */
class MonotonePartitionSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_mono").toString
  spark.conf.set("spark.sql.catalog.mono", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.mono.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS mono.db")

  private def scanOf(df: org.apache.spark.sql.DataFrame): Seq[BatchScanExec] =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }

  private def planned(df: org.apache.spark.sql.DataFrame): Int =
    scanOf(df).map(_.inputPartitions.length).sum

  test("days(ts): equality AND ranges prune; the query never names a partition col") {
    spark.sql("CREATE TABLE mono.db.d (ts TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO mono.db.d SELECT " +
      "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0), id " +
      "FROM range(0, 96)") // 4 days, hourly rows
    val root = s"$wh/db/d"
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.partColsOf(root, v) == Seq("days(ts)"))
    val tokens = CommitLog.partsOf(root, v).values.map(_("days(ts)")).toSeq
    assert(tokens.distinct.size == 4, s"4 day tokens expected: $tokens")
    val t = spark.table("mono.db.d")
    val all = planned(t)
    // a RANGE on ts prunes through the transform (bucket cannot do this)
    val range = t.filter($"ts" >= "2024-01-03 00:00:00")
    assert(range.count() == 48L)
    assert(planned(range) < all, s"range must prune: ${planned(range)}/$all")
    val upper = t.filter($"ts" < "2024-01-02 12:00:00")
    assert(upper.count() == 36L)
    assert(planned(upper) < all)
    val day = t.filter($"ts".between(
      "2024-01-02 00:00:00", "2024-01-02 23:59:59"))
    assert(day.count() == 24L)
    assert(planned(day) < planned(range),
      s"a one-day window must plan fewer files than a 2-day range: " +
        s"${planned(day)} vs ${planned(range)}")
  }

  test("months/years compose with dates; null sources route to the null token") {
    spark.sql("CREATE TABLE mono.db.m (d DATE, v BIGINT) " +
      "PARTITIONED BY (months(d))")
    spark.sql("INSERT INTO mono.db.m VALUES " +
      "(date'2023-11-15', 1), (date'2023-12-01', 2), (date'2024-01-20', 3), " +
      "(NULL, 4)")
    val t = spark.table("mono.db.m")
    val all = planned(t)
    val q = t.filter($"d" >= "2023-12-15")
    assert(q.count() == 1L)
    assert(planned(q) < all,
      "a date range must prune months(d) batches (Dec token survives " +
        "conservatively, Nov must drop)")
    assert(planned(t.filter($"d".isNull)) == 1,
      "IS NULL plans exactly the null-token batch")
    assert(t.filter($"d".isNull).count() == 1L)
  }

  test("truncate(W, string): prefix probes and ranges prune at codepoint cuts") {
    spark.sql("CREATE TABLE mono.db.s (url STRING, v BIGINT) " +
      "PARTITIONED BY (truncate(4, url))")
    spark.sql("INSERT INTO mono.db.s VALUES " +
      "('alpha/1', 1), ('alpha/2', 2), ('beta/1', 3), ('gamma/1', 4)")
    val t = spark.table("mono.db.s")
    val all = planned(t)
    assert(all >= 3, "three distinct 4-codepoint prefixes")
    val like = t.filter($"url".startsWith("beta"))
    assert(like.count() == 1L)
    assert(planned(like) < all, "LIKE 'beta%' must open only the beta bucket")
    // a short prefix (under the cut) keeps compatible tokens only
    val shortP = t.filter($"url".startsWith("al"))
    assert(shortP.count() == 2L)
    assert(planned(shortP) < all)
    // ranges prune byte-lexicographically through the prefix
    val range = t.filter($"url" >= "gamma")
    assert(range.count() == 1L)
    assert(planned(range) < all)
    // equality prunes to the matching prefix
    val eq = t.filter($"url" === "beta/1")
    assert(eq.count() == 1L)
    assert(planned(eq) < all)
  }

  test("truncate over integrals floors to multiples; ranges prune") {
    spark.sql("CREATE TABLE mono.db.i (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (truncate(100, k))")
    spark.sql("INSERT INTO mono.db.i SELECT id, id FROM range(0, 400)")
    val root = s"$wh/db/i"
    val toks = CommitLog.partsOf(root, CommitLog.latestVersion(root))
      .values.flatMap(_.get("truncate100(k)")).flatMap(CommitLog.partValue)
      .map(_.toLong).toSeq.sorted
    assert(toks == Seq(0L, 100L, 200L, 300L), s"floored multiples: $toks")
    // inequality pins only: a token may span several task files, so
    // exact per-file arithmetic is parallelism-dependent
    val t = spark.table("mono.db.i")
    val all = planned(t)
    assert(planned(t.filter($"k" === 250L)) < all)
    assert(planned(t.filter($"k" >= 305L)) < all,
      "k >= 305 must drop the 0/100/200 tokens")
    assert(t.filter($"k" >= 305L).count() == 95L)
    assert(planned(t.filter($"k" < 100L)) < all)
    assert(t.filter($"k" < 100L).count() == 100L)
  }

  test("codepoint truncation is monotone where a byte cut is not") {
    // "aé" vs "ab": byte-lex "ab" < "aé" (0x62 < 0xC3), and 2-codepoint
    // truncation keeps that order; the old counterexample against a
    // 2-BYTE cut ("aé"→"a" < "ab"→"ab" while "aé" > "ab") cannot occur
    val t1 = new String(CommitLogMonotone.truncChars(
      2, "aéxyz".getBytes("UTF-8")), "UTF-8")
    val t2 = new String(CommitLogMonotone.truncChars(
      2, "abxyz".getBytes("UTF-8")), "UTF-8")
    assert(t1 == "aé" && t2 == "ab")
    assert(java.util.Arrays.compareUnsigned(
      t2.getBytes("UTF-8"), t1.getBytes("UTF-8")) < 0,
      "token order must match source byte-lex order")
    // and a real table stays correct across multibyte boundaries
    spark.sql("CREATE TABLE mono.db.u (s STRING, v BIGINT) " +
      "PARTITIONED BY (truncate(2, s))")
    spark.sql("INSERT INTO mono.db.u VALUES ('aéxyz', 1), ('abxyz', 2), " +
      "('zz', 3)")
    val t = spark.table("mono.db.u")
    assert(t.filter($"s" >= "ab" && $"s" < "b").count() == 2L)
    val probe = t.filter($"s" === "aéxyz")
    assert(probe.count() == 1L)
    assert(planned(probe) < planned(t))
  }

  test("SPJ: two days(ts) tables join on ts with zero join exchanges") {
    Seq("l", "r").foreach { x =>
      spark.sql(s"CREATE TABLE mono.db.spj_$x (ts TIMESTAMP, v BIGINT) " +
        "PARTITIONED BY (days(ts))")
      spark.sql(s"INSERT INTO mono.db.spj_$x SELECT " +
        "timestamp'2024-02-01 00:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0), id " +
        "FROM range(0, 30)")
    }
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, x) => spark.conf.set(c, x) }
    try {
      val j = spark.sql(
        "SELECT count(*) AS n FROM mono.db.spj_l l JOIN mono.db.spj_r r " +
          "ON l.ts = r.ts")
      assert(j.head().getLong(0) == 300L) // 10 per day-offset pair, 3 offsets
      val joins = graft.queries.Qh.flattenPlan(j.queryExecution.executedPlan)
        .collect {
          case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
        }
      val joinShuffles = joins.flatMap(graft.queries.Qh.flattenPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(joins.nonEmpty && joinShuffles.isEmpty,
        s"days-partitioned SPJ must delete the join exchanges:\n" +
          j.queryExecution.executedPlan)
    } finally saved.foreach {
      case (c, Some(x)) => spark.conf.set(c, x)
      case (c, None) => spark.conf.unset(c)
    }
  }
}
