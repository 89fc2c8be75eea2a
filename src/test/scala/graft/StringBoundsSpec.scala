package graft

import graft.sources.{CommitLog, CommitLogWrite}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** STRING BOUNDS in manifest stats (r15) — truncated byte-lex min/max
  * of each string column's UTF-8 bytes, the range modality blooms
  * (membership-only) cannot provide: `WHERE name BETWEEN …`,
  * comparisons, and `LIKE 'prefix%'` prune batches from the manifest.
  * Spark's UTF8String comparison and DuckDB's binary collation are
  * both unsigned byte-lex, so the bounds and every consumer agree.
  * Truncation stays sound: the stored lower is a byte-prefix of the
  * true min (≤ it), a cut upper is byte-incremented past the true max
  * and ZERO-FILLED to exactly StrCap bytes — so `length < StrCap` is
  * the exactness test metadata MIN/MAX rely on. */
class StringBoundsSpec extends SparkSpec {
  import spark.implicits._

  private def planned(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum

  /** Three one-file batches clustered by alphabet range. */
  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_strb").toString
    def app(names: Seq[String]): Unit =
      names.toDF("name").withColumn("id", length($"name").cast("long"))
        .repartition(1).write.format("commitlog")
        .option("path", r).mode("append").save()
    app(Seq("apple", "avocado", "banana", "blueberry"))
    app(Seq("mango", "melon", "nectarine"))
    app(Seq("tomato", "ugli", "watermelon"))
    r
  }

  private def tbl = spark.read.format("commitlog").option("path", root).load()

  test("range, equality and IN probes prune from string bounds") {
    val between = tbl.filter($"name" >= "ma" && $"name" <= "mz")
    assert(planned(between) == 1,
      s"only batch 2 intersects [ma, mz]: ${planned(between)}")
    assert(between.select($"name").as[String].collect().sorted.toSeq ==
      Seq("mango", "melon"))
    val gt = tbl.filter($"name" > "t")
    assert(planned(gt) == 1)
    assert(gt.count() == 3)
    // equality and IN already prune via blooms when declared — string
    // bounds serve them with NO bloom option at all
    val eq = tbl.filter($"name" === "banana")
    assert(planned(eq) == 1, s"bounds must serve equality: ${planned(eq)}")
    assert(eq.count() == 1)
    val in = tbl.filter($"name".isin("apple", "avocado"))
    assert(planned(in) == 1)
    assert(in.count() == 2)
    // an absent value inside no batch's range
    val none = tbl.filter($"name" === "zebra")
    assert(planned(none) == 0)
    assert(none.count() == 0)
  }

  test("LIKE 'prefix%' prunes as a byte range") {
    val like = tbl.filter($"name".startsWith("me"))
    assert(planned(like) == 1, s"prefix me: ${planned(like)}")
    assert(like.select($"name").as[String].collect().toSeq == Seq("melon"))
    val none = tbl.filter($"name".startsWith("q"))
    assert(planned(none) == 0)
    assert(none.count() == 0)
  }

  test("metadata MIN/MAX on strings answers from exact bounds") {
    val r = tbl.agg(min($"name"), max($"name")).head()
    assert((r.getString(0), r.getString(1)) == (("apple", "watermelon")))
    val plan = tbl.agg(min($"name")).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("parquet"),
      s"string MIN should answer from metadata:\n$plan")
  }

  test("truncation: long strings prune soundly, metadata extremes decline") {
    val r2 = java.nio.file.Files.createTempDirectory("graft_strt").toString
    val cap = CommitLog.ColStat.StrCap
    val longA = "a" * cap + "zzz" // truncates to a*32 (lower, prefix)
    val longB = "b" * cap + "qqq" // upper truncates to b*31 ++ (b+1), zero-filled
    Seq(longA, longB).toDF("name").repartition(1)
      .write.format("commitlog").option("path", r2).mode("append").save()
    Seq("middle", "zz").toDF("name").repartition(1)
      .write.format("commitlog").option("path", r2).mode("append").save()
    def t2 = spark.read.format("commitlog").option("path", r2).load()
    // the truncated batch still serves values INSIDE its widened range
    val q = t2.filter($"name" === longA)
    assert(planned(q) == 1)
    assert(q.count() == 1)
    // a probe past batch 1's incremented upper (b*31 ++ b+1 ++ 0-fill,
    // still below "c") prunes it
    val hi = t2.filter($"name" >= "c")
    assert(planned(hi) == 1,
      s"batch 1's incremented upper is below 'c': ${planned(hi)}")
    assert(hi.select($"name").as[String].collect().sorted.toSeq ==
      Seq("middle", "zz"))
    // MIN exact (longA's lower is a*32 — cap length — so batch 1
    // cannot prove it; the aggregate must DECLINE and read data)
    val mn = t2.agg(min($"name")).head().getString(0)
    assert(mn == longA)
    val mx = t2.agg(max($"name")).head().getString(0)
    assert(mx == "zz")
  }

  test("bounds merge through multi-task writes and survive rename chains") {
    val r3 = java.nio.file.Files.createTempDirectory("graft_strm").toString
    // one append, four tasks: driver merge unions the per-task bounds
    (0 until 40).map(i => f"k$i%02d").toDF("name").repartition(4)
      .write.format("commitlog").option("path", r3).mode("append").save()
    val st = CommitLog.statsOf(r3, 1).values.head("name")
    assert(st.strLo.map(new String(_, "UTF-8")).contains("k00"), st)
    assert(st.strHi.map(new String(_, "UTF-8")).contains("k39"), st)
    // rename: the bounds answer probes under the NEW logical name
    CommitLog.renameColumn(r3, "name", "label")
    val q = spark.read.format("commitlog").option("path", r3).load()
      .filter(col("label") > "k50")
    assert(planned(q) == 0, "renamed column must keep pruning via the chain")
    assert(q.count() == 0)
  }
}
