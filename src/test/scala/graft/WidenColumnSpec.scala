package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogOptimize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, StringType}

/** TYPE WIDENING (SURVEY S77): `ALTER COLUMN … TYPE` along the
  * int→bigint / float→double ladder as a metadata-only commit — old
  * files keep their narrow physical layout, readers serve them under
  * the wide logical type, and every manifest facet (boxes, null
  * counts, canonical-key blooms, NDV hashes, sort orders) survives by
  * construction. */
class WidenColumnSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"widen_$tag").toString

  private def snap(root: String): DataFrame =
    spark.read.format("commitlog").option("path", root).load()

  private def parquetFiles(root: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
  }

  private def plannedOf(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.length
    }.sum

  test("widening is metadata-only; mixed eras serve columnar as one table") {
    val root = freshRoot("basic")
    (0 until 100).map(i => (i, i * 1.5f)).toDF("k", "x").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val before = parquetFiles(root)
    CommitLog.widenColumn(root, "k", LongType)
    CommitLog.widenColumn(root, "x", DoubleType)
    assert(parquetFiles(root) == before, "widening must rewrite nothing")
    assert(CommitLog.history(root).last.operation.contains("WIDEN COLUMN"))
    // post-widen append lands the WIDE physical layout
    (100 until 200).map(i => (i.toLong, i * 1.5d)).toDF("k", "x")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val df = snap(root)
    assert(df.schema("k").dataType == LongType &&
      df.schema("x").dataType == DoubleType)
    // the plain read stays on the vectorized leg across the era mix
    // (Spark's parquet readers widen INT32→LONG / FLOAT→DOUBLE)
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      s"mixed-width eras must serve columnar:\n${df.queryExecution.executedPlan}")
    val rows = df.as[(Long, Double)].collect().toMap
    assert(rows.size == 200 && rows(7L) == 10.5d && rows(150L) == 225.0d,
      "narrow-era files must answer under the wide type")
  }

  test("the row leg (DV reads) serves narrow-era files under the wide type") {
    val root = freshRoot("rowleg")
    (0 until 100).map(i => (i, s"n$i")).toDF("k", "name").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLog.widenColumn(root, "k", LongType)
    spark.conf.set("spark.graft.rowLevel.mode", "delta")
    try CommitLogDml.delete(spark, root, "k % 10 = 3") // DV ⇒ row leg
    finally spark.conf.set("spark.graft.rowLevel.mode", "cow")
    val got = snap(root).select("k").as[Long].collect().sorted
    assert(got.length == 90 && !got.contains(3L) && got.contains(4L),
      "the DV row leg must read INT32 cells under the LONG request")
  }

  test("boxes, blooms and NDV survive the widening boundary") {
    val root = freshRoot("facets")
    // three batches with disjoint ranges, bloom on the int key
    (0 until 3).foreach { b =>
      (b * 100 until (b + 1) * 100).map(i => Tuple1(i)).toDF("k")
        .repartition(1)
        .write.format("commitlog").option("path", root)
        .option("bloomColumns", "k").mode("append").save()
    }
    CommitLog.widenColumn(root, "k", LongType)
    // range pruning: boxes are width-blind
    val rangeQ = snap(root).filter($"k" >= 250L)
    assert(plannedOf(rangeQ) == 1, s"box pruning must hold: ${plannedOf(rangeQ)}")
    // bloom point probe: the pushed LONG literal derives the same
    // decimal-string canonical key the INT-era sink hashed
    val pointQ = snap(root).filter($"k" === 42L)
    assert(plannedOf(pointQ) == 1,
      s"canonical-key bloom must prune across the widening: ${plannedOf(pointQ)}")
    assert(pointQ.count() == 1L)
    // NDV hash consistency: appending the SAME logical values as LONG
    // must not double the estimate (hash(int v) == hash(long v))
    (0 until 300).map(i => Tuple1(i.toLong)).toDF("k").repartition(1)
      .write.format("commitlog").option("path", root)
      .option("bloomColumns", "k").mode("append").save()
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val stats = snap(root).queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    }.head
    import scala.jdk.CollectionConverters._
    val kNdv = stats.columnStats().asScala.collectFirst {
      case (ref, st) if ref.fieldNames().sameElements(Array("k")) =>
        st.distinctCount().getAsLong
    }.get
    assert(kNdv >= 200L && kNdv <= 360L,
      s"300 distinct values across eras must read ~300, not ~600: $kNdv")
  }

  test("time travel serves pre-widening versions under the narrow era schema") {
    val root = freshRoot("tt")
    (0 until 10).map(i => Tuple1(i)).toDF("k").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLog.widenColumn(root, "k", LongType) // v2
    val old = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 1).load()
    assert(old.schema("k").dataType == IntegerType,
      "the era's schema governs time travel")
    assert(old.as[Int].collect().sorted.toSeq == (0 until 10))
    assert(snap(root).schema("k").dataType == LongType)
  }

  test("OPTIMIZE across the boundary localizes the widening") {
    val root = freshRoot("opt")
    (0 until 50).map(i => Tuple1(i)).toDF("k").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    CommitLog.widenColumn(root, "k", LongType)
    (50 until 100).map(i => Tuple1(i.toLong)).toDF("k").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val r = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    assert(r.packed.isDefined)
    assert(snap(root).as[Long].collect().sorted.toSeq == (0L until 100L))
  }

  test("the ladder refuses narrowing, cross-kind jumps, partition and generated columns") {
    val root = freshRoot("refuse")
    (0 until 10).map(i => (i.toLong, s"s$i", i.toFloat)).toDF("k", "s", "f")
      .repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    intercept[IllegalArgumentException] {
      CommitLog.widenColumn(root, "k", IntegerType) // narrowing
    }
    intercept[IllegalArgumentException] {
      CommitLog.widenColumn(root, "s", LongType) // cross-kind
    }
    intercept[IllegalArgumentException] {
      CommitLog.widenColumn(root, "f", LongType) // float→long
    }
    // idempotent no-op: already the target width
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.widenColumn(root, "k", LongType).version == v)
    // float→double is on the ladder
    CommitLog.widenColumn(root, "f", DoubleType)
    assert(snap(root).schema("f").dataType == DoubleType)
  }

  test("SQL surface: ALTER TABLE … ALTER COLUMN … TYPE through the catalog") {
    val wh = freshRoot("wh")
    spark.conf.set("spark.sql.catalog.widen", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.widen.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS widen.db")
    spark.sql("CREATE TABLE widen.db.t (k INT, m INT) PARTITIONED BY (m)")
    spark.sql("INSERT INTO widen.db.t SELECT id, id % 2 FROM range(0, 20)")
    spark.sql("ALTER TABLE widen.db.t ALTER COLUMN k TYPE BIGINT")
    assert(spark.table("widen.db.t").schema("k").dataType == LongType)
    spark.sql("INSERT INTO widen.db.t SELECT id, id % 2 FROM range(20, 40)")
    assert(spark.sql("SELECT sum(k) FROM widen.db.t").as[Long].head() ==
      (0L until 40L).sum)
    // a partition column refuses
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE widen.db.t ALTER COLUMN m TYPE BIGINT")
    }
    assert(e.getMessage.contains("partition"))
  }
}
