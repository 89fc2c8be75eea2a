package graft

import graft.sources.{CommitLog, CommitLogDml, CommitLogMerge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Wide decimals (precision 19–38) in the commitlog table format:
  * the sink writes the minimal-width FIXED_LEN_BYTE_ARRAY layout
  * (Spark's own non-legacy shape), the columnar leg decodes it through
  * the vectorized reader, the row leg (deletion vectors / CDF) through
  * the recursive group reader, partition tuples carry the unscaled
  * value as an arbitrary-precision string, and stats boxes keep their
  * double representation — safe at any precision because rounding is
  * monotone and pruning compares inclusively. */
class CommitLogDecimalSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"cldec_$tag").toString

  // values straddle 2^53 so any double shortcut in the DATA path
  // (not the stats path) would corrupt them visibly
  private def wideDf(n: Int, from: Int = 0) =
    spark.range(from, from + n).toDF("id")
      .withColumn("amt", (expr("CAST('12345678901234567890.1234567890' AS DECIMAL(38,10))")
        + $"id".cast(DecimalType(38, 10))).cast(DecimalType(38, 10)))
      .withColumn("alist", array(($"id" + 1).cast(DecimalType(20, 2)),
        ($"id" + 2).cast(DecimalType(20, 2))))

  test("sink round-trips decimal(38,10) through the vectorized leg, exact past 2^53") {
    val root = freshRoot("rt")
    wideDf(1000).write.format("commitlog").option("path", root)
      .mode("append").save()
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.schema("amt").dataType == DecimalType(38, 10))
    assert(back.count() == 1000)
    val r = back.filter($"id" === 7L).head()
    assert(r.getAs[java.math.BigDecimal]("amt") ==
      new java.math.BigDecimal("12345678901234567897.1234567890"))
    // decimals inside arrays survive too
    assert(r.getAs[collection.Seq[java.math.BigDecimal]]("alist").head ==
      new java.math.BigDecimal("8.00"))
    // exact whole-column sum — one flipped bit anywhere would show
    val total = back.select(sum($"amt")).head().getDecimal(0)
    val exp = (0 until 1000).map(i => BigDecimal("12345678901234567890.1234567890") + i).sum
    assert(BigDecimal(total) == exp)
  }

  test("DV delete: the row leg decodes FIXED_LEN_BYTE_ARRAY decimals") {
    val root = freshRoot("dv")
    wideDf(500).write.format("commitlog").option("path", root)
      .mode("append").save()
    CommitLogDml.delete(spark, root, "id = 42", changeFeed = false)
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.files(root, v).exists(_.startsWith(CommitLogMerge.DvPrefix)),
      "expected the delete to take the deletion-vector leg")
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.count() == 499)
    assert(back.filter($"id" === 43L).head().getAs[java.math.BigDecimal]("amt") ==
      new java.math.BigDecimal("12345678901234567933.1234567890"))
  }

  test("COW rewrite: Spark-written FLBA files read back identically") {
    val root = freshRoot("cow")
    wideDf(100).write.format("commitlog").option("path", root)
      .mode("append").save()
    CommitLogDml.delete(spark, root, "id % 2 = 0", changeFeed = false)
    val back = spark.read.format("commitlog").option("path", root).load()
    assert(back.count() == 50)
    assert(back.filter($"id" === 51L).head().getAs[java.math.BigDecimal]("amt") ==
      new java.math.BigDecimal("12345678901234567941.1234567890"))
  }

  test("stats boxes are recorded and range pruning stays exact at precision 38") {
    val root = freshRoot("box")
    // two batches with disjoint wide ranges
    wideDf(100).write.format("commitlog").option("path", root)
      .mode("append").save()
    wideDf(100, from = 1000000).write.format("commitlog").option("path", root)
      .mode("append").save()
    val v = CommitLog.latestVersion(root)
    val stats = CommitLog.statsOf(root, v)
    assert(stats.values.forall(_.contains("amt")),
      s"expected an 'amt' box in every batch, got $stats")
    // a strict range filter that matches only the second batch: box
    // pruning may cut the first file but must never lose a match
    val back = spark.read.format("commitlog").option("path", root).load()
      .filter($"amt" > expr("CAST('12345678901234567890.1234567890' AS DECIMAL(38,10))")
        + lit(999999).cast(DecimalType(38, 10)))
    assert(back.count() == 100)
    assert(back.agg(min($"id")).head().getLong(0) == 1000000L)
  }

  test("partition by a wide-decimal column: exact tuples, pruning, DML") {
    val wh = java.nio.file.Files.createTempDirectory("cldec_wh").toString
    spark.conf.set("spark.sql.catalog.decat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.decat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS decat.db")
    spark.sql("CREATE TABLE decat.db.wd (id BIGINT, bucket DECIMAL(38,0)) " +
      "PARTITIONED BY (bucket)")
    spark.sql("INSERT INTO decat.db.wd SELECT id, " +
      "CAST(id % 3 AS DECIMAL(38,0)) * CAST('10000000000000000000' AS DECIMAL(38,0)) " +
      "FROM range(0, 60)")
    val root = s"$wh/db/wd"
    val v = CommitLog.latestVersion(root)
    assert(CommitLog.files(root, v).size == 3, "one batch per wide tuple")
    val parts = CommitLog.partsOf(root, v)
    assert(parts.values.map(_("bucket")).toSeq.distinct.size == 3,
      s"expected 3 distinct wide-decimal tuples, got $parts")
    val one = spark.sql("SELECT id FROM decat.db.wd WHERE bucket = " +
      "CAST('20000000000000000000' AS DECIMAL(38,0))")
    val ids = one.collect().map(_.getLong(0)).toSeq
    assert(ids.size == 20 && ids.forall(_ % 3 == 2))
    // delete inside one partition; survivors exact
    spark.sql("DELETE FROM decat.db.wd WHERE id = 2")
    assert(spark.sql("SELECT count(*) FROM decat.db.wd").head().getLong(0) == 59)
  }
}
