package graft

import graft.queries.Qh
import graft.sources.{CommitLog, CommitLogDml}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ColumnarToRowExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The VECTORIZED read path of the commitlog connector
  * (CommitLogColumnarReader): snapshot scans decode through Spark's
  * ColumnarBatch reader instead of row-at-a-time Group records —
  * pinned by plan shape (ColumnarToRow over the v2 scan), proven
  * value-identical to the row leg across evolution/renames/time
  * travel, shown to FALL BACK to the row leg exactly when per-row
  * bookkeeping is required (deletion vectors, metadata columns), and
  * A/B-benched against `spark.read.parquet` on the same files. */
class CommitLogColumnarSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"clcol_$tag").toString

  /** The commitlog v2 scans in the executed plan, paired with whether
    * Spark planned them columnar. */
  private def commitlogScans(df: DataFrame): Seq[(BatchScanExec, Boolean)] = {
    df.collect() // drive the REAL QueryExecution (memory convention)
    Qh.flattenPlan(df.queryExecution.executedPlan).collect {
      case b: BatchScanExec if b.scan.isInstanceOf[graft.sources.CommitLogScan] =>
        (b, b.supportsColumnar)
    }
  }

  private def assertColumnar(df: DataFrame): Unit = {
    val scans = commitlogScans(df)
    assert(scans.nonEmpty, "no commitlog scan in plan")
    assert(scans.forall(_._2),
      s"commitlog scan planned row-based:\n${df.queryExecution.executedPlan}")
    // and the bridge is really in the plan (the codegen input)
    assert(Qh.flattenPlan(df.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ColumnarToRowExec]))
  }

  private def assertRowBased(df: DataFrame): Unit = {
    val scans = commitlogScans(df)
    assert(scans.nonEmpty, "no commitlog scan in plan")
    assert(scans.forall(!_._2),
      s"commitlog scan planned columnar where per-row work is required:\n" +
        df.queryExecution.executedPlan)
  }

  test("snapshot scan is columnar and value-identical to the written data") {
    val root = freshRoot("snap")
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("v", $"id" * 2.5)
      .withColumn("s", concat(lit("k"), $"id" % 97))
      .withColumn("t", timestamp_seconds(lit(1709294400L) + $"id"))
      .withColumn("d", to_date(lit("2024-03-01")) + ($"id" % 31).cast("int"))
      .withColumn("m", ($"id" % 1000).cast("decimal(12,2)"))
    df.write.format("commitlog").option("path", root).mode("append").save()
    df.write.format("commitlog").option("path", root).mode("append").save()

    val back = spark.read.format("commitlog").option("path", root).load()
    assertColumnar(back)
    assert(back.count() == 20000)
    // exact value round trip across every supported type
    val got = back.groupBy().agg(
      sum($"id").as("ids"), sum($"v").as("vs"),
      sum(length($"s")).as("ls"),
      max($"t").cast("long").as("mt"), max($"d").cast("string").as("md"),
      sum($"m").as("mm")).head()
    val want = df.union(df).groupBy().agg(
      sum($"id"), sum($"v"), sum(length($"s")),
      max($"t").cast("long"), max($"d").cast("string"), sum($"m")).head()
    assert(got == want)
    // column pruning reaches the vectorized reader: a 1-column read
    // still plans columnar and answers correctly
    val one = spark.read.format("commitlog").option("path", root).load()
      .select(sum($"v"))
    assertColumnar(spark.read.format("commitlog").option("path", root)
      .load().select($"v"))
    assert(one.head().getDouble(0) == df.union(df).agg(sum($"v")).head().getDouble(0))
  }

  test("time travel + additive evolution null-fill stay columnar") {
    val root = freshRoot("evo")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$root/b1")
    var v = CommitLog.commit(root, 0, added = Seq("b1"),
      schema = Some("id BIGINT,s STRING")).version
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "s", "w")
      .write.parquet(s"$root/b2")
    v = CommitLog.commit(root, v, added = Seq("b2"),
      schema = Some("id BIGINT,s STRING,w DOUBLE")).version

    val latest = spark.read.format("commitlog").option("path", root).load()
    assertColumnar(latest)
    // the pre-evolution file null-fills w INSIDE the vectorized reader
    assert(latest.filter($"w".isNull).select("id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L))
    assert(latest.agg(sum($"w")).head().getDouble(0) == 70.0)

    val v1 = spark.read.format("commitlog").option("path", root)
      .option("versionAsOf", 1).load()
    assertColumnar(v1)
    assert(v1.columns.toSeq == Seq("id", "s"))
    assert(v1.count() == 2)
  }

  test("renamed column resolves per file era in the columnar reader") {
    val root = freshRoot("ren")
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount").write.parquet(s"$root/b1")
    var v = CommitLog.commit(root, 0, added = Seq("b1"),
      schema = Some("id BIGINT,amount DOUBLE")).version
    v = CommitLog.renameColumn(root, "amount", "total").version
    Seq((3L, 30.0)).toDF("id", "total").write.parquet(s"$root/b2")
    CommitLog.commit(root, v, added = Seq("b2"),
      schema = Some("id BIGINT,total DOUBLE"))

    val back = spark.read.format("commitlog").option("path", root).load()
    assertColumnar(back)
    // the old era's file answers `total` under the name it was written
    // with — value-level proof the physical-name resolution worked
    assert(back.orderBy("id").select("total").as[Double].collect().toSeq ==
      Seq(10.0, 20.0, 30.0))
  }

  test("deletion vectors force the row leg; results stay correct") {
    val root = freshRoot("dv")
    spark.range(0, 1000).toDF("id").withColumn("v", $"id" * 2)
      .write.format("commitlog").option("path", root).mode("append").save()
    // sparse delete → the write-amplification dial picks the DV leg
    CommitLogDml.delete(spark, root, "id = 7", changeFeed = false)
    val back = spark.read.format("commitlog").option("path", root).load()
    assertRowBased(back)
    assert(back.count() == 999)
    assert(back.filter($"id" === 7).count() == 0)
  }

  test("metadata columns force the row leg") {
    val root = freshRoot("meta")
    spark.range(0, 10).toDF("id").repartition(1)
      .write.format("commitlog").option("path", root).mode("append").save()
    val withMeta = spark.read.format("commitlog").option("path", root).load()
      .select($"id", $"_batch", $"_row_pos")
    assertRowBased(withMeta)
    assert(withMeta.count() == 10)
    // one file → positions are exactly the file ordinals
    assert(withMeta.select("_row_pos").as[Long].collect().sorted.toSeq ==
      (0L until 10L).toSeq)
  }

  test("streaming tail reads columnar micro-batches") {
    val root = freshRoot("stream")
    val ckpt = freshRoot("stream_ckpt")
    spark.range(0, 100).toDF("id")
      .write.format("commitlog").option("path", root).mode("append").save()
    val q = spark.readStream.format("commitlog").option("path", root).load()
      .writeStream.format("memory").queryName("clcol_stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("clcol_stream").count() == 100)
  }

  test("A/B: full-snapshot commitlog scan within 1.5x of spark.read.parquet on the same files") {
    val root = freshRoot("ab")
    // enough rows that decode dominates per-run overhead
    val df = spark.range(0, 3000000).toDF("id")
      .withColumn("v", $"id" * 1.000001)
      .withColumn("s", concat(lit("key-"), $"id" % 10007))
      .repartition(8)
    df.write.format("commitlog").option("path", root).mode("append").save()
    val files = CommitLog.files(root, CommitLog.latestVersion(root))
      .flatMap(graft.sources.CommitLogSource.listParquet(root, _))

    def time(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; System.nanoTime() - t0
    }
    def viaConnector(): Unit = {
      val n = spark.read.format("commitlog").option("path", root).load()
        .agg(sum($"id"), sum($"v"), sum(length($"s"))).head()
      assert(n.getLong(0) == 4499998500000L)
    }
    def viaParquet(): Unit = {
      val n = spark.read.parquet(files: _*)
        .agg(sum($"id"), sum($"v"), sum(length($"s"))).head()
      assert(n.getLong(0) == 4499998500000L)
    }
    viaConnector(); viaParquet() // warm both paths (codegen, FS cache)
    val ours = (1 to 3).map(_ => time(viaConnector())).min
    val spark_ = (1 to 3).map(_ => time(viaParquet())).min
    val ratio = ours.toDouble / spark_.toDouble
    info(f"commitlog ${ours / 1e6}%.0f ms vs parquet ${spark_ / 1e6}%.0f ms " +
      f"(ratio $ratio%.2f)")
    assert(ratio < 1.5,
      f"columnar commitlog scan is $ratio%.2fx of spark.read.parquet " +
        f"(${ours / 1e6}%.0f ms vs ${spark_ / 1e6}%.0f ms)")
  }

  test("A/B: sink write within 1.5x of df.write.parquet on the same rows") {
    // the write-side twin of the scan A/B: the sink streams
    // InternalRows straight through Spark's ParquetWriteSupport (plus
    // the stats-box pass and the rename/manifest protocol) — it must
    // stay within noise of Spark's own parquet write, not a multiple
    // of it (the old SimpleGroup row materialization was)
    val df = spark.range(0, 3000000).toDF("id")
      .withColumn("v", $"id" * 1.000001)
      .withColumn("s", concat(lit("key-"), $"id" % 10007))
      .repartition(8)
    df.cache().count() // isolate the WRITE: input comes from cache

    def time(f: => Unit): Long = {
      val t0 = System.nanoTime(); f; System.nanoTime() - t0
    }
    def viaSink(): Unit = {
      val root = freshRoot("abw_sink")
      df.write.format("commitlog").option("path", root).mode("append").save()
      assert(CommitLog.latestVersion(root) == 1)
    }
    def viaParquet(): Unit = {
      val root = freshRoot("abw_native")
      df.write.mode("overwrite").parquet(s"$root/out")
    }
    viaSink(); viaParquet() // warm both paths (codegen, committers)
    val ours = (1 to 3).map(_ => time(viaSink())).min
    val spark_ = (1 to 3).map(_ => time(viaParquet())).min
    df.unpersist()
    val ratio = ours.toDouble / spark_.toDouble
    info(f"commitlog sink ${ours / 1e6}%.0f ms vs parquet write " +
      f"${spark_ / 1e6}%.0f ms (ratio $ratio%.2f)")
    assert(ratio < 1.5,
      f"commitlog sink write is $ratio%.2fx of df.write.parquet " +
        f"(${ours / 1e6}%.0f ms vs ${spark_ / 1e6}%.0f ms)")
  }
}
