package graft

import graft.sources.{CommitLog, CommitLogMerge, CommitLogOptimize}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** PARTITIONED commitlog tables: identity partition columns declared
  * at CREATE, one batch per partition tuple per write, exact
  * plan-time partition pruning from manifest tuples, dynamic
  * partition overwrite as pure metadata, partition-aligned
  * replaceWhere without a scan, per-partition compaction, and the
  * immutability/refusal edges. */
class CommitLogPartitionSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_pt").toString
  spark.conf.set("spark.sql.catalog.pt", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.pt.warehouse", wh)

  private def planned(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputPartitions.length
    }.sum

  private def mkTable(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pt.db")
    spark.sql(s"CREATE TABLE pt.db.$name (id BIGINT, v DOUBLE, region STRING) " +
      "PARTITIONED BY (region)")
    s"$wh/db/$name"
  }

  test("writes land one batch per partition tuple, tuple recorded in the manifest") {
    val root = mkTable("t1")
    spark.sql("INSERT INTO pt.db.t1 SELECT id, id * 1.5, " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END " +
      "FROM range(0, 90)")
    val v = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, v)
    assert(live.size == 3, s"one batch per region: $live")
    val parts = CommitLog.partsOf(root, v)
    assert(parts.keySet == live.toSet, "every batch carries its tuple")
    val regions = parts.values.map(m => CommitLog.partValue(m("region"))).toSet
    assert(regions == Set(Some("us"), Some("eu"), Some("ap")))
    assert(CommitLog.partColsOf(root, v) == Seq("region"))
    // content is intact across the partition split
    val r = spark.sql("SELECT count(*) AS n, sum(id) AS s FROM pt.db.t1").head()
    assert(r.getLong(0) == 90 && r.getLong(1) == (0L until 90L).sum)
  }

  test("exact partition pruning: a string equality plans only the matching batch") {
    val root = mkTable("t2")
    spark.sql("INSERT INTO pt.db.t2 SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END " +
      "FROM range(0, 90)")
    val all = spark.sql("SELECT * FROM pt.db.t2")
    val one = spark.sql("SELECT * FROM pt.db.t2 WHERE region = 'eu'")
    assert(planned(all) == 3)
    assert(planned(one) == 1,
      s"string equality must prune to the eu batch, planned=${planned(one)}")
    assert(one.count() == 30)
    // IN and negation prune too (boxes/blooms cannot do NOT)
    val notEu = spark.sql("SELECT * FROM pt.db.t2 WHERE NOT (region = 'eu')")
    assert(planned(notEu) == 2, s"NOT must prune: ${planned(notEu)}")
    assert(notEu.count() == 60)
    val in2 = spark.sql(
      "SELECT * FROM pt.db.t2 WHERE region IN ('us', 'nowhere')")
    assert(planned(in2) == 1)
  }

  test("dynamic partition overwrite replaces exactly the incoming partitions, metadata-only") {
    val root = mkTable("t3")
    spark.sql("INSERT INTO pt.db.t3 SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(0, 20)")
    val before = CommitLog.files(root, CommitLog.latestVersion(root))
    val parts0 = CommitLog.partsOf(root, CommitLog.latestVersion(root))
    val euBatch = parts0.collectFirst {
      case (b, m) if CommitLog.partValue(m("region")).contains("eu") => b
    }.get
    val usBatch = parts0.collectFirst {
      case (b, m) if CommitLog.partValue(m("region")).contains("us") => b
    }.get

    // reload ONLY the eu partition via overwritePartitions
    spark.range(100, 103)
      .select($"id", lit(0.5).as("v"), lit("eu").as("region"))
      .writeTo("pt.db.t3").overwritePartitions()

    val v = CommitLog.latestVersion(root)
    val after = CommitLog.files(root, v)
    assert(after.contains(usBatch), "us partition must survive untouched")
    assert(!after.contains(euBatch), "eu partition must be replaced")
    assert(CommitLog.history(root).last.operation
      .contains("OVERWRITE PARTITIONS"))
    val rows = spark.sql("SELECT id FROM pt.db.t3 WHERE region = 'eu'")
      .as[Long].collect().sorted.toSeq
    assert(rows == Seq(100L, 101L, 102L))
    assert(spark.sql("SELECT count(*) FROM pt.db.t3 WHERE region = 'us'")
      .head().getLong(0) == 10)
    assert(before.size == after.size, "one eu batch swapped for one")
  }

  test("INSERT OVERWRITE under dynamic partitionOverwriteMode routes to the dynamic verb") {
    val root = mkTable("t4")
    spark.sql("INSERT INTO pt.db.t4 SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(0, 20)")
    val mode0 = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      spark.sql("INSERT OVERWRITE pt.db.t4 " +
        "SELECT id, 1.0, 'us' FROM range(500, 504)")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode0)
    // eu rows survive, us rows replaced
    assert(spark.sql("SELECT count(*) FROM pt.db.t4 WHERE region = 'eu'")
      .head().getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM pt.db.t4 WHERE region = 'us'")
      .head().getLong(0) == 4)
    assert(CommitLog.history(root).last.operation
      .contains("OVERWRITE PARTITIONS"))
  }

  test("partition-aligned replaceWhere drops whole batches with no scan and no rewrite") {
    val root = mkTable("t5")
    spark.sql("INSERT INTO pt.db.t5 SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END " +
      "FROM range(0, 30)")
    val parts0 = CommitLog.partsOf(root, CommitLog.latestVersion(root))
    val apBatch = parts0.collectFirst {
      case (b, m) if CommitLog.partValue(m("region")).contains("ap") => b
    }.get
    spark.range(0, 2)
      .select($"id", lit(9.0).as("v"), lit("ap").as("region"))
      .writeTo("pt.db.t5").overwrite($"region" === "ap")
    val v = CommitLog.latestVersion(root)
    val after = CommitLog.files(root, v)
    assert(!after.contains(apBatch), "ap batch must drop")
    // metadata-only: NO copy-on-write rewrite batch was staged (a scan
    // leg would have added an 'ow…' batch)
    assert(!after.exists(_.startsWith("ow")),
      s"partition-aligned replaceWhere must not rewrite: $after")
    assert(spark.sql("SELECT count(*) FROM pt.db.t5 WHERE region = 'ap'")
      .head().getLong(0) == 2)
    assert(spark.sql("SELECT count(*) FROM pt.db.t5").head().getLong(0) == 22)
  }

  test("null partition values round-trip and prune via IS NULL") {
    val root = mkTable("t6")
    Seq((1L, 1.0, "us"), (2L, 2.0, null), (3L, 3.0, null))
      .toDF("id", "v", "region")
      .write.format("commitlog").option("path", root).mode("append").save()
    val v = CommitLog.latestVersion(root)
    val tuples = CommitLog.partsOf(root, v).values
      .map(m => CommitLog.partValue(m("region"))).toSet
    assert(tuples == Set(Some("us"), None))
    val nulls = spark.sql("SELECT id FROM pt.db.t6 WHERE region IS NULL")
    assert(planned(nulls) == 1, s"IS NULL must prune: ${planned(nulls)}")
    assert(nulls.as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val notNull = spark.sql("SELECT id FROM pt.db.t6 WHERE region IS NOT NULL")
    assert(planned(notNull) == 1)
    assert(notNull.as[Long].collect().toSeq == Seq(1L))
  }

  test("partitioning is immutable; partition columns refuse rename/drop; zorder refuses") {
    val root = mkTable("t7")
    spark.sql("INSERT INTO pt.db.t7 SELECT id, 1.0, 'us' FROM range(0, 5)")
    intercept[Exception] {
      spark.sql("ALTER TABLE pt.db.t7 RENAME COLUMN region TO zone")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE pt.db.t7 DROP COLUMN region")
    }
    intercept[Exception] {
      CommitLog.commit(root, CommitLog.latestVersion(root), added = Nil,
        partCols = Seq("id"), op = Some("REPARTITION"))
    }
    intercept[Exception] {
      CommitLogOptimize.optimizeClustered(spark, root, Seq("id"), buckets = 2)
    }
  }

  test("per-partition compaction: OPTIMIZE packs within tuples and keeps them prunable") {
    val root = mkTable("t8")
    // two small appends per region → 4 batches, 2 tuples
    (0 until 2).foreach { i =>
      spark.sql(s"INSERT INTO pt.db.t8 SELECT id + ${i * 100}, 1.0, " +
        "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(0, 10)")
    }
    val v0 = CommitLog.latestVersion(root)
    assert(CommitLog.files(root, v0).size == 4)
    val res = CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 30)
    val v = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, v)
    assert(live.size == 2, s"one pack per tuple: $live")
    val parts = CommitLog.partsOf(root, v)
    assert(parts.keySet == live.toSet, "packs carry their tuple forward")
    assert(!CommitLog.isDataChange(root, res.version), "layout-only commit")
    // still exactly prunable post-compaction
    val one = spark.sql("SELECT * FROM pt.db.t8 WHERE region = 'eu'")
    assert(planned(one) <= parts.count { case (_, m) =>
      CommitLog.partValue(m("region")).contains("eu") })
    assert(one.count() == 10)
    assert(spark.sql("SELECT count(*) FROM pt.db.t8").head().getLong(0) == 20)
  }

  test("dynamic overwrite refuses when a live batch lacks a tuple") {
    val root = mkTable("t9")
    spark.sql("INSERT INTO pt.db.t9 SELECT id, 1.0, 'us' FROM range(0, 5)")
    // simulate an engine rewrite's untupled batch
    spark.range(50, 55).select($"id", lit(2.0).as("v"), lit("eu").as("region"))
      .write.parquet(s"$root/legacy1")
    CommitLog.commit(root, CommitLog.latestVersion(root),
      added = Seq("legacy1"), op = Some("REWRITE"))
    val e = intercept[Exception] {
      spark.range(900, 901)
        .select($"id", lit(0.0).as("v"), lit("us").as("region"))
        .writeTo("pt.db.t9").overwritePartitions()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("partition tuple"))), s"got: $e")
  }

  test("streaming sink on a partitioned table: one batch per tuple per epoch, replay is a no-op") {
    val root = mkTable("t11")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT,v DOUBLE,region STRING")
    val w = new graft.sources.CommitLogStreamingWrite(
      root, schema, app = "appt11", partCols = Seq("region"))
    def stageAndCommit(epoch: Long): Unit = {
      val factory = w.createStreamingWriterFactory(null)
      val dw = factory.createWriter(0, 0L, epoch)
      def row(id: Long, region: String) =
        org.apache.spark.sql.catalyst.InternalRow(
          id, id * 0.5, org.apache.spark.unsafe.types.UTF8String.fromString(region))
      dw.write(row(epoch * 10, "us"))
      dw.write(row(epoch * 10 + 1, "eu"))
      dw.write(row(epoch * 10 + 2, "us"))
      w.commit(epoch, Array(dw.commit()))
    }
    stageAndCommit(0L)
    stageAndCommit(1L)
    val v = CommitLog.latestVersion(root)
    // CREATE(1) + two epochs: each epoch ONE commit adding 2 tuple batches
    assert(v == 3)
    val live = CommitLog.files(root, v)
    assert(live.size == 4, s"2 epochs x 2 tuples: $live")
    val parts = CommitLog.partsOf(root, v)
    assert(parts.keySet == live.toSet)
    // replay epoch 1: the txn watermark detects it, nothing publishes
    stageAndCommit(1L)
    assert(CommitLog.latestVersion(root) == v, "replayed epoch must not commit")
    val ids = spark.sql("SELECT id FROM pt.db.t11").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L, 10L, 11L, 12L))
    // and the epoch batches prune by tuple
    val eu = spark.sql("SELECT id FROM pt.db.t11 WHERE region = 'eu'")
    assert(planned(eu) == 2, s"2 of 4 batches: ${planned(eu)}")
    assert(eu.as[Long].collect().sorted.toSeq == Seq(1L, 11L))
  }

  test("SQL UPDATE (COW) on a partitioned table re-lands tuple-pure batches") {
    val root = mkTable("t12")
    spark.sql("INSERT INTO pt.db.t12 SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(0, 20)")
    spark.sql("UPDATE pt.db.t12 SET v = v + 100 WHERE id % 5 = 0")
    val v = CommitLog.latestVersion(root)
    val live = CommitLog.files(root, v)
    val parts = CommitLog.partsOf(root, v)
    assert(parts.keySet == live.toSet,
      s"the COW rewrite must carry tuples: live=$live tupled=${parts.keySet}")
    // still exactly prunable, and dynamic overwrite still possible
    val one = spark.sql("SELECT * FROM pt.db.t12 WHERE region = 'eu'")
    assert(planned(one) == parts.count { case (_, m) =>
      CommitLog.partValue(m("region")).contains("eu") })
    spark.range(1000, 1001)
      .select($"id", lit(0.0).as("v"), lit("eu").as("region"))
      .writeTo("pt.db.t12").overwritePartitions()
    assert(spark.sql("SELECT count(*) FROM pt.db.t12 WHERE region = 'eu'")
      .head().getLong(0) == 1)
    val total = spark.sql("SELECT sum(v) FROM pt.db.t12").head().getDouble(0)
    val expect = (0 until 20).filter(_ % 2 == 0)
      .map(i => if (i % 5 == 0) i + 100.0 else i.toDouble).sum + 0.0
    assert(math.abs(total - expect) < 1e-9)
  }

  test("optimizeRepartition restores tuples after an API-level rewrite") {
    val root = mkTable("t13")
    spark.sql("INSERT INTO pt.db.t13 SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(0, 20)")
    // API-level COW drops tuples (DataFrame-staged rewrite)
    graft.sources.CommitLogDml.update(spark, root, "id % 2 = 0",
      Seq("v" -> "v + 1"), dvFraction = 0.0)
    val vMid = CommitLog.latestVersion(root)
    val untupled = CommitLog.files(root, vMid)
      .filterNot(CommitLog.partsOf(root, vMid).contains)
    assert(untupled.nonEmpty, "the API rewrite should have dropped tuples")
    // dynamic overwrite now refuses...
    intercept[Exception] {
      spark.range(0, 1).select($"id", lit(0.0).as("v"), lit("us").as("region"))
        .writeTo("pt.db.t13").overwritePartitions()
    }
    // ...until the maintenance verb restores partition-pure layout
    val res = CommitLogOptimize.optimizeRepartition(spark, root)
    assert(res.added.nonEmpty)
    val v = CommitLog.latestVersion(root)
    assert(!CommitLog.isDataChange(root, v), "layout-only commit")
    val parts = CommitLog.partsOf(root, v)
    assert(parts.keySet == CommitLog.files(root, v).toSet)
    // rows intact, and the dynamic overwrite now lands
    val sumBefore = (0 until 20)
      .map(i => if (i % 2 == 0) i + 1.0 else i.toDouble).sum
    assert(spark.sql("SELECT sum(v) FROM pt.db.t13").head().getDouble(0)
      == sumBefore)
    spark.range(0, 1).select($"id", lit(0.0).as("v"), lit("us").as("region"))
      .writeTo("pt.db.t13").overwritePartitions()
    assert(spark.sql("SELECT count(*) FROM pt.db.t13 WHERE region = 'us'")
      .head().getLong(0) == 1)
  }

  test("shallow clone carries partitioning and tuples") {
    val root = mkTable("t10")
    spark.sql("INSERT INTO pt.db.t10 SELECT id, 1.0, " +
      "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(0, 10)")
    val cloneRoot =
      java.nio.file.Files.createTempDirectory("pt_clone").toString
    CommitLog.cloneTable(root, cloneRoot)
    assert(CommitLog.partColsOf(cloneRoot, 1) == Seq("region"))
    val parts = CommitLog.partsOf(cloneRoot, 1)
    assert(parts.size == 2 && parts.keySet.forall(_.startsWith("@")))
    val one = spark.read.format("commitlog").option("path", cloneRoot).load()
      .filter($"region" === "us")
    assert(planned(one) == 1, "clone prunes from birth")
    assert(one.count() == 5)
  }
}
