package graft

import graft.sources.{CommitLog, CommitLogAggScan, CommitLogDml, CommitLogOptimize, CommitLogScan, CommitLogSource}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.types.StructType

/** Round-11 metadata-planning features of the commitlog connector:
  *
  *  - exact per-batch ROW COUNTS in manifests ([[CommitLog.Rows]]):
  *    committed by the sink, unioned by OPTIMIZE, recounted by ZORDER,
  *    preserved by checkpoints/vacuum/restore/clone;
  *  - [[CommitLogScan.estimateStatistics]]: post-pruning sizeInBytes +
  *    exact rowCount → Spark auto-broadcasts small commitlog tables;
  *  - metadata-only AGGREGATE pushdown: unfiltered COUNT(*)/MIN/MAX
  *    (+ GROUP BY partition columns) answered with zero data reads;
  *  - runtime (join-driven) filtering: DPP-style replans drop batches
  *    by tuple/box/bloom;
  *  - storage-partitioned joins: co-partitioned tables join shuffle-free.
  */
class CommitLogMetadataSpec extends SparkSpec {
  import spark.implicits._

  private val wh = java.nio.file.Files.createTempDirectory("graft_meta").toString
  spark.conf.set("spark.sql.catalog.meta", "graft.sources.GraftCatalog")
  spark.conf.set("spark.sql.catalog.meta.warehouse", wh)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS meta.db")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_meta_t").toString

  private def scanOf(df: org.apache.spark.sql.DataFrame): Seq[BatchScanExec] =
    df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    graft.queries.Qh.flattenPlan(p)

  test("the sink commits exact per-batch row counts, through checkpoints and vacuum") {
    val root = tmp()
    (1 to 10).map(i => (i.toLong, s"u$i")).toDF("id", "user")
      .write.format("commitlog").option("path", root).mode("append").save()
    (11 to 13).map(i => (i.toLong, s"u$i")).toDF("id", "user")
      .write.format("commitlog").option("path", root).mode("append").save()
    val v = CommitLog.latestVersion(root)
    val rows = CommitLog.rowsOf(root, v)
    assert(rows.values.toSeq.sorted == Seq(3L, 10L), s"per-batch counts: $rows")
    // drive past a checkpoint boundary and vacuum — counts must survive
    (3 to 9).foreach { i =>
      Seq((100L + i, "x")).toDF("id", "user")
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0L)
    val v2 = CommitLog.latestVersion(root)
    val after = CommitLog.rowsOf(root, v2)
    assert(CommitLog.files(root, v2).forall(after.contains),
      s"every live batch still counted after vacuum: $after")
    assert(after.values.sum == 20L, s"13 + 7 singletons: $after")
  }

  test("OPTIMIZE unions its sources' counts; ZORDER recounts per bucket") {
    val root = tmp()
    (1 to 4).foreach { k =>
      (1 to 5).map(i => (k * 100L + i, i.toDouble)).toDF("id", "v")
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    CommitLogOptimize.optimize(spark, root, smallBytes = 1L << 20)
    val v = CommitLog.latestVersion(root)
    val rows = CommitLog.rowsOf(root, v)
    assert(CommitLog.files(root, v).size == 1 && rows.values.sum == 20L,
      s"pack carries the unioned count: $rows")

    CommitLogOptimize.optimizeClustered(spark, root, Seq("id", "v"), buckets = 2)
    val v2 = CommitLog.latestVersion(root)
    val rows2 = CommitLog.rowsOf(root, v2)
    val live2 = CommitLog.files(root, v2)
    assert(live2.forall(rows2.contains) && rows2.values.sum == 20L,
      s"every z-bucket recounted: $rows2")
  }

  test("estimateStatistics: exact rowCount and bytes, shrinking under pruning") {
    val root = tmp()
    (1 to 50).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.format("commitlog").option("path", root).mode("append").save()
    (51 to 80).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .write.format("commitlog").option("path", root).mode("append").save()
    val full = spark.read.format("commitlog").option("path", root).load()
    val st = full.queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(80)), s"exact rowCount: ${st.rowCount}")
    assert(st.sizeInBytes > 0 && st.sizeInBytes < (1L << 20), s"real bytes: ${st.sizeInBytes}")
    // stats are post-pushdown: a range filter that prunes batch 2
    // reports batch 1's counts only
    val pruned = full.filter($"id" <= 10)
    val st2 = pruned.queryExecution.optimizedPlan.stats
    assert(st2.sizeInBytes < st.sizeInBytes,
      s"pruned size ${st2.sizeInBytes} < full ${st.sizeInBytes}")
  }

  test("a small commitlog table auto-broadcasts with no hint") {
    val root = tmp()
    (1 to 100).map(i => (i.toLong, s"name$i")).toDF("k", "name")
      .write.format("commitlog").option("path", root).mode("append").save()
    val dim = spark.read.format("commitlog").option("path", root).load()
    val fact = spark.range(5000000).selectExpr("id % 100 + 1 AS k", "id AS x")
    val joined = fact.join(dim, "k").groupBy().count()
    assert(joined.head().getLong(0) == 5000000L)
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val bhj = finalPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.nonEmpty,
      s"exact manifest rowCount/size must auto-broadcast the dim side:\n$finalPlan")
  }

  test("COUNT(*) answers from commit metadata: zero data files opened") {
    val root = tmp()
    (1 to 25).map(i => (i.toLong, s"u$i")).toDF("id", "user")
      .write.format("commitlog").option("path", root).mode("append").save()
    (26 to 40).map(i => (i.toLong, s"u$i")).toDF("id", "user")
      .write.format("commitlog").option("path", root).mode("append").save()
    val df = spark.read.format("commitlog").option("path", root).load()
      .groupBy().count()
    assert(df.head().getLong(0) == 40L)
    val scans = scanOf(df)
    assert(scans.nonEmpty && scans.forall(_.scan.isInstanceOf[CommitLogAggScan]),
      s"metadata agg scan expected:\n${df.queryExecution.executedPlan}")
    assert(scans.head.inputPartitions.length == 1, "one metadata partition")
    // a filtered count keeps every filter residual → normal scan, same answer
    val filtered = spark.read.format("commitlog").option("path", root).load()
      .filter($"id" <= 25).groupBy().count()
    assert(filtered.head().getLong(0) == 25L)
    assert(scanOf(filtered).forall(_.scan.isInstanceOf[CommitLogScan]),
      "a WHERE clause must decline the metadata path")
  }

  test("MIN/MAX from boxes where exact; GROUP BY partition columns from tuples") {
    spark.sql("CREATE TABLE meta.db.g (id BIGINT, v DOUBLE, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql("INSERT INTO meta.db.g SELECT id, CAST(id AS DOUBLE) / 4, " +
      "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(1, 61)")
    val agg = spark.sql("SELECT count(*) AS n, min(id) AS lo, max(v) AS hi FROM meta.db.g")
    val r = agg.head()
    assert(r.getLong(0) == 60L && r.getLong(1) == 1L && r.getDouble(2) == 15.0)
    assert(scanOf(agg).forall(_.scan.isInstanceOf[CommitLogAggScan]),
      s"global agg from metadata:\n${agg.queryExecution.executedPlan}")

    val byPart = spark.sql(
      "SELECT region, count(*) AS n, max(id) AS m FROM meta.db.g GROUP BY region")
    val rows = byPart.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(("eu", 30L, 59L), ("us", 30L, 60L)), rows.mkString(","))
    assert(scanOf(byPart).forall(_.scan.isInstanceOf[CommitLogAggScan]),
      s"partition-grouped agg from metadata:\n${byPart.queryExecution.executedPlan}")

    // DISTINCT over a partition column is a group-by with no aggregates
    val distinct = spark.sql("SELECT DISTINCT region FROM meta.db.g")
    assert(distinct.collect().map(_.getString(0)).sorted.toSeq == Seq("eu", "us"))
  }

  test("COUNT(DISTINCT partcol) answers exactly from tuple tokens") {
    spark.sql("CREATE TABLE meta.db.cd (id BIGINT, region STRING, day INT) " +
      "PARTITIONED BY (region, day)")
    spark.sql("INSERT INTO meta.db.cd SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE NULL END, " +
      "CAST(id % 4 AS INT) FROM range(0, 48)")
    val q = spark.sql("SELECT count(DISTINCT region) AS r, " +
      "count(DISTINCT day) AS d FROM meta.db.cd")
    val row = q.head()
    assert(row.getLong(0) == 2L, "NULL region is not a distinct value")
    assert(row.getLong(1) == 4L)
    assert(scanOf(q).forall(_.scan.isInstanceOf[CommitLogAggScan]),
      s"token-covered COUNT DISTINCT must be metadata-only:\n" +
        q.queryExecution.executedPlan)
    // grouped: distinct days per region — tokens within each group
    val g = spark.sql("SELECT region, count(DISTINCT day) AS d " +
      "FROM meta.db.cd GROUP BY region")
    assert(scanOf(g).forall(_.scan.isInstanceOf[CommitLogAggScan]))
    val rows = g.collect().map(r =>
      (Option(r.getString(0)).getOrElse("-"), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("-", 4L), ("eu", 4L), ("us", 4L)), rows.mkString(","))
    // a non-token column declines (correct answer, ordinary scan)
    val miss = spark.sql("SELECT count(DISTINCT id) AS n FROM meta.db.cd")
    assert(miss.head().getLong(0) == 48L)
    assert(scanOf(miss).forall(_.scan.isInstanceOf[CommitLogScan]))
  }

  test("outstanding deletion vectors or uncounted batches decline the metadata path") {
    val root = tmp()
    (1 to 30).map(i => (i.toLong, s"u$i")).toDF("id", "user")
      .write.format("commitlog").option("path", root).mode("append").save()
    // sparse DV delete: counts/boxes now over-describe the table
    CommitLogDml.delete(spark, root, "id = 7")
    val df = spark.read.format("commitlog").option("path", root).load()
      .groupBy().count()
    assert(df.head().getLong(0) == 29L, "DV-reconciled count")
    assert(scanOf(df).forall(_.scan.isInstanceOf[CommitLogScan]),
      "a DV table must not answer from stale metadata")
  }

  test("runtime filter() replans: batches drop by tuple, box and bloom") {
    spark.sql("CREATE TABLE meta.db.rt (id BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql("INSERT INTO meta.db.rt SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END " +
      "FROM range(0, 90)")
    val root = s"$wh/db/rt"
    val ddl = CommitLog.schemaOf(root, CommitLog.latestVersion(root)).get
    val scan = CommitLogScan(root, StructType.fromDDL(ddl),
      boxes = Map.empty, probes = Nil, partFilters = Nil,
      versionAsOf = None, startingVersion = 0,
      maxVersionsPerTrigger = None, maxBytesPerTrigger = None,
      ignoreDeletes = false)
    assert(scan.filterAttributes().map(_.fieldNames()(0)).toSet.contains("region"))
    val before = scan.planInputPartitions().length
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("region", Array("eu"))))
    val after = scan.planInputPartitions().length
    assert(before == 3 && after == 1, s"runtime prune $before -> $after")
    // numeric runtime filter prunes via the stats boxes on an
    // unpartitioned table
    val root2 = tmp()
    (1 to 40).map(i => (i.toLong, i * 1.0)).toDF("id", "v").repartition(1)
      .write.format("commitlog").option("path", root2).mode("append").save()
    (41 to 80).map(i => (i.toLong, i * 1.0)).toDF("id", "v").repartition(1)
      .write.format("commitlog").option("path", root2).mode("append").save()
    val ddl2 = CommitLog.schemaOf(root2, CommitLog.latestVersion(root2)).get
    val scan2 = CommitLogScan(root2, StructType.fromDDL(ddl2),
      boxes = Map.empty, probes = Nil, partFilters = Nil,
      versionAsOf = None, startingVersion = 0,
      maxVersionsPerTrigger = None, maxBytesPerTrigger = None,
      ignoreDeletes = false)
    val b2 = scan2.planInputPartitions().length
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array(3L, 17L))))
    assert(b2 == 2 && scan2.planInputPartitions().length == 1,
      "box-pruned runtime replan")
  }

  test("join-driven DPP prunes the commitlog scan end-to-end") {
    spark.sql("CREATE TABLE meta.db.dppf (id BIGINT, v DOUBLE, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql("INSERT INTO meta.db.dppf SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END " +
      "FROM range(0, 9000)")
    // the dim must be a real source scan with a selective predicate —
    // Spark's PartitionPruning rule skips LocalRelations
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dppdim").toString
    Seq(("eu", 1), ("xx", 2)).toDF("r", "grp")
      .write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("meta_dppdim")
    val j = spark.sql(
      "SELECT count(*) AS n FROM meta.db.dppf f JOIN meta_dppdim d " +
        "ON f.region = d.r WHERE d.grp = 1")
    // collect() drives THIS dataset's own QueryExecution — head() would
    // execute a limited clone and leave these exec nodes untouched
    assert(j.collect()(0).getLong(0) == 3000L)
    val scans = flatten(j.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b }
      .filter(_.scan.isInstanceOf[CommitLogScan])
    assert(scans.nonEmpty && scans.head.runtimeFilters.nonEmpty,
      s"DPP filter must be planned:\n${j.queryExecution.executedPlan}")
    val c = scans.head.scan.asInstanceOf[CommitLogScan]
    assert(c.runtimeFiltersNow.nonEmpty, "runtime filter must reach the scan")
    assert(c.planInputPartitions().length == 1,
      "the eu batch alone survives the runtime replan")
  }

  test("storage-partitioned join: co-partitioned tables join with zero shuffle") {
    spark.sql("CREATE TABLE meta.db.orders (oid BIGINT, amount DOUBLE, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql("CREATE TABLE meta.db.users (uid BIGINT, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql("INSERT INTO meta.db.orders SELECT id, CAST(id AS DOUBLE), " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END " +
      "FROM range(0, 90)")
    spark.sql("INSERT INTO meta.db.users SELECT id, " +
      "CASE WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END " +
      "FROM range(0, 30)")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = spark.sql(
        "SELECT o.region, count(*) AS n, sum(o.amount) AS s " +
          "FROM meta.db.orders o JOIN meta.db.users u ON o.region = u.region " +
          "GROUP BY o.region")
      val rows = j.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      assert(rows.toSeq == Seq(("ap", 300L), ("eu", 300L), ("us", 300L)), rows.mkString(","))
      val all = flatten(j.queryExecution.executedPlan)
      val joins = all.collect {
        case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec => smj
      }
      val shuffles = all.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(joins.nonEmpty && shuffles.isEmpty,
        s"SPJ must delete both join exchanges:\n${j.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("LIMIT plans only the files the counts prove necessary") {
    val root = tmp()
    (1 to 3).foreach { k =>
      ((k * 100 + 1) to (k * 100 + 20)).map(i => (i.toLong, s"u$i"))
        .toDF("id", "user").repartition(1)
        .write.format("commitlog").option("path", root).mode("append").save()
    }
    val limited = spark.read.format("commitlog").option("path", root).load()
      .limit(5)
    assert(limited.count() == 5L)
    val scans = scanOf(limited)
    assert(scans.nonEmpty && scans.head.inputPartitions.length == 1,
      s"one 20-row batch covers LIMIT 5:\n${limited.queryExecution.executedPlan}")
    // a bigger limit reaches into the second batch
    val wider = spark.read.format("commitlog").option("path", root).load()
      .limit(25)
    assert(wider.count() == 25L)
    assert(scanOf(wider).head.inputPartitions.length == 2)
    // outstanding DVs make counts over-estimates: the cut disables,
    // results stay exact
    CommitLogDml.delete(spark, root, "id = 105")
    val dv = spark.read.format("commitlog").option("path", root).load()
      .limit(59)
    assert(dv.count() == 59L)
    assert(scanOf(dv).head.inputPartitions.length == 3,
      "DV table must plan everything")
  }

  test("negative or unlisted row counts are rejected at publish") {
    val root = tmp()
    intercept[IllegalArgumentException] {
      CommitLog.tryCommit(root, 1, added = Seq("b1"), removed = Nil,
        rows = Map("b1" -> -4L))
    }
    intercept[IllegalArgumentException] {
      CommitLog.tryCommit(root, 1, added = Seq("b1"), removed = Nil,
        rows = Map("other" -> 4L))
    }
  }
}
